#!/usr/bin/env python
"""Microbenchmark: PS inner-sum kernel (Pallas segmented) vs XLA fori_loop
at the 16M-4096 row-chunk shape.

Run on the chip:  timeout 1200 python tools/ps_inner_bench.py [R] [nseg] [ph] [L]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from apsu_tpu.core.mod32 import add_mod, mont_mul
    from apsu_tpu.core.nt import gen_ntt_primes
    from apsu_tpu.ops.polyeval import eval_ps_inner_pallas

    R = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    nseg = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    ph = int(sys.argv[3]) if len(sys.argv) > 3 else 45
    L = int(sys.argv[4]) if len(sys.argv) > 4 else 6
    N = 8192
    ell = ph - 1

    primes = gen_ntt_primes([28] * L, 2 * N)
    p = np.array(primes, dtype=np.uint32).reshape(L, 1)
    pni = np.array(
        [np.uint32((-pow(int(q), -1, 1 << 32)) % (1 << 32)) for q in primes],
        dtype=np.uint32,
    ).reshape(L, 1)

    rng = np.random.default_rng(0)
    low = (rng.integers(0, 1 << 28, size=(R, ell, 2, L, N), dtype=np.uint64)
           .astype(np.uint32) % p.reshape(1, 1, 1, L, 1))
    cache5 = (rng.integers(0, 1 << 28, size=(R, nseg, ph, L, N), dtype=np.uint64)
              .astype(np.uint32) % p.reshape(1, 1, 1, L, 1))
    lowj, cachej = jnp.asarray(low), jnp.asarray(cache5)
    gb = cache5.nbytes / 1e9
    chk = jax.jit(lambda o: jnp.sum(o, dtype=jnp.uint32))

    def xla_impl(low_r, c5):
        def body(i, acc):
            pw = jax.lax.dynamic_index_in_dim(low_r, i - 1, axis=1, keepdims=False)
            pt = jax.lax.dynamic_index_in_dim(c5, i, axis=2, keepdims=False)
            term = mont_mul(pw[:, None], pt[:, :, None], p, pni)
            return add_mod(acc, term, p)

        return jax.lax.fori_loop(
            1, ph, body, jnp.zeros((R, nseg, 2, L, N), jnp.uint32)
        )

    fx = jax.jit(xla_impl)
    fp = jax.jit(lambda a, b: eval_ps_inner_pallas(a, b, p, pni, 1))

    def bench(f, name, iters=8):
        t0 = time.perf_counter()
        out = f(lowj, cachej)
        jax.device_get(chk(out))
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(lowj, cachej)
            jax.device_get(chk(out))
        dt = (time.perf_counter() - t0) / iters
        print(f"{name:8s} [{R},{nseg},{ph},{L},{N}]: {dt*1e3:8.2f} ms "
              f"({gb/dt:6.1f} GB/s cache)  compile {compile_s:.1f}s",
              flush=True)
        return out

    ox = bench(fx, "xla")
    op = bench(fp, "pallas")
    same = bool(jnp.array_equal(ox, op))
    print("bit-identical OK" if same else "MISMATCH!!")


if __name__ == "__main__":
    main()
