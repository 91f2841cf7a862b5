#!/usr/bin/env python
"""A/B microbench of the fused four-step MXU NTT (ops/ntt4_pallas.py) only:
s8 vs bf16 digit matmuls x rb grid-row variants, bit-identity asserted
against the s8/rb-default output.

Run on the chip:  timeout 1800 python tools/ntt4p_ab.py [batch] [L]
(N fixed at 8192 — the production degree the kernel supports.)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from apsu_tpu.core.nt import gen_ntt_primes
    from apsu_tpu.ops.ntt4_pallas import Ntt4pTables, ntt4_pallas

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 7
    n = 8192
    primes = gen_ntt_primes([28] * L, 2 * n)
    tb = Ntt4pTables(primes, n)
    rng = np.random.default_rng(0)
    x = np.empty((batch, L, n), np.uint32)
    R = 1 << 32
    for j, p in enumerate(primes):
        # Montgomery-form canonical residues
        x[:, j, :] = (
            rng.integers(0, p, size=(batch, n)).astype(np.uint64) * R % p
        ).astype(np.uint32)
    xj = jnp.asarray(x)
    chk = jax.jit(lambda o: jnp.sum(o, dtype=jnp.uint32))
    reps = int(os.environ.get("APSU_NTT_BENCH_REPS", 32))

    def chain(bf16, rb):
        os.environ["APSU_NTT4P_RB"] = str(rb)
        if bf16:
            os.environ["APSU_NTT4P_BF16"] = "1"
        else:
            os.environ.pop("APSU_NTT4P_BF16", None)

        def run(v):
            return jax.lax.fori_loop(
                0, reps, lambda _, a: ntt4_pallas(a, tb), v
            )

        return jax.jit(run)

    ref = None
    for bf16 in (False, True):
        for rb in (8, 16, 32):
            if batch % rb:
                continue
            f = chain(bf16, rb)
            t0 = time.perf_counter()
            out = f(xj)
            jax.device_get(chk(out))
            compile_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            iters = 5
            for _ in range(iters):
                jax.device_get(chk(f(xj)))
            dt = (time.perf_counter() - t0) / iters / reps
            name = f"{'bf16' if bf16 else 's8 '} rb={rb:2d}"
            print(
                f"ntt4p {name} [{batch},{L},{n}]: {dt * 1e3:8.3f} ms/transform"
                f"  ({dt * 1e6 / (batch * L):6.2f} us/plane)"
                f"  compile {compile_s:.1f}s  (R={reps})",
                flush=True,
            )
            o = np.asarray(jax.device_get(out))
            if ref is None:
                ref = o
            else:
                assert np.array_equal(ref, o), f"MISMATCH at {name}"
    print("bit-identical OK", flush=True)


if __name__ == "__main__":
    main()
