#!/usr/bin/env python
"""Microbenchmark: XLA stage-by-stage NTT vs the fused Pallas NTT kernel.

Run on the chip:  timeout 900 python tools/ntt_bench.py [batch] [N] [L]
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
    from apsu_tpu.core.ntt import NttContext
    from apsu_tpu.ops.ntt_pallas import ntt_pallas, stage_twiddles

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
    L = int(sys.argv[3]) if len(sys.argv) > 3 else 7
    primes = gen_ntt_primes([28] * L, 2 * n)
    ctx = NttContext(primes, n)
    rng = np.random.default_rng(0)
    x = np.empty((batch, L, n), np.uint32)
    for j, p in enumerate(primes):
        x[:, j, :] = rng.integers(0, p, size=(batch, n))
    xj = jnp.asarray(x)
    chk = jax.jit(lambda o: jnp.sum(o, dtype=jnp.uint32))

    tw_f = stage_twiddles(ctx.w_pl, ctx.w_sh, n, inverse=False)
    p_np = np.asarray(ctx.consts.p, np.uint32)

    # Chain R dependent transforms inside ONE jit: the axon tunnel costs
    # ~11-25 ms per dispatch+readback, so per-call timing measures latency,
    # not the kernel.  R chained applications amortize it away.
    R = int(os.environ.get("APSU_NTT_BENCH_REPS", 32))

    def chain(f):
        def run(v):
            return jax.lax.fori_loop(0, R, lambda _, a: f(a), v)

        return jax.jit(run)

    from apsu_tpu.ops.ntt4 import Ntt4Tables, ntt4
    from apsu_tpu.ops.ntt4_pallas import Ntt4pTables, ntt4_pallas
    from apsu_tpu.ops.ntt_pair import ntt_pair, pair_tables

    tb4 = Ntt4Tables(primes, n)
    tb4p = Ntt4pTables(primes, n) if n == 8192 else None
    tw_pair = pair_tables(ctx.w_pl, ctx.w_sh, n, inverse=False)
    # the "xla" arm must be the true staged path (ctx.ntt would otherwise
    # route to the default-on Pallas kernel on TPU; gates read at trace time)
    os.environ["APSU_PALLAS_NTT"] = "0"
    os.environ.pop("APSU_NTT4", None)
    os.environ.pop("APSU_PAIR_NTT", None)
    fx = chain(ctx.ntt)
    fp = chain(lambda v: ntt_pallas(v, tw_f, p_np))
    f4 = chain(lambda v: ntt4(v, tb4))
    fpair = chain(lambda v: ntt_pair(v, tw_pair, p_np))
    f4p = chain(lambda v: ntt4_pallas(v, tb4p)) if tb4p is not None else None

    # Chain-overhead floor: on this backend one fori_loop ITERATION costs
    # ~0.8 ms even for a bare a+1 body (measured r5 — the reason every
    # r4 per-plane number read 3-5x above the op-count floor).  Measure it
    # with the same harness and report both raw and overhead-corrected
    # per-transform times.
    fid = chain(lambda v: v + jnp.uint32(1))
    jax.device_get(chk(fid(xj)))
    t0 = time.perf_counter()
    for _ in range(3):
        jax.device_get(chk(fid(xj)))
    chain_oh = (time.perf_counter() - t0) / 3 / R
    print(f"chain-overhead floor (a+1 body): {chain_oh * 1e3:.3f} ms/iter",
          flush=True)

    def bench(f, name, iters=5):
        t0 = time.perf_counter()
        out = f(xj)
        jax.device_get(chk(out))
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(iters):
            jax.device_get(chk(f(xj)))
        dt = (time.perf_counter() - t0) / iters / R
        corr = max(dt - chain_oh, 0.0)
        gbps = x.nbytes * 2 / dt / 1e9
        print(
            f"{name:8s} [{batch},{L},{n}]: {dt * 1e3:8.3f} ms/transform "
            f"(corrected {corr * 1e3:8.3f} ms = "
            f"{corr * 1e6 / (batch * L):6.3f} us/plane) "
            f"({gbps:6.1f} GB/s r+w)  compile {compile_s:.1f}s  (R={R})",
            flush=True,
        )
        return out

    ox = bench(fx, "xla")
    op = bench(fp, "pallas")
    o4 = bench(f4, "ntt4")
    opair = bench(fpair, "pair")
    assert jnp.array_equal(ox, op), "MISMATCH xla vs pallas"
    assert jnp.array_equal(ox, o4), "MISMATCH xla vs ntt4"
    assert jnp.array_equal(ox, opair), "MISMATCH xla vs pair"
    if f4p is not None:
        o4p = bench(f4p, "ntt4p")
        assert jnp.array_equal(ox, o4p), "MISMATCH xla vs ntt4p"
    print("bit-identical OK")


if __name__ == "__main__":
    main()
