#!/usr/bin/env python
"""A/B the unrolled four-step NTT kernel vs the grid-over-L variant, plus
a trivial-kernel arm that measures the raw per-pallas_call overhead floor.

The r5 sweep (tools/ntt4p_sweep.py) found time ≈ 0.85 ms + ~0.5 µs/plane
per invocation — a fixed cost independent of plane count.  If it is
program-size-bound (Mosaic program load), the ~L×-smaller grid-over-L
kernel should cut it; the trivial copy kernel bounds the irreducible
per-call cost.

Run on the chip:  timeout 2400 python tools/ntt4p_gl_ab.py
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from apsu_tpu.core.nt import gen_ntt_primes
    from apsu_tpu.ops.ntt4_pallas import (
        Ntt4pTables, ntt4_pallas, ntt4_pallas_gl,
    )

    n = 8192
    R = int(os.environ.get("APSU_NTT_BENCH_REPS", 32))
    chk = jax.jit(lambda o: jnp.sum(o, dtype=jnp.uint32))

    def bench(f, x, iters=5):
        t0 = time.perf_counter()
        jax.device_get(chk(f(x)))
        comp = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(iters):
            jax.device_get(chk(f(x)))
        return (time.perf_counter() - t0) / iters / R, comp

    def chain(f):
        return jax.jit(
            lambda v: jax.lax.fori_loop(0, R, lambda _, a: f(a), v)
        )

    # trivial kernel: same block shapes / grid as the unrolled kernel at
    # rb=8 but a copy body — the per-call overhead floor
    def triv_kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...] + jnp.uint32(1)

    def trivial(x, rb=8):
        B, L = x.shape[0], x.shape[1]
        xr = x.reshape(B // rb, rb, L, 64, 128)
        out = pl.pallas_call(
            triv_kernel,
            grid=(B // rb,),
            in_specs=[
                pl.BlockSpec((1, rb, L, 64, 128),
                             lambda b: (b, 0, 0, 0, 0))
            ],
            out_specs=pl.BlockSpec((1, rb, L, 64, 128),
                                   lambda b: (b, 0, 0, 0, 0)),
            out_shape=jax.ShapeDtypeStruct(xr.shape, jnp.uint32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",),
            ),
        )(xr)
        return out.reshape(x.shape)

    results = []
    for L in (4, 7, 14):
        primes = gen_ntt_primes([28] * L, 2 * n)
        tb = Ntt4pTables(primes, n)
        rng = np.random.default_rng(0)
        for B in (64, 256):
            x = np.empty((B, L, n), np.uint32)
            for j, p in enumerate(primes):
                x[:, j, :] = rng.integers(0, p, size=(B, n))
            xj = jnp.asarray(x)
            planes = B * L
            dt_u, _ = bench(chain(lambda v: ntt4_pallas(v, tb)), xj)
            dt_g, _ = bench(chain(lambda v: ntt4_pallas_gl(v, tb)), xj)
            dt_t, _ = bench(chain(trivial), xj)
            # bit-identity on chip
            a = ntt4_pallas(xj, tb)
            b = ntt4_pallas_gl(xj, tb)
            ident = bool(jnp.array_equal(a, b))
            row = {
                "L": L, "B": B, "planes": planes,
                "unrolled_us_per_plane": round(dt_u * 1e6 / planes, 3),
                "gl_us_per_plane": round(dt_g * 1e6 / planes, 3),
                "trivial_ms": round(dt_t * 1e3, 4),
                "unrolled_ms": round(dt_u * 1e3, 3),
                "gl_ms": round(dt_g * 1e3, 3),
                "bit_identical": ident,
            }
            results.append(row)
            print(row, flush=True)

    print(json.dumps({"tool": "ntt4p_gl_ab", "reps": R, "rows": results}))


if __name__ == "__main__":
    main()
