#!/usr/bin/env python
"""Localize the four-step NTT kernel's gap to its op-count floor.

ROOFLINE.md r4: the fused kernel measures 2.2-3.9 us/plane against a
~0.5-0.8 us floor, and [64,4,8192] costs the SAME total time as
[64,7,8192] — evidence of a large L-independent cost.  This sweep
separates the candidates:

  * kernel-only arm: input pre-transposed to the kernel layout, the
    XLA transposes excluded -> isolates pallas_call cost;
  * full arm: production entry (transposes included);
  * rb sweep: grid rows per step (VMEM residency / MXU M-dim);
  * L in {4, 7}, batch in {64, 256}: does time scale with planes?

Run on the chip:  timeout 1800 python tools/ntt4p_sweep.py
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
    from apsu_tpu.ops import ntt4_pallas as n4p

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
        dt = (time.perf_counter() - t0) / iters / R
        return dt, comp

    results = []
    for L in (4, 7):
        primes = gen_ntt_primes([28] * L, 2 * n)
        tb = n4p.Ntt4pTables(primes, n)
        rng = np.random.default_rng(0)
        for B in (64, 256):
            x = np.empty((B, L, n), np.uint32)
            for j, p in enumerate(primes):
                x[:, j, :] = rng.integers(0, p, size=(B, n))
            xj = jnp.asarray(x)
            # kernel layout input (transposes excluded)
            xt = jnp.asarray(
                x.reshape(B, L, tb.n1, tb.n2).swapaxes(-2, -1).copy()
            )
            for rb in (8, 16, 32, 64):
                if B % rb:
                    continue
                os.environ["APSU_NTT4P_RB"] = str(rb)

                def full(v):
                    return jax.lax.fori_loop(
                        0, R, lambda _, a: n4p.ntt4_pallas(a, tb), v
                    )

                def konly(v):
                    # chain the raw pallas_call on the kernel layout: wrap
                    # ntt4_pallas but feed/return the transposed layout, so
                    # XLA sees transpose(T_in(y)) = y and cancels the pair
                    def step(a):
                        y = n4p.ntt4_pallas(
                            a.reshape(B, L, tb.n2, tb.n1)
                            .swapaxes(-2, -1)
                            .reshape(B, L, n)
                            , tb
                        )
                        return (
                            y.reshape(B, L, tb.n1, tb.n2).swapaxes(-2, -1)
                        )

                    return jax.lax.fori_loop(0, R, lambda _, a: step(a), v)

                dt_f, comp_f = bench(jax.jit(full), xj)
                dt_k, comp_k = bench(jax.jit(konly), xt)
                planes = B * L
                row = {
                    "L": L, "B": B, "rb": rb,
                    "full_us_per_plane": round(dt_f * 1e6 / planes, 3),
                    "kernel_us_per_plane": round(dt_k * 1e6 / planes, 3),
                    "full_ms": round(dt_f * 1e3, 3),
                    "kernel_ms": round(dt_k * 1e3, 3),
                }
                results.append(row)
                print(row, flush=True)

    import json

    print(json.dumps({"tool": "ntt4p_sweep", "reps": R, "rows": results}))


if __name__ == "__main__":
    main()
