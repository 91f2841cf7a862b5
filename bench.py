"""Benchmark: sender homomorphic-eval throughput (bundles/sec/chip).

Measures the hot kernel of the PSU online phase — the batched matching-
polynomial evaluation (reference: ``BatchedPlaintextPolyn::eval`` over every
(bundle_idx, cache), /root/reference/receiver/apsu/bin_bundle.cpp:106-174,
driven by receiver_osn.cpp:490-540; note the reference's party naming calls
this the *receiver*, BASELINE.json uses APSI naming "sender") — on the
16M-4096 workload shape: N=8192, degree 1304 dot product, 4 bundle indices ×
6 caches = 24 bundle evaluations per query.

Baseline (vs_baseline denominator): the reference's per-bundle eval is 1304
NTT-domain multiply-accumulates over [L=4, N=8192] uint64 per component.
SEAL's AVX multiply_plain at N=8192/L=4 costs ≈0.6 ms on one core (SEAL 4.x
microbenchmarks), so a 32-thread server sustains ≈ 32 / (1304·0.0006) ≈ 41
bundles/s.  BASELINE.json publishes no measured numbers ("published": {}),
so 41 bundles/s is the documented estimate used as the denominator.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np

REF_BASELINE_BUNDLES_PER_SEC = 41.0


def main():
    import jax
    import jax.numpy as jnp

    from apsu_tpu.core.params import PSUParams
    from apsu_tpu.core.bfv import BfvContext
    from apsu_tpu.engine.evaluator import eval_matching_polys

    # the 16M-4096 parameter set (mirrors /root/reference/parameters/16M-4096.json)
    params = PSUParams.from_dict(
        {
            "table_params": {
                "hash_func_count": 3,
                "table_size": 6552,
                "max_items_per_bin": 1304,
            },
            "item_params": {"felts_per_item": 5},
            "query_params": {"ps_low_degree": 44, "query_powers": [1, 3, 11, 18, 45, 225]},
            "seal_params": {
                "plain_modulus_bits": 22,
                "poly_modulus_degree": 8192,
                "coeff_modulus_bits": [56, 56, 56, 50],
            },
        }
    )
    bfv = BfvContext(params.seal_params)
    B, C = 4, 6
    K = params.table_params.max_items_per_bin      # 1304
    N = params.poly_degree
    lvl = min(3, len(bfv.q_primes))
    L = lvl

    # Random operands generated ON DEVICE (values are irrelevant for
    # throughput: the Montgomery datapath is data-independent).
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    mk = lambda k, shape: jax.random.randint(
        k, shape, 0, 1 << 20, dtype=jnp.int32
    ).astype(jnp.uint32)
    from apsu_tpu.ops.polyeval import DEG_CHUNK

    planes = (K + 1 + DEG_CHUNK - 1) // DEG_CHUNK * DEG_CHUNK
    powers = mk(k1, (B, K, 2, L, N))
    cache = mk(k2, (B, C, planes, L, N))
    const_s = mk(k3, (B, C, N)) % jnp.uint32(bfv.t)
    mask_s = mk(k4, (B, C, N)) % jnp.uint32(bfv.t)

    # NOTE: block_until_ready is unreliable over the axon tunnel (returns
    # before execution completes); force completion with a scalar checksum
    # readback instead.
    chk = jax.jit(lambda o: jnp.sum(o, dtype=jnp.uint32))

    # compile + warm up
    out = eval_matching_polys(bfv, powers, cache, const_s, mask_s, lvl)
    jax.device_get(chk(out.data))

    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        out = eval_matching_polys(bfv, powers, cache, const_s, mask_s, lvl)
        jax.device_get(chk(out.data))
    dt = time.perf_counter() - t0

    bundles_per_sec = B * C * iters / dt
    print(
        json.dumps(
            {
                "metric": "sender homomorphic-eval throughput (16M-4096 shape)",
                "value": round(bundles_per_sec, 2),
                "unit": "bundles/sec/chip",
                "vs_baseline": round(bundles_per_sec / REF_BASELINE_BUNDLES_PER_SEC, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
