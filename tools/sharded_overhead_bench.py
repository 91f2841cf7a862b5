#!/usr/bin/env python
"""Measure shard_map overhead on the REAL chip: the sharded production
query on a 1-device mesh vs the direct single-device path, same shapes,
same kernels (parallel/runtime.py reuses the production evaluator under
shard_map, so any delta is partitioning overhead, not algorithm).

MULTICHIP_r*.json certifies the sharded path's correctness on a virtual
CPU mesh; this tool gives it a PERFORMANCE number (VERDICT r2 weak #5) —
the per-chip cost a real v5e slice would pay per shard.

Run on the chip:  timeout 2400 python tools/sharded_overhead_bench.py
"""

import json
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

    from jax.sharding import Mesh

    from apsu_tpu.api.parties import QueryRequest, Receiver, _pow_mod
    from apsu_tpu.core.params import PSUParams
    from apsu_tpu.db.measured_levels import query_level
    from apsu_tpu.db.receiver_db import ReceiverDB
    from apsu_tpu.mpc.prg import CsRng
    from apsu_tpu.ops.polyeval import plane_count
    from apsu_tpu.parallel.runtime import ShardedReceiver

    params = PSUParams.load_file("parameters/16M-4096.json")
    tp, qp = params.table_params, params.query_params
    B, C = params.bundle_idx_count, 6
    K, N = tp.max_items_per_bin, params.poly_degree
    t = params.seal_params.plain_modulus

    db = ReceiverDB(params, oprf=None)
    lvl = db.ps_level()
    L = db.bfv.levels[lvl].k
    ph = qp.ps_low_degree + 1
    nh = K // ph
    planes = plane_count(K, qp.ps_low_degree)

    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    mk = lambda k, shape, hi: jax.random.randint(
        k, shape, 0, hi, dtype=jnp.int32
    ).astype(jnp.uint32)
    db.coeff_cache = mk(k1, (B, C, planes, L, N), 1 << 20)
    db.ps_const_polys = mk(k2, (B, C, nh + 1, N), int(t))
    db.const_slots = None
    db.eval_lvl = lvl
    db.result_lvl = db.result_level()

    rng = CsRng(b"sharded-overhead-bench-01")
    bfv = db.bfv
    sk = bfv.gen_secret_key(rng)
    ql = query_level(params, len(bfv.q_primes))
    rk = bfv.gen_relin_key(sk, rng, level=ql)
    qvec = np.asarray(
        rng.integers(1, t, size=(B, N), dtype=np.uint64)
    ).astype(np.uint32)
    plist = tuple(qp.query_powers)
    stack = np.stack(
        [_pow_mod(qvec.astype(np.uint64), s, t).astype(np.uint32) for s in plist]
    )
    ct = bfv.encrypt_symmetric(bfv.encode(stack), sk, rng, level=ql)
    req = QueryRequest(power_list=plist, powers_data=ct.data, relin_key=rk.ksk)

    chk = jax.jit(lambda o: jnp.sum(o, dtype=jnp.uint32))

    def timeit(name, recv, iters=3):
        t0 = time.perf_counter()
        resp = recv.run_query(req)
        jax.device_get(chk(resp.results))
        compile_s = time.perf_counter() - t0
        print(f"[{name}] first call {compile_s:.1f}s", file=sys.stderr,
              flush=True)
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            resp = recv.run_query(req)
            jax.device_get(chk(resp.results))
            times.append(time.perf_counter() - t0)
        return min(times), compile_s, resp

    # identical rng keys + call counts => identical mask sequences, so the
    # final responses must be bit-identical across the two paths
    direct = Receiver(params, db, rng=CsRng(b"sharded-overhead-recv-001"))
    d_s, d_comp, d_resp = timeit("direct", direct)
    d_res_np = np.asarray(jax.device_get(d_resp.results))
    del d_resp

    mesh = Mesh(np.asarray(jax.devices()[:1]), ("bundle",))
    shard = ShardedReceiver(
        params, db, mesh, rng=CsRng(b"sharded-overhead-recv-001")
    )
    # the sharded runtime holds its OWN device copy of the cache; swap the
    # direct path's for a host-side shape dummy to stay inside 16 GB HBM
    # (both copies resident OOM'd at C=6 — ShardedReceiver.run_query reads
    # only coeff_cache.shape[:2])
    db.coeff_cache = np.zeros((B, C, 1, 1, 1), np.uint32)
    db.ps_const_polys = None
    import gc

    gc.collect()
    s_s, s_comp, s_resp = timeit("sharded-1dev", shard)

    s_res_np = np.asarray(jax.device_get(s_resp.results))
    identical = bool(
        np.array_equal(d_res_np, s_res_np)
    ) if d_res_np.shape == s_res_np.shape else False

    print(json.dumps({
        "config": "16M-4096",
        "direct_warm_s": round(d_s, 4),
        "sharded_1dev_warm_s": round(s_s, 4),
        "shard_map_overhead_pct": round((s_s / d_s - 1) * 100, 1),
        "direct_first_s": round(d_comp, 1),
        "sharded_first_s": round(s_comp, 1),
        "bit_identical": identical,
    }))


if __name__ == "__main__":
    main()
