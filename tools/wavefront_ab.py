#!/usr/bin/env python
"""One-process A/B of power-wavefront variants at the 16M-4096 bench shape.

Pallas-containing programs do not persist in the compile cache on this
backend (every process pays the full remote compile), so cross-process
A/Bs confound kernel changes with compile-service variance.  This tool
builds the synthetic 16M-4096 query state ONCE and measures each variant
warm in the same process: the eval program compiles once and is shared;
each variant pays exactly one powers-program compile.

Variants (env knobs read at trace time; the jit key carries them):
  r3base      APSU_MERGE_WF=0  APSU_MUL_CHUNK=8   (round-3 default)
  merge       APSU_MERGE_WF=1  APSU_MUL_CHUNK=8
  merge+c40   APSU_MERGE_WF=1  APSU_MUL_CHUNK=40  (whole DAG level per kernel)

Usage (on the chip):  timeout 3600 python tools/wavefront_ab.py [variants...]
Extra named variants may be passed as NAME:ENV=V,ENV=V.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

VARIANTS = [
    ("r3base", {"APSU_MERGE_WF": "0", "APSU_MUL_CHUNK": "8"}),
    ("merge", {"APSU_MERGE_WF": "1", "APSU_MUL_CHUNK": "8"}),
    ("merge+c40", {"APSU_MERGE_WF": "1", "APSU_MUL_CHUNK": "40"}),
]


def main():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    if os.environ.get("APSU_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["APSU_PLATFORM"])
    import jax.numpy as jnp

    from apsu_tpu.api.parties import QueryRequest, Receiver, _pow_mod
    from apsu_tpu.core.params import PSUParams
    from apsu_tpu.db.measured_levels import query_level
    from apsu_tpu.db.receiver_db import ReceiverDB
    from apsu_tpu.mpc.prg import CsRng
    from apsu_tpu.ops.polyeval import plane_count

    variants = list(VARIANTS)
    for arg in sys.argv[1:]:
        name, _, spec = arg.partition(":")
        env = dict(kv.split("=", 1) for kv in spec.split(",") if kv)
        variants.append((name, env))

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

    rng = CsRng(b"bench-16M-4096-query-key0")
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
    recv = Receiver(params, db, rng=CsRng(b"bench-16M-4096-recv-key0"))

    chk = jax.jit(lambda o: jnp.sum(o, dtype=jnp.uint32))
    results = {}
    ref = None
    for name, env in variants:
        for k, v in env.items():
            os.environ[k] = v
        t0 = time.perf_counter()
        resp = recv.run_query(req)
        jax.device_get(chk(resp.results))
        compile_s = time.perf_counter() - t0
        times, splits = [], []
        for _ in range(3):
            tm = {}
            t0 = time.perf_counter()
            resp = recv.run_query(req, timings=tm)
            times.append(time.perf_counter() - t0)
            splits.append(tm)
        # also one uninstrumented warm iteration (the headline number)
        t0 = time.perf_counter()
        resp = recv.run_query(req)
        jax.device_get(chk(resp.results))
        plain_s = time.perf_counter() - t0
        best = min(splits, key=lambda d: d["powers_s"] + d["eval_s"])
        row = {
            "compile_s": round(compile_s, 1),
            "warm_s": round(plain_s, 4),
            "powers_ms": round(best["powers_s"] * 1e3, 1),
            "eval_ms": round(best["eval_s"] * 1e3, 1),
            "bundles_per_sec": round(B * C / plain_s, 1),
        }
        results[name] = row
        print(f"{name:12s} {json.dumps(row)}", flush=True)
        # bit-identity across variants (same query, same mask? mask is drawn
        # fresh per call — compare the DETERMINISTIC parts instead: re-run
        # the power tensors alone)
        from apsu_tpu.core.bfv import Ciphertext, RelinKey
        from apsu_tpu.db.measured_levels import defer_relin, powers_at_eval
        from apsu_tpu.engine.evaluator import compute_ps_power_tensors

        cts = {
            s: Ciphertext(ct.data[i], is_ntt=False, level=ql)
            for i, s in enumerate(plist)
        }
        low, high = compute_ps_power_tensors(
            bfv, cts, recv.plan, RelinKey(jnp.asarray(rk.ksk), ql),
            eval_level=lvl, batch_first=True,
            at_eval=powers_at_eval(params), defer_relin=defer_relin(params),
        )
        sig = (
            int(jax.device_get(chk(low))),
            int(jax.device_get(chk(high))),
        )
        if ref is None:
            ref = sig
        elif sig != ref and not os.environ.get("APSU_DEFER_RELIN"):
            print(f"  WARNING: {name} power checksum {sig} != {ref}")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
