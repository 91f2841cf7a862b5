#!/usr/bin/env python
"""Per-stage profile of the production PS warm query at a given shape.

Times the receiver's two online stages separately (both jitted, warm):
  1. compute_ps_power_tensors — the power wavefront (batched BEHZ multiply +
     relinearize per DAG level, mod-switch, NTT)
  2. eval_matching_polys_ps — inner Pallas dot products + lazy-BEHZ outer
     products + relin + mod-switch + mask

Run on the chip:  timeout 1800 python tools/profile_query.py [params.json]

The breakdown decides where the next kernel effort goes (power wavefront is
NTT/relin-bound; eval is HBM-bound).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    import jax

    try:
        # share the persistent compile cache with bench.py / run_256m_slice:
        # the profile uses the SAME jitted signatures run_query does, so its
        # compiles are cache hits for every later chip run (and vice versa)
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from apsu_tpu.api.parties import _pow_mod
    from apsu_tpu.core.bfv import Ciphertext, RelinKey
    from apsu_tpu.core.params import PSUParams
    from apsu_tpu.db.receiver_db import ReceiverDB
    from apsu_tpu.engine.evaluator import (
        compute_ps_power_tensors,
        eval_matching_polys_ps,
    )
    from apsu_tpu.mpc.prg import CsRng
    from apsu_tpu.ops.polyeval import plane_count

    pfile = sys.argv[1] if len(sys.argv) > 1 else "parameters/16M-4096.json"
    params = PSUParams.load_file(pfile)
    tp, qp = params.table_params, params.query_params
    B, C = params.bundle_idx_count, int(os.environ.get("APSU_PROFILE_CACHES", 6))
    K, N = tp.max_items_per_bin, params.poly_degree
    t = params.seal_params.plain_modulus

    db = ReceiverDB(params, oprf=None)
    bfv = db.bfv
    lvl = db.ps_level()
    L = bfv.levels[lvl].k
    ph = qp.ps_low_degree + 1
    nh = K // ph
    planes = plane_count(K, qp.ps_low_degree)

    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    mk = lambda k, shape, hi: jax.random.randint(
        k, shape, 0, hi, dtype=jnp.int32
    ).astype(jnp.uint32)
    cache = mk(k1, (B, C, planes, L, N), 1 << 20)
    ps_const = mk(k2, (B, C, nh + 1, N), int(t))

    from apsu_tpu.db.measured_levels import query_level

    rng = CsRng(b"profile-query-key0")
    sk = bfv.gen_secret_key(rng)
    ql = query_level(params, len(bfv.q_primes))
    rk = bfv.gen_relin_key(sk, rng, level=ql)
    qvec = np.asarray(rng.integers(1, t, size=(B, N), dtype=np.uint64)).astype(
        np.uint32
    )
    plist = tuple(qp.query_powers)
    stack = np.stack(
        [_pow_mod(qvec.astype(np.uint64), s, t).astype(np.uint32) for s in plist]
    )
    ct = bfv.encrypt_symmetric(bfv.encode(stack), sk, rng, level=ql)
    cts = {
        s: Ciphertext(ct.data[i], is_ntt=False, level=ql)
        for i, s in enumerate(plist)
    }

    from apsu_tpu.engine.powers import plan_query

    plan = plan_query(qp.query_powers, K, qp.ps_low_degree)
    mask = np.asarray(
        rng.integers(0, t, size=(B, C, N), dtype=np.uint64)
    ).astype(np.uint32)

    chk = jax.jit(lambda o: jnp.sum(o, dtype=jnp.uint32))

    def sync(*arrs):
        for a in arrs:
            jax.device_get(chk(a))

    def powers():
        low_ntt, high_coeff = compute_ps_power_tensors(
            bfv, cts, plan, rk, eval_level=lvl
        )
        return jnp.moveaxis(low_ntt, 0, 1), jnp.moveaxis(high_coeff, 0, 1)

    def evalps(low_b, high_b):
        return eval_matching_polys_ps(
            bfv, low_b, high_b, cache, ps_const, jnp.asarray(mask), rk,
            qp.ps_low_degree, db.result_level(), K, eval_level=lvl,
        )

    print(f"[profile] {pfile}: B={B} C={C} K={K} N={N} lvl={lvl} L={L} "
          f"ell={qp.ps_low_degree} nh={nh} planes={planes}", file=sys.stderr)

    t0 = time.perf_counter()
    low_b, high_b = powers()
    sync(low_b, high_b)
    print(f"[profile] powers first call {time.perf_counter()-t0:.1f}s",
          file=sys.stderr)
    t0 = time.perf_counter()
    res = evalps(low_b, high_b)
    sync(res.data)
    print(f"[profile] eval first call {time.perf_counter()-t0:.1f}s",
          file=sys.stderr)

    iters = int(os.environ.get("APSU_PROFILE_ITERS", 3))
    t0 = time.perf_counter()
    for _ in range(iters):
        low_b, high_b = powers()
        sync(low_b, high_b)
    tp_s = (time.perf_counter() - t0) / iters

    t0 = time.perf_counter()
    for _ in range(iters):
        res = evalps(low_b, high_b)
        sync(res.data)
    te_s = (time.perf_counter() - t0) / iters

    tot = tp_s + te_s
    print(
        f"powers_wavefront: {tp_s*1e3:8.1f} ms  ({100*tp_s/tot:4.1f}%)\n"
        f"ps_eval:          {te_s*1e3:8.1f} ms  ({100*te_s/tot:4.1f}%)\n"
        f"warm_query_total: {tot*1e3:8.1f} ms  "
        f"({B*C/tot:.1f} bundles/s)"
    )


if __name__ == "__main__":
    main()
