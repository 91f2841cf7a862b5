#!/usr/bin/env python
"""Substage breakdown of the power wavefront at the 16M-4096 shape.

The production wavefront (engine/evaluator.compute_ps_power_tensors) is one
fused program; this tool times each algebraic stage as its OWN jitted
program on the same shapes so the ~160 ms warm-powers budget can be
attributed (companion to tools/eval_substage_bench.py, which splits the
eval phase):

  mul       : one mul_chunk batched BEHZ ct×ct multiply at the wavefront
              level (the DAG body; 16M-4096 runs 11 such chunks)
  relin     : 3->2 gadget key switching of the chunk product
  modswitch : the full power stack's switch from the wavefront level down
              to the eval level
  fwd_ntt   : forward NTT of the switched low+high stacks (eval level)

Per-stage times are per CALL; the `est_total` line scales each stage by
its production call count/shape so the sum is comparable to the fused
warm-powers number from tools/profile_query.py.  Run on the chip:

    timeout 1800 python tools/powers_substage_bench.py [params.json]

Reference analogue: ComputePowers' parallel_apply + NTT transforms
(/root/reference/receiver/apsu/receiver_osn.cpp:395-488).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


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

    from apsu_tpu.core.bfv import Ciphertext, RelinKey
    from apsu_tpu.core.params import PSUParams
    from apsu_tpu.db.measured_levels import query_level
    from apsu_tpu.db.receiver_db import ReceiverDB
    from apsu_tpu.engine.powers import plan_query
    from apsu_tpu.mpc.prg import CsRng

    pfile = sys.argv[1] if len(sys.argv) > 1 else "parameters/16M-4096.json"
    params = PSUParams.load_file(pfile)
    tp, qp = params.table_params, params.query_params
    B = params.bundle_idx_count
    K, N = tp.max_items_per_bin, params.poly_degree

    db = ReceiverDB(params, oprf=None)
    bfv = db.bfv
    lvl = db.ps_level() if qp.ps_low_degree > 0 else db.eval_level()
    ql = query_level(params, len(bfv.q_primes))
    Lq = bfv.levels[ql].k
    Le = bfv.levels[lvl].k
    plan = plan_query(tuple(qp.query_powers), K, qp.ps_low_degree)

    # production chunking: mul_chunk=8 targets per batched multiply
    MUL_CHUNK = 8
    chunks = []
    for sch in (plan.low, plan.high):
        for grp in sch.levels:
            for c0 in range(0, len(grp), MUL_CHUNK):
                chunks.append(min(MUL_CHUNK, len(grp) - c0))
    n_low = plan.low.max_power
    n_high = plan.high.max_power if qp.ps_low_degree > 0 else 0
    n_pow = n_low + n_high

    print(
        f"[powers-substage] {pfile}: B={B} N={N} query_lvl={ql} (Lq={Lq}) "
        f"eval_lvl={lvl} (Le={Le}) dag_chunks={chunks} n_powers={n_pow}",
        file=sys.stderr,
    )

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 4)
    mk = lambda k, shape, hi: jax.random.randint(
        k, shape, 0, hi, dtype=jnp.int32
    ).astype(jnp.uint32)
    hi = 1 << 20
    G = MUL_CHUNK * B  # full-size chunk rows
    lhs = mk(ks[0], (G, 2, Lq, N), hi)
    rhs = mk(ks[1], (G, 2, Lq, N), hi)
    stack = mk(ks[2], (n_pow, B, 2, Lq, N), hi)

    rng = CsRng(b"powers-substage-keyseed")
    sk = bfv.gen_secret_key(rng)
    rk = bfv.gen_relin_key(sk, rng, level=ql)

    chk = jax.jit(lambda o: jnp.sum(o, dtype=jnp.uint32))

    def timeit(name, fn, *args, iters=3):
        f = jax.jit(fn)
        t0 = time.perf_counter()
        out = f(*args)
        jax.device_get(chk(jax.tree_util.tree_leaves(out)[0]))
        t_compile = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(*args)
            jax.device_get(chk(jax.tree_util.tree_leaves(out)[0]))
        dt = (time.perf_counter() - t0) / iters * 1e3
        print(f"{name:12s} {dt:8.1f} ms/call   (compile {t_compile:.0f}s)")
        return dt

    def mul_fn(a, b):
        return bfv.multiply(
            Ciphertext(a, is_ntt=False, level=ql),
            Ciphertext(b, is_ntt=False, level=ql),
        ).data

    t_mul = timeit("mul", mul_fn, lhs, rhs)

    prod3 = jax.jit(mul_fn)(lhs, rhs)

    def relin_fn(p3, ksk):
        return bfv.relinearize(
            Ciphertext(p3, is_ntt=False, level=ql), RelinKey(ksk, ql)
        ).data

    t_relin = timeit("relin", relin_fn, prod3, rk.ksk)

    def msw_fn(s):
        return bfv.mod_switch_to(
            Ciphertext(s, is_ntt=False, level=ql), lvl
        ).data

    t_msw = timeit("modswitch", msw_fn, stack)

    switched = jax.jit(msw_fn)(stack)

    def ntt_fn(s):
        return bfv.to_ntt(Ciphertext(s, is_ntt=False, level=lvl)).data

    t_ntt = timeit("fwd_ntt", ntt_fn, switched)

    # scale per-call costs to the production schedule: each DAG chunk of
    # size g costs ~ (g/MUL_CHUNK) of the measured full chunk (both BEHZ
    # and relin scale ~linearly in rows)
    scale = sum(g / MUL_CHUNK for g in chunks)
    est = t_mul * scale + t_relin * scale + t_msw + t_ntt
    print(
        f"est_total    {est:8.1f} ms   "
        f"(mul+relin x{scale:.2f} chunks + modswitch + fwd_ntt; the fused "
        f"production program overlaps these, so expect fused <= est)"
    )


if __name__ == "__main__":
    main()
