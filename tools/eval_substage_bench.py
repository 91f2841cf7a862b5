#!/usr/bin/env python
"""Substage breakdown of the PS eval chain at the 16M-4096 row-chunk shape.

The production eval (eval_matching_polys_ps.rows_impl) is one fused program;
this tool times each algebraic stage as its OWN jitted program on the same
shapes so the 442 ms warm-eval budget can be attributed:

  inner     : ell-step fori dot product over the cache planes (HBM stream)
  intt_q    : INTT + from_mont of the inner accumulator (q base)
  scale_add : Δ-scale of the const planes + folds
  bsk_lift  : FastBConv of the lhs into Bsk + to_mont + forward NTT
  msum      : tensor products + M-term reduction in both bases + INTTs
  scaledown : t/Q fast floor + Shenoy-Kumaresan back-conversion
  relin     : 3->2 gadget key switching
  modswitch : result-level switch + mask add

Sum-of-stages > fused time is expected (the fused program overlaps/fuses);
the value is the RATIO between stages.  Run on the chip:

    timeout 1800 python tools/eval_substage_bench.py [params.json]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    import jax

    if os.environ.get("APSU_PLATFORM"):  # e.g. =cpu for a dry shakeout
        jax.config.update("jax_platforms", os.environ["APSU_PLATFORM"])
    import jax.numpy as jnp

    from apsu_tpu.core.bfv import Ciphertext, RelinKey, _msum_tensor
    from apsu_tpu.core.mod32 import add_mod, mont_mul, shoup_mul, sub_mod
    from apsu_tpu.core.params import PSUParams
    from apsu_tpu.db.receiver_db import ReceiverDB
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
    rlvl = db.result_level()
    q = bfv.levels[lvl]
    L = q.k
    ph = qp.ps_low_degree + 1
    ell = qp.ps_low_degree
    nh = K // ph
    planes = plane_count(K, qp.ps_low_degree)
    R = B * C  # one chunk = all rows (matches production at 16M: 1 chunk)

    mc = bfv._mul_ctx(lvl, max(1, (nh - 1).bit_length()))
    bsk = mc["bsk"]
    Lb = bsk.k
    print(
        f"[substage] {pfile}: R={R} K={K} N={N} lvl={lvl} L={L} Lb={Lb} "
        f"ell={ell} nh={nh} planes={planes}",
        file=sys.stderr,
    )

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    mk = lambda k, shape, hi: jax.random.randint(
        k, shape, 0, hi, dtype=jnp.int32
    ).astype(jnp.uint32)
    hi = 1 << 20
    cache_r = mk(ks[0], (R, planes, L, N), hi)
    low_r = mk(ks[1], (R, ell, 2, L, N), hi)
    const_r = mk(ks[2], (R, nh + 1, N), int(t))
    mask_r = mk(ks[3], (R, N), int(t))
    acc0 = mk(ks[4], (R, nh + 1, 2, L, N), hi)      # stand-in inner accumulator
    inner0 = mk(ks[5], (R, nh + 1, 2, L, N), hi)    # stand-in coeff-domain inner
    fbq0 = mk(ks[6], (R, nh, 2, L, N), hi)
    fbb0 = mk(ks[7], (R, nh, 2, Lb, N), hi)

    rng = CsRng(b"substage-bench-keyseed0")
    sk = bfv.gen_secret_key(rng)
    rk = bfv.gen_relin_key(sk, rng)

    chk = jax.jit(lambda o: jnp.sum(o, dtype=jnp.uint32))

    def timeit(name, fn, *args, iters=3):
        f = jax.jit(fn)
        t0 = time.perf_counter()
        out = f(*args)
        leaves = jax.tree_util.tree_leaves(out)
        jax.device_get(chk(leaves[0]))
        t_compile = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(*args)
            for lf in jax.tree_util.tree_leaves(out):
                pass
            jax.device_get(chk(jax.tree_util.tree_leaves(out)[0]))
        dt = (time.perf_counter() - t0) / iters * 1e3
        print(f"{name:12s} {dt:8.1f} ms   (compile {t_compile:.0f}s)")
        return out

    # 1. inner dot, i-chunked exactly like production (evaluator.rows_impl:
    # CH terms per fori iteration so the ~1.1 GB accumulator is touched
    # ell/CH times instead of ell times)
    def inner_fn(cache_r, low_r):
        cache5 = cache_r[:, : (nh + 1) * ph].reshape(
            (R, nh + 1, ph) + cache_r.shape[2:]
        )
        CH = min(11, ell)
        nch = ell // CH

        def body(ci, acc):
            i0 = ci * CH
            pw = jax.lax.dynamic_slice_in_dim(low_r, i0, CH, axis=1)
            pt = jax.lax.dynamic_slice_in_dim(cache5, i0 + 1, CH, axis=2)
            part = None
            for u in range(CH):
                term = mont_mul(
                    pw[:, u, None], pt[:, :, u, None], q.p_d, q.pni_d
                )
                part = term if part is None else add_mod(part, term, q.p_d)
            return add_mod(acc, part, q.p_d)

        acc = jax.lax.fori_loop(
            0, nch, body, jnp.zeros((R, nh + 1, 2, L, N), jnp.uint32)
        )

        def tail(i, acc):
            pw = jax.lax.dynamic_index_in_dim(low_r, i - 1, axis=1, keepdims=False)
            pt = jax.lax.dynamic_index_in_dim(cache5, i, axis=2, keepdims=False)
            term = mont_mul(pw[:, None], pt[:, :, None], q.p_d, q.pni_d)
            return add_mod(acc, term, q.p_d)

        return jax.lax.fori_loop(nch * CH + 1, ell + 1, tail, acc)

    timeit("inner", inner_fn, cache_r, low_r)

    # 1b. inner-sum variants: wider i-chunks (fewer accumulator HBM round
    # trips) and the row-resident Pallas v2 kernel — the measured winner
    # becomes the evaluator default (APSU_PS_INNER)
    def inner_ch(CH):
        def fn(cache_r, low_r):
            cache5 = cache_r[:, : (nh + 1) * ph].reshape(
                (R, nh + 1, ph) + cache_r.shape[2:]
            )
            part = None
            for u in range(CH):
                term = mont_mul(
                    low_r[:, u, None], cache5[:, :, u + 1, None], q.p_d, q.pni_d
                )
                part = term if part is None else add_mod(part, term, q.p_d)
            acc = part

            def tail(i, acc):
                pw = jax.lax.dynamic_index_in_dim(low_r, i - 1, axis=1, keepdims=False)
                pt = jax.lax.dynamic_index_in_dim(cache5, i, axis=2, keepdims=False)
                term = mont_mul(pw[:, None], pt[:, :, None], q.p_d, q.pni_d)
                return add_mod(acc, term, q.p_d)

            return jax.lax.fori_loop(CH + 1, ell + 1, tail, acc)

        return fn

    # the fully-unrolled variant OOMs HBM at the 16M shape (every partial
    # term held live); keep a bounded chunk for comparison
    timeit("inner8", inner_ch(8), cache_r, low_r)

    from apsu_tpu.ops.polyeval import (
        eval_ps_inner_pallas,
        eval_ps_inner_pallas2,
        eval_ps_inner_pallas3,
    )

    consts = np.stack([np.asarray(q.p_d).ravel(), np.asarray(q.pni_d).ravel()])
    nseg_b = planes // ph

    def inner_p2(cache_r, low_b):
        cache5p = cache_r[:, : nseg_b * ph].reshape(
            (R, nseg_b, ph) + cache_r.shape[2:]
        )
        return eval_ps_inner_pallas2(low_b, cache5p, consts[0], consts[1], C)

    def inner_p1(cache_r, low_b):
        cache5p = cache_r[:, : nseg_b * ph].reshape(
            (R, nseg_b, ph) + cache_r.shape[2:]
        )
        return eval_ps_inner_pallas(low_b, cache5p, consts[0], consts[1], C)

    def inner_p3(cache_r, low_b):
        # carry-free 14-bit-split kernel (r5) — bit-identical fold points
        cache5p = cache_r[:, : nseg_b * ph].reshape(
            (R, nseg_b, ph) + cache_r.shape[2:]
        )
        return eval_ps_inner_pallas3(low_b, cache5p, consts[0], consts[1], C)

    low_b = mk(ks[1], (B, ell, 2, L, N), hi)
    timeit("inner_p2", inner_p2, cache_r, low_b)
    timeit("inner_p1", inner_p1, cache_r, low_b)
    timeit("inner_p3", inner_p3, cache_r, low_b)

    # 2. q-side INTT + from_mont
    timeit("intt_q", lambda a: q.from_mont(q.ntt.intt(a)), acc0)

    # 3. const scale + folds (+ the dm re-NTT for fa_q)
    def scale_fn(inner_c, const_r, acc):
        dm = bfv._scale_impl(const_r, lvl)
        c0 = add_mod(inner_c[..., 0, :, :], dm, q.p_d)
        inner = inner_c.at[..., 0, :, :].set(c0)
        dm_ntt = q.ntt.ntt(q.to_mont(dm[:, 1:]))
        fa_q = acc[:, 1:].at[:, :, 0].set(add_mod(acc[:, 1:, 0], dm_ntt, q.p_d))
        return inner, fa_q

    timeit("scale_add", scale_fn, inner0, const_r, acc0)

    # 4. Bsk lift of the lhs (conv + to_mont + NTT)
    conv = mc["conv"]
    timeit(
        "bsk_lift",
        lambda x: bsk.ntt.ntt(bsk.to_mont(conv(x))),
        inner0[:, 1:],
    )

    # 5. tensor products + M-reduction in both bases (+INTT back)
    fa_b0 = mk(ks[4], (R, nh, 2, Lb, N), hi)
    timeit(
        "msum",
        lambda faq, fbq, fab, fbb: (
            _msum_tensor(q, faq, fbq, nh),
            _msum_tensor(bsk, fab, fbb, nh),
        ),
        acc0[:, 1:], fbq0, fa_b0, fbb0,
    )

    # 6. scale-down (fast floor + SK conversion)
    xq0 = mk(ks[5], (R, 3, L, N), hi)
    xb0 = mk(ks[6], (R, 3, Lb, N), hi)

    def scaledown_fn(x_q, x_b):
        xt_q = shoup_mul(x_q, *mc["t_sh_q"], q.p_d)
        xt_b = shoup_mul(x_b, *mc["t_sh_bsk"], bsk.p_d)
        cv = conv(xt_q)
        y_b = shoup_mul(sub_mod(xt_b, cv, bsk.p_d), *mc["qinv_sh_bsk"], bsk.p_d)
        return mc["sk_conv"](y_b)

    timeit("scaledown", scaledown_fn, xq0, xb0)

    # 7. relinearize
    tot0 = mk(ks[7], (R, 3, L, N), hi)
    timeit(
        "relin",
        lambda d, ksk: bfv.relinearize(
            Ciphertext(d, is_ntt=False, level=lvl), RelinKey(ksk, rk.level)
        ).data,
        tot0, rk.ksk,
    )

    # 8. mod-switch + mask
    rel0 = mk(ks[0], (R, 2, L, N), hi)
    rbase = bfv.levels[rlvl]

    def msw_fn(d, mask_r):
        sw = bfv.mod_switch_to(Ciphertext(d, is_ntt=False, level=lvl), rlvl)
        dm2 = bfv._scale_impl(bfv.encode(mask_r), rlvl)
        return sw.data.at[:, 0].set(add_mod(sw.data[:, 0], dm2, rbase.p_d))

    timeit("modswitch", msw_fn, rel0, mask_r)


if __name__ == "__main__":
    main()
