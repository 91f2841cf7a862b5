"""Worst-case dense query probe: the noise-margin measurement engine.

The reference gets its noise guarantees implicitly from SEAL's parameter
selection (/root/reference/common/apsu/psu_params.cpp:95-180); apsu_tpu's
re-based ≤30-bit RNS chains pick evaluation/result levels from analytic
estimates (db/receiver_db.py), so each parameter file's margin must be
VALIDATED: build a synthetic DB with every bin packed to
``max_items_per_bin`` (the densest load the file permits — dense bundles
measure ~10 bits worse than sparse ones), run one real query through the
production evaluator path, and check exact decryption plus the residual
invariant-noise budget.  Used by tests and by tools/param_sweep.py.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from apsu_tpu.core.bfv import Ciphertext, RelinKey
from apsu_tpu.core.params import PSUParams
from apsu_tpu.db.receiver_db import ReceiverDB
from apsu_tpu.engine.evaluator import (
    compute_power_tensor,
    compute_ps_power_tensors,
    eval_matching_polys,
    eval_matching_polys_ps,
)
from apsu_tpu.engine.powers import plan_query


@dataclasses.dataclass
class ProbeResult:
    exact: bool              # every planted match decrypted to the mask
    n_matched: int           # planted matches
    n_wrong: int             # planted matches that decrypted wrong (noise!)
    n_false: int             # non-matches that collided with the mask
    noise_budget_bits: float  # residual invariant-noise budget (min over sample)
    eval_level: int
    result_level: int


def dense_query_probe(
    params: PSUParams,
    rng: np.random.Generator,
    n_caches: int = 1,
    match_every: int = 4,
    budget_sample: int = 64,
) -> ProbeResult:
    """Full-degree probe of one parameter set through the production path.

    Every bin holds ``max_items_per_bin`` random roots; the query vector
    matches a planted root on every ``match_every``-th lane and a non-root
    value elsewhere.  Matched lanes MUST decrypt to exactly the mask — a
    wrong decryption means the noise margin of this parameter file is
    insufficient and the union would be silently wrong.
    """
    p = params
    t = p.seal_params.plain_modulus
    B, N, K = p.bundle_idx_count, p.poly_degree, p.table_params.max_items_per_bin

    db = ReceiverDB(p, oprf=None)
    roots = db.set_synthetic_dense(rng, n_caches=n_caches)  # [B, C, K, N]
    C = n_caches
    bfv = db.bfv

    # query vector: planted root (cache c = lane % C, depth = lane % K) on
    # matching lanes, a guaranteed non-root elsewhere
    lanes = np.arange(N)
    qvec = np.empty((B, N), dtype=np.uint32)
    is_match = (lanes % match_every) == 0
    for b in range(B):
        csel = lanes % C
        dsel = lanes % K
        qvec[b] = roots[b, csel, dsel, lanes]
        for l in np.nonzero(~is_match)[0]:
            v = int(rng.integers(1, t))
            while v in roots[b, :, :, l]:
                v = int(rng.integers(1, t))
            qvec[b, l] = v

    # encrypted source powers (the Sender's create_query datapath)
    from apsu_tpu.api.parties import _pow_mod

    plist = tuple(p.query_params.query_powers)
    stack = np.stack(
        [_pow_mod(qvec.astype(np.uint64), s, t).astype(np.uint32) for s in plist]
    )  # [P, B, N]
    from apsu_tpu.db.measured_levels import query_level

    sk = bfv.gen_secret_key(rng)
    ql = query_level(p, len(bfv.q_primes))  # production fresh-query level
    ct = bfv.encrypt_symmetric(bfv.encode(stack), sk, rng, level=ql)
    cts = {s: Ciphertext(ct.data[i], is_ntt=False, level=ql) for i, s in enumerate(plist)}
    plan = plan_query(plist, K, p.query_params.ps_low_degree)
    rk = bfv.gen_relin_key(sk, rng, level=ql) if bfv.qp is not None else None

    from apsu_tpu.db.measured_levels import defer_relin, powers_at_eval

    at_eval = powers_at_eval(p)
    defer = defer_relin(p)
    mask = rng.integers(0, t, size=(B, C, N), dtype=np.uint64).astype(np.uint32)
    if plan.uses_ps:
        low_ntt, high_coeff = compute_ps_power_tensors(
            bfv, cts, plan, rk, eval_level=db.eval_lvl, at_eval=at_eval,
            defer_relin=defer,
        )
        res = eval_matching_polys_ps(
            bfv,
            jnp.moveaxis(low_ntt, 0, 1),
            jnp.moveaxis(high_coeff, 0, 1),
            db.coeff_cache,
            db.ps_const_polys,
            jnp.asarray(mask),
            rk,
            p.query_params.ps_low_degree,
            db.result_lvl,
            K,
            eval_level=db.eval_lvl,
        )
    else:
        powers = compute_power_tensor(
            bfv, cts, plan.low, rk, db.eval_lvl, at_eval=at_eval
        )
        res = eval_matching_polys(
            bfv,
            jnp.moveaxis(powers, 0, 1),
            db.coeff_cache,
            db.const_slots,
            jnp.asarray(mask),
            db.eval_lvl,
        )

    vals = np.asarray(jax.device_get(bfv.decode(bfv.decrypt_device(res, sk))))
    # expected: lane l of (b, c) matches iff qvec[b, l] is a root of that bin
    n_matched = n_wrong = n_false = 0
    for b in range(B):
        for c in range(C):
            lane_match = np.array(
                [qvec[b, l] in roots[b, c, :, l] for l in range(N)]
            )
            eq = vals[b, c] == mask[b, c]
            n_matched += int(lane_match.sum())
            n_wrong += int((lane_match & ~eq).sum())
            n_false += int((~lane_match & eq).sum())

    budget = _sampled_noise_budget(bfv, res, sk, budget_sample)
    return ProbeResult(
        exact=(n_wrong == 0),
        n_matched=n_matched,
        n_wrong=n_wrong,
        n_false=n_false,
        noise_budget_bits=budget,
        eval_level=db.eval_lvl,
        result_level=db.result_lvl,
    )


def _sampled_noise_budget(bfv, ct: Ciphertext, sk, sample: int) -> float:
    """Invariant-noise budget over a coefficient sample (the full budget
    scan is a per-coefficient host bigint loop — too slow at N=8192)."""
    x = jax.device_get(bfv._dot_with_secret(ct, sk))
    base = bfv.levels[ct.level]
    flat = x.reshape(-1, base.k, x.shape[-1])
    n_ct = flat.shape[0]
    idx = np.linspace(0, x.shape[-1] - 1, num=min(sample, x.shape[-1]), dtype=int)
    Ql = base.prod
    import math

    max_frac = 0
    for i in range(n_ct):
        big = base.compose(flat[i][:, idx])
        for v in big.reshape(-1):
            tx = int(v) * bfv.t
            frac = tx - (tx + Ql // 2) // Ql * Ql
            max_frac = max(max_frac, abs(frac))
    if max_frac == 0:
        return float(Ql.bit_length())
    return max(0.0, math.log2(Ql) - 1.0 - math.log2(max_frac))
