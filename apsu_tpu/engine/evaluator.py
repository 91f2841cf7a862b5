"""Query-power computation and the batched matching-polynomial evaluator.

This is the receiver's online hot path, replacing the reference's
``Receiver::ComputePowers`` + ``ProcessBinBundleCache`` +
``BatchedPlaintextPolyn::eval`` stack (/root/reference/receiver/apsu/
receiver_osn.cpp:395-540, bin_bundle.cpp:106-174): instead of one thread task
per (bundle_idx, cache) evaluating SEAL ops, ALL bundle indices and caches
evaluate in a single fused device kernel — on TPU a Pallas reduction-grid
kernel with lazy 64-bit Montgomery accumulation (ops/polyeval.py) that
streams the HBM-resident coefficient cache through VMEM exactly once; on CPU
an XLA fori_loop fallback.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from apsu_tpu.core.bfv import BfvContext, Ciphertext, RelinKey
from apsu_tpu.core.mod32 import add_mod, mont_mul
from apsu_tpu.engine.powers import PowerSchedule, QueryPlan
from apsu_tpu.ops.polyeval import DEG_CHUNK, eval_dot_pallas


def _use_pallas(bfv: BfvContext, level: int) -> bool:
    """Pallas path: TPU backend + all eval-level primes < 2^28 (the narrow
    lazy-reduction kernel's precondition).  APSU_PALLAS_INTERPRET=1 forces
    the kernel through the Pallas interpreter on CPU (test coverage of the
    production kernel inside the full evaluator)."""
    import os

    if jax.default_backend() == "cpu" and not os.environ.get("APSU_PALLAS_INTERPRET"):
        return False
    return all(p < (1 << 28) for p in bfv.levels[level].primes)


def _pallas_interpret() -> bool:
    import os

    return jax.default_backend() == "cpu" and bool(
        os.environ.get("APSU_PALLAS_INTERPRET")
    )


def _powers_at_eval() -> bool:
    """Global opt-in (APSU_POWERS_AT_EVAL=1): mod-switch the query sources
    down to the evaluation level BEFORE running the power wavefront, so
    every DAG multiply/relinearization runs on eval-level limbs instead of
    the full chain — saving (k - lvl)/k of the powers phase.  Noise: the
    mod-switch rounding floor enters before the DAG and is amplified by its
    depth (~t·√N per ct×ct level), so this trades measured budget for
    speed.  Production callers pass ``at_eval`` explicitly from the
    per-config measured table (db/measured_levels.powers_at_eval), which is
    only populated when tools/level_calibrate.py measured the dense probe
    exact with margin; the env flag is the calibration/experiment override."""
    import os

    return bool(os.environ.get("APSU_POWERS_AT_EVAL"))


def _schedule_key(schedule: PowerSchedule):
    """Hashable identity of a static wavefront schedule (jit cache key)."""
    return (
        schedule.sources,
        schedule.max_power,
        tuple(tuple(lvl) for lvl in schedule.levels),
    )


def _shard_map():
    try:  # jax >= 0.4.35 moved shard_map to the top level
        from jax import shard_map as m

        return m.shard_map if hasattr(m, "shard_map") else m
    except ImportError:  # pragma: no cover
        from jax.experimental.shard_map import shard_map as f

        return f


def _make_rowmap(axis: str, n_dev: int):
    """Row-parallelism hook for the fused power program under ``shard_map``:
    apply ``f`` (batch-agnostic over ONE leading row axis) to tensors whose
    leading two axes are (group, bundle), sharding the flattened row axis
    across the mesh and all-gathering the result.  Each row's value is the
    identical elementwise computation the unsharded path performs, and the
    tiled all-gather reassembles rows in order — bit-identical by
    construction (the reference analogue is PowersDag::parallel_apply's
    work distribution, common/apsu/powers.h:159-278, which likewise
    repartitions WORK, never values)."""

    def rowmap(f, *xs):
        G, Bq = xs[0].shape[0], xs[0].shape[1]
        rows = G * Bq
        pad = (-rows) % n_dev
        R = (rows + pad) // n_dev
        idx = jax.lax.axis_index(axis)

        def prep(x):
            flat = x.reshape((rows,) + x.shape[2:])
            if pad:
                flat = jnp.concatenate(
                    [flat, jnp.zeros((pad,) + flat.shape[1:], flat.dtype)]
                )
            return jax.lax.dynamic_slice_in_dim(flat, idx * R, R, axis=0)

        ys = f(*[prep(x) for x in xs])
        tup = isinstance(ys, tuple)
        outs = []
        for y in ys if tup else (ys,):
            full = jax.lax.all_gather(y, axis, axis=0, tiled=True)
            outs.append(full[:rows].reshape((G, Bq) + y.shape[1:]))
        return tuple(outs) if tup else outs[0]

    return rowmap


def _rowmap_for(shard):
    """rowmap hook for a (mesh, axis) shard spec, or None (direct path)."""
    if shard is None:
        return None
    mesh, axis = shard
    return _make_rowmap(axis, int(mesh.devices.size))


def _shard_wrap(impl, shard):
    """Wrap a fused power program in ONE ``shard_map`` over the mesh: all
    inputs replicated, heavy per-row ops internally distributed by the
    rowmap hook (created via ``_rowmap_for`` and closed over by ``impl``),
    output replicated."""
    if shard is None:
        return impl
    mesh, _ = shard
    from jax.sharding import PartitionSpec as P

    return _shard_map()(
        impl, mesh=mesh, in_specs=P(), out_specs=P(), check_vma=False
    )


def _shard_key(shard):
    if shard is None:
        return None
    mesh, axis = shard
    return (id(mesh), axis)


def compute_power_tensor(
    bfv: BfvContext,
    source_cts: Dict[int, Ciphertext],
    schedule: PowerSchedule,
    relin_key: Optional[RelinKey],
    eval_level: int,
    at_eval: Optional[bool] = None,
    shard=None,
) -> jnp.ndarray:
    """Run the wavefront schedule, returning NTT powers [D, ..., 2, Le, N].

    ``shard``: optional (mesh, axis) — the WHOLE fused program runs under
    one ``shard_map`` with every per-row stage (operand transforms, BEHZ
    products, relinearizations, final switch+NTT) distributed over the
    mesh's flattened (group × bundle) rows and all-gathered between DAG
    levels; inputs/outputs replicated.  Bit-identical to the direct path
    (see _make_rowmap).

    source_cts: {power: Ciphertext} fresh query ciphertexts (coeff domain,
    full level), identically batched.  Each schedule level executes as one
    batched multiply + one batched relinearize over the level's targets —
    and the WHOLE wavefront (all DAG levels + mod-switch + NTT) runs as a
    single fused device program: the schedule is static, so dispatching it
    call-by-call only paid per-dispatch latency (~11 ms/call over a remote
    TPU tunnel, ~20 calls at the 16M shape).
    """
    srcs = tuple(sorted(source_cts))
    src_lvl = source_cts[srcs[0]].level  # fresh query level (≤ full chain)
    need_rk = bool(schedule.levels)
    rk_lvl = relin_key.level if relin_key is not None else None

    if at_eval is None:
        at_eval = _powers_at_eval()
    rowmap = _rowmap_for(shard)

    def impl(*args):
        if need_rk:
            ksk, *datas = args
            rk = RelinKey(ksk, rk_lvl)
        else:
            datas, rk = args, None
        wf_lvl = eval_level if at_eval else src_lvl
        have = {
            s: Ciphertext(
                bfv.mod_switch_to(
                    Ciphertext(d, is_ntt=False, level=src_lvl), wf_lvl
                ).data,
                is_ntt=False,
                level=wf_lvl,
            )
            for s, d in zip(srcs, datas)
        }
        have = _run_schedule(bfv, have, schedule, rk, level=wf_lvl,
                             rowmap=rowmap)
        stack = jnp.stack(
            [have[p].data for p in range(1, schedule.max_power + 1)]
        )  # [D, ..., 2, L, N]

        def fin(x):
            switched = bfv.mod_switch_to(
                Ciphertext(x, is_ntt=False, level=wf_lvl), eval_level
            )
            return bfv.to_ntt(switched).data

        return fin(stack) if rowmap is None else rowmap(fin, stack)

    impl.__name__ = "power_tensor"  # named XLA module (profiler)

    import os as _os

    fn = bfv._jitted(
        (
            "power_tensor", _schedule_key(schedule), eval_level, srcs,
            src_lvl, rk_lvl, at_eval,
            int(_os.environ.get("APSU_MUL_CHUNK", 8)),
            _shard_key(shard),
        ),
        _shard_wrap(impl, shard),
    )
    datas = [source_cts[s].data for s in srcs]
    if need_rk:
        if relin_key is None:
            raise ValueError("power schedule requires relinearization keys")
        return fn(relin_key.ksk, *datas)
    return fn(*datas)


def _run_schedule(
    bfv: BfvContext,
    have: Dict[int, Ciphertext],
    schedule: PowerSchedule,
    relin_key: Optional[RelinKey],
    mul_chunk: int = 8,
    level: Optional[int] = None,
    forms: Optional[Dict[int, tuple]] = None,
    defer_terminal: bool = False,
    rowmap=None,
) -> Dict[int, Ciphertext]:
    """Level-synchronous wavefront: each dag level executes as batched
    multiplies + relinearizations over its (target, a, b) products, chunked
    to ``mul_chunk`` targets so the BEHZ temporaries (which span q ∪ Bsk)
    stay bounded while the DB cache is HBM-resident.  ``level`` is the
    modulus level the wavefront runs at (default: full chain).

    ``defer_terminal``: TERMINAL targets (never consumed as operands by a
    later level) skip relinearization here and stay 3-component — the
    caller mod-switches them down and relinearizes ALL of them in one
    batched call at the EVAL level, where the gadget has (k_wf - k_eval)
    fewer digit rows and limb columns (16M-4096: 46 of 66 products are
    terminal; their digit NTTs shrink from 6x7 to 4x5 planes).  NOT
    bit-identical to eager relin (the key-switch rounding happens at a
    different level); exactness is guarded by the measured-level noise
    probe like every level choice (tools/level_calibrate.py).

    Operand transforms are DEDUPLICATED: each distinct power is forward-
    NTT'd into (q, Bsk) form once per wavefront (``operand_forms``) and the
    forms are reused by every product that consumes it — the power x^1
    alone feeds a large fraction of the DAG, and the per-product path paid
    4 fresh operand transforms per product (2 ops × 2 bases), ~45% of the
    multiply's NTT work.  Bit-identical to the per-product path (the same
    transformed values feed the same tensor sequence).  ``forms`` shares
    the cache across schedules run at the same level in one program (the
    PS low/high pair reuse their common sources)."""
    import os as _os

    k = level if level is not None else bfv.q.k
    rm = rowmap if rowmap is not None else (lambda f, *xs: f(*xs))
    forms = forms if forms is not None else {}
    dedup = _os.environ.get("APSU_DEDUP_FORMS", "1") != "0"
    # APSU_MUL_CHUNK: targets per batched multiply+relin kernel pair.  A
    # whole 16M-4096 DAG level is ≤30 targets, so chunk ≥ 30 runs each
    # level as ONE kernel pair instead of ⌈level/8⌉ — bigger NTT batches,
    # and the BEHZ temporaries stay small relative to HBM (a 30-target ×
    # B=4 chunk peaks well under 1 GB at the 16M shape).
    mul_chunk = int(_os.environ.get("APSU_MUL_CHUNK", mul_chunk))
    used = {a for lg in schedule.levels for (_, a, _) in lg} | {
        b for lg in schedule.levels for (_, _, b) in lg
    }
    for level_grp in schedule.levels:
        if relin_key is None:
            raise ValueError("power schedule requires relinearization keys")
        if dedup:
            # ONE stacked transform for all of the level's new sources:
            # per-source operand_forms calls fragment the NTT into tiny
            # grids (the fused kernels batch over the leading axes), which
            # measured SLOWER end-to-end than the undeduplicated-but-
            # batched path (tools/profile_query.py, 202.5 vs 159 ms)
            new = sorted(
                s
                for s in {a for (_, a, _) in level_grp}
                | {b for (_, _, b) in level_grp}
                if s not in forms
            )
            if new:
                fq, fb = rm(
                    lambda x: bfv.operand_forms(x, k),
                    jnp.stack([have[s].data for s in new]),
                )
                for i, s in enumerate(new):
                    forms[s] = (fq[i], fb[i])
        for c0 in range(0, len(level_grp), mul_chunk):
            group = level_grp[c0 : c0 + mul_chunk]
            if dedup:
                fa_q = jnp.stack([forms[a][0] for (_, a, _) in group])
                fa_b = jnp.stack([forms[a][1] for (_, a, _) in group])
                fb_q = jnp.stack([forms[b][0] for (_, _, b) in group])
                fb_b = jnp.stack([forms[b][1] for (_, _, b) in group])
                prod3 = rm(
                    lambda aq, ab, bq, bb: bfv.tensor_scaledown_fused(
                        aq, ab, bq, bb, k
                    ),
                    fa_q, fa_b, fb_q, fb_b,
                )
            else:
                lhs = jnp.stack([have[a].data for (_, a, _) in group])
                rhs = jnp.stack([have[b].data for (_, _, b) in group])
                prod3 = rm(
                    lambda l, r: bfv.multiply(
                        Ciphertext(l, is_ntt=False, level=k),
                        Ciphertext(r, is_ntt=False, level=k),
                    ).data,
                    lhs, rhs,
                )
            defer_idx = [
                i
                for i, (t, _, _) in enumerate(group)
                if defer_terminal and t not in used
            ]
            now_idx = [i for i in range(len(group)) if i not in defer_idx]
            if now_idx:
                sel = (
                    prod3
                    if len(now_idx) == len(group)
                    else prod3[np.array(now_idx)]
                )
                rel_data = rm(
                    lambda x: bfv.relinearize(
                        Ciphertext(x, is_ntt=False, level=k), relin_key
                    ).data,
                    sel,
                )
                for j, i in enumerate(now_idx):
                    have[group[i][0]] = Ciphertext(
                        rel_data[j], is_ntt=False, level=k
                    )
            for i in defer_idx:  # stays 3-component; caller relinearizes
                have[group[i][0]] = Ciphertext(
                    prod3[i], is_ntt=False, level=k
                )
    return have


_MERGE_OFF = 1 << 20  # disjoint target namespace for merged high powers


def _merge_schedules(low: PowerSchedule, high: PowerSchedule) -> PowerSchedule:
    """Zip the low/high wavefronts level-by-level into ONE schedule (high
    targets/operands offset by _MERGE_OFF): the two DAGs are independent
    (x-powers vs y-powers), so level i of each can share one batched
    multiply + relinearization kernel pair — the 16M-4096 wavefront then
    runs 3 kernel pairs (13 + 39 + 14 targets) instead of 5 (and instead
    of 11 chunks at the default mul_chunk=8).  Bit-identical per product
    (the same operand forms feed the same tensor sequence; only the batch
    grouping changes, and modular ops are elementwise)."""
    depth = max(len(low.levels), len(high.levels))
    levels = []
    for i in range(depth):
        grp = list(low.levels[i]) if i < len(low.levels) else []
        if i < len(high.levels):
            grp += [
                (t + _MERGE_OFF, a + _MERGE_OFF, b + _MERGE_OFF)
                for (t, a, b) in high.levels[i]
            ]
        levels.append(grp)
    return PowerSchedule(
        sources=low.sources
        + tuple(s + _MERGE_OFF for s in high.sources),
        max_power=0,  # unused by _run_schedule (targets listed explicitly)
        levels=levels,
    )


def compute_ps_power_tensors(
    bfv: BfvContext,
    source_cts: Dict[int, Ciphertext],
    plan: QueryPlan,
    relin_key: Optional[RelinKey],
    eval_level: Optional[int] = None,
    batch_first: bool = False,
    at_eval: Optional[bool] = None,
    defer_relin: Optional[bool] = None,
    shard=None,
):
    """Power tensors for the Paterson–Stockmeyer path (both at FULL level).

    Returns (low_ntt [ℓ, ..., 2, L, N], high_coeff [nh, ..., 2, L, N]):
    x^1..x^ℓ NTT-transformed for the inner dot products, and y^1..y^nh
    (y = x^(ℓ+1)) kept in coefficient domain for the outer BEHZ products.
    With ``batch_first`` the power axis moves behind the leading batch axis
    inside the fused program ([..., ℓ, 2, L, N]), saving the caller an
    eager transpose.  Both schedules + mod-switches + NTT run as ONE fused
    device program (see compute_power_tensor).
    """
    ph = plan.ps_low_degree + 1
    k = bfv.q.k
    lvl = eval_level or k
    src_lvl = next(iter(source_cts.values())).level  # fresh query level
    low_srcs = tuple(sorted(s for s in source_cts if s <= plan.ps_low_degree))
    high_srcs = tuple(
        sorted(s // ph for s in source_cts if s > plan.ps_low_degree)
    )
    need_rk = bool(plan.low.levels) or bool(plan.high.levels)
    rk_lvl = relin_key.level if relin_key is not None else None

    if at_eval is None:
        at_eval = _powers_at_eval()
    import os as _os

    # merged low+high wavefront (see _merge_schedules); APSU_MERGE_WF=0
    # restores the separate-schedule path (bit-identical either way)
    merge_wf = _os.environ.get("APSU_MERGE_WF", "1") != "0"
    # deferred terminal relinearization (see _run_schedule docstring).
    # Production callers pass ``defer_relin`` from the measured-level table
    # (db/measured_levels.defer_relin — probe-backed, like at_eval); the
    # env var forces it for calibration/experiments.
    if defer_relin is None:
        defer_relin = _os.environ.get("APSU_DEFER_RELIN", "0") != "0"
    rowmap = _rowmap_for(shard)

    def impl(*args):
        if need_rk:
            ksk, *datas = args
            rk = RelinKey(ksk, rk_lvl)
        else:
            datas, rk = args, None
        nl = len(low_srcs)
        wf_lvl = lvl if at_eval else src_lvl

        def src(d):
            return Ciphertext(
                bfv.mod_switch_to(
                    Ciphertext(d, is_ntt=False, level=src_lvl), wf_lvl
                ).data,
                is_ntt=False,
                level=wf_lvl,
            )

        if merge_wf:
            have = {s: src(d) for s, d in zip(low_srcs, datas[:nl])}
            have.update(
                {
                    s + _MERGE_OFF: src(d)
                    for s, d in zip(high_srcs, datas[nl:])
                }
            )
            have = _run_schedule(
                bfv, have, _merge_schedules(plan.low, plan.high), rk,
                level=wf_lvl, defer_terminal=defer_relin, rowmap=rowmap,
            )
            low = {p: have[p] for p in range(1, plan.low.max_power + 1)}
            high = {
                p: have[p + _MERGE_OFF]
                for p in range(1, plan.high.max_power + 1)
            }
        else:
            low_have = {s: src(d) for s, d in zip(low_srcs, datas[:nl])}
            high_have = {s: src(d) for s, d in zip(high_srcs, datas[nl:])}
            low = _run_schedule(
                bfv, low_have, plan.low, rk, level=wf_lvl,
                defer_terminal=defer_relin, rowmap=rowmap,
            )
            high = _run_schedule(
                bfv, high_have, plan.high, rk, level=wf_lvl,
                defer_terminal=defer_relin, rowmap=rowmap,
            )
        # assemble: 2-component powers switch straight down; deferred
        # 3-component terminal products switch down THEN relinearize once,
        # batched, at the eval level (46 of 66 products at 16M-4096 — their
        # gadget runs on eval-level digit rows/limb columns)
        nlow = plan.low.max_power
        items = [low[p] for p in range(1, nlow + 1)] + [
            high[p] for p in range(1, plan.high.max_power + 1)
        ]
        i2 = [i for i, c in enumerate(items) if c.size == 2]
        i3 = [i for i, c in enumerate(items) if c.size == 3]
        rm = rowmap if rowmap is not None else (lambda f, *xs: f(*xs))
        sw2 = rm(
            lambda x: bfv.mod_switch_to(
                Ciphertext(x, is_ntt=False, level=wf_lvl), lvl
            ).data,
            jnp.stack([items[i].data for i in i2]),
        )
        if i3:
            rel3 = rm(
                lambda x: bfv.relinearize(
                    bfv.mod_switch_to(
                        Ciphertext(x, is_ntt=False, level=wf_lvl), lvl
                    ),
                    rk,
                ).data,
                jnp.stack([items[i].data for i in i3]),
            )
            full = jnp.concatenate([sw2, rel3])
        else:
            full = sw2
        full = full[np.argsort(np.array(i2 + i3))]  # back to power order
        low_ntt = rm(
            lambda x: bfv.to_ntt(
                Ciphertext(x, is_ntt=False, level=lvl)
            ).data,
            full[:nlow],
        )
        high_coeff = full[nlow:]
        if batch_first:
            low_ntt = jnp.moveaxis(low_ntt, 0, 1)
            high_coeff = jnp.moveaxis(high_coeff, 0, 1)
        return low_ntt, high_coeff

    impl.__name__ = "ps_powers"  # named XLA module (profiler attribution)

    fn = bfv._jitted(
        (
            "ps_power_tensors",
            _schedule_key(plan.low),
            _schedule_key(plan.high),
            lvl,
            low_srcs,
            high_srcs,
            src_lvl,
            rk_lvl,
            batch_first,
            at_eval,
            merge_wf,
            defer_relin,
            int(_os.environ.get("APSU_MUL_CHUNK", 8)),
            _shard_key(shard),
        ),
        _shard_wrap(impl, shard),
    )
    datas = [
        source_cts[s].data for s in sorted(source_cts) if s <= plan.ps_low_degree
    ] + [
        source_cts[s].data for s in sorted(source_cts) if s > plan.ps_low_degree
    ]
    if need_rk:
        if relin_key is None:
            raise ValueError("power schedule requires relinearization keys")
        return fn(relin_key.ksk, *datas)
    return fn(*datas)


def eval_matching_polys(
    bfv: BfvContext,
    powers_ntt: jnp.ndarray,      # [B, D, 2, Le, N] NTT mont (powers 1..D)
    coeff_cache: jnp.ndarray,     # [B, C, D+1, Le, N] NTT mont plaintexts
    const_slots: jnp.ndarray,     # [B, C, N] uint32 < t: coeff0 in slot domain
    mask_slots: jnp.ndarray,      # [B, C, N] uint32 < t: random mask r
    eval_level: int,
) -> Ciphertext:
    """result[b,c] = Σ_{j=1..D} ctpow[b,j] ⊙ pt[b,c,j]  + Δ·encode(coeff0+mask).

    Returns a batched 2-component ciphertext [B, C, 2, Le, N] in coeff domain.
    """
    base = bfv.levels[eval_level]
    t = np.uint32(bfv.t)

    def impl(powers, cache, const_s, mask_s):
        cms = add_mod(const_s, mask_s, t)  # fold mask on device
        D = powers.shape[1]
        B, C = cache.shape[0], cache.shape[1]
        N = powers.shape[-1]
        Dp = cache.shape[2]

        if _use_pallas(bfv, eval_level):
            # align powers with the cache's coefficient planes: plane 0 (the
            # constant) and the chunk-padding tail contribute zero terms
            pw = jnp.concatenate(
                [
                    jnp.zeros((B, 1, 2, base.k, N), jnp.uint32),
                    powers,
                    jnp.zeros((B, Dp - D - 1, 2, base.k, N), jnp.uint32),
                ],
                axis=1,
            )
            c = bfv.levels[eval_level]
            consts = np.stack([np.asarray(c.p_d).ravel(), np.asarray(c.pni_d).ravel()])
            acc = eval_dot_pallas(
                pw, cache, consts[0], consts[1], interpret=_pallas_interpret()
            )
        else:
            acc = jnp.zeros((B, C, 2, base.k, N), dtype=jnp.uint32)
            CH = min(16, D)
            nch = D // CH

            def body(ci, acc):
                j0 = ci * CH
                pw = jax.lax.dynamic_slice_in_dim(powers, j0, CH, axis=1)
                pt = jax.lax.dynamic_slice_in_dim(cache, j0 + 1, CH, axis=2)
                part = None
                for u in range(CH):
                    term = mont_mul(
                        pw[:, u, None], pt[:, :, u, None], base.p_d, base.pni_d
                    )  # [B, C, 2, Le, N]
                    part = term if part is None else add_mod(part, term, base.p_d)
                return add_mod(acc, part, base.p_d)

            acc = jax.lax.fori_loop(0, nch, body, acc)

            def tail(j, acc):
                pw = jax.lax.dynamic_index_in_dim(powers, j, axis=1, keepdims=False)
                pt = jax.lax.dynamic_index_in_dim(cache, j + 1, axis=2, keepdims=False)
                term = mont_mul(
                    pw[:, None, :, :, :], pt[:, :, None, :, :], base.p_d, base.pni_d
                )
                return add_mod(acc, term, base.p_d)

            acc = jax.lax.fori_loop(nch * CH, D, tail, acc)
        acc = base.from_mont(base.ntt.intt(acc))  # coeff domain plain
        pt0 = bfv.encode(cms)                     # [B, C, N] poly mod t
        dm = bfv._scale_impl(pt0, eval_level)     # round(Q_l·m/t), plain
        c0 = add_mod(acc[:, :, 0], dm, base.p_d)
        return acc.at[:, :, 0].set(c0)

    data = bfv._jitted(("eval_matching", eval_level), impl)(
        powers_ntt, coeff_cache, const_slots, mask_slots
    )
    return Ciphertext(data, is_ntt=False, level=eval_level)


def eval_matching_polys_labeled(
    bfv: BfvContext,
    powers_ntt: jnp.ndarray,      # [B, D, 2, Le, N] NTT mont (powers 1..D)
    coeff_cache: jnp.ndarray,     # [B, C, Dp, Le, N] matching-poly planes
    const_slots: jnp.ndarray,     # [B, C, N] matching constant coeffs
    mask_slots: jnp.ndarray,      # [B, C, N] random mask r
    label_cache: jnp.ndarray,     # [B, C, Dp, Le, N] label-poly planes
    label0_slots: jnp.ndarray,    # [B, C, N] label constant coeffs L_0
    rho_slots: jnp.ndarray,       # [B, C, N] label blinding factor ρ
    eval_level: int,
):
    """Labeled evaluation (reference ``BatchedPlaintextPolyn::eval`` label
    branch, bin_bundle.cpp:106-174 with label polynomials): one pass over
    the shared query-power stream computes

        result_M = M(x) + Δ·r        (the usual masked matching result)
        result_L = L(x) + ρ·M(x) + Δ·0

    slot-wise; at a matching slot M(x)=0, so result_L decrypts to exactly
    the label felt, elsewhere ρ·M(x) blinds L.  Returns (match_ct, label_ct).
    """
    base = bfv.levels[eval_level]
    t = np.uint32(bfv.t)

    def impl(powers, mcache, lcache, const_s, mask_s, l0_s, rho_s):
        D = powers.shape[1]
        B, C = mcache.shape[0], mcache.shape[1]
        N = powers.shape[-1]
        Dp = mcache.shape[2]
        pw = jnp.concatenate(
            [
                jnp.zeros((B, 1, 2, base.k, N), jnp.uint32),
                powers,
                jnp.zeros((B, Dp - D - 1, 2, base.k, N), jnp.uint32),
            ],
            axis=1,
        )

        def dot(cache):
            def body(j, acc):
                a = jax.lax.dynamic_index_in_dim(pw, j, axis=1, keepdims=False)
                b = jax.lax.dynamic_index_in_dim(cache, j, axis=2, keepdims=False)
                return add_mod(
                    acc,
                    mont_mul(a[:, None], b[:, :, None], base.p_d, base.pni_d),
                    base.p_d,
                )

            return jax.lax.fori_loop(
                0, Dp, body, jnp.zeros((B, C, 2, base.k, N), jnp.uint32)
            )

        accM = dot(mcache)                       # NTT mont, sans constant
        accL = dot(lcache)
        # fold the matching constant into accM (NTT domain) so the blinding
        # term sees the FULL M(x)
        dm0 = base.ntt.ntt(base.to_mont(bfv._scale_impl(bfv.encode(const_s), eval_level)))
        accM = accM.at[:, :, 0].set(add_mod(accM[:, :, 0], dm0, base.p_d))
        rho_ntt = bfv.lift_plaintext_ntt(bfv.encode(rho_s), eval_level)
        accL = add_mod(
            accL, mont_mul(accM, rho_ntt[:, :, None], base.p_d, base.pni_d), base.p_d
        )

        resM = base.from_mont(base.ntt.intt(accM))
        dmask = bfv._scale_impl(bfv.encode(mask_s), eval_level)
        resM = resM.at[:, :, 0].set(add_mod(resM[:, :, 0], dmask, base.p_d))
        resL = base.from_mont(base.ntt.intt(accL))
        dl0 = bfv._scale_impl(bfv.encode(l0_s), eval_level)
        resL = resL.at[:, :, 0].set(add_mod(resL[:, :, 0], dl0, base.p_d))
        return resM, resL

    f = bfv._jitted(("eval_matching_labeled", eval_level), impl)
    resM, resL = f(
        powers_ntt, coeff_cache, label_cache, const_slots, mask_slots,
        label0_slots, rho_slots,
    )
    return (
        Ciphertext(resM, is_ntt=False, level=eval_level),
        Ciphertext(resL, is_ntt=False, level=eval_level),
    )


def eval_matching_polys_ps(
    bfv: BfvContext,
    low_powers_ntt: jnp.ndarray,    # [B, ℓ, 2, L, N] NTT mont: x^1..x^ℓ, FULL level
    high_powers_coeff: jnp.ndarray,  # [B, nh, 2, L, N] coeff plain: y^1..y^nh, y=x^(ℓ+1)
    coeff_cache: jnp.ndarray,       # [B, C, K+1, L, N] NTT mont plaintexts, FULL level
    const_polys: jnp.ndarray,       # [B, C, nh+1, N] mod-t polys: encoded c_{k·ph} columns
    mask_slots: jnp.ndarray,        # [B, C, N] uint32 < t: random mask r
    relin_key: RelinKey,
    ps_low_degree: int,
    result_level: int,
    max_degree: int,
    eval_level: Optional[int] = None,
) -> Ciphertext:
    """Paterson–Stockmeyer evaluation (reference ``eval_patstock``,
    bin_bundle.cpp:192-360): M(x) = Σ_k x^{k(ℓ+1)}·I_k(x) with inner sums as
    ct⊙pt dot products in NTT domain and ONE batched BEHZ tensor product per
    (bundle, cache, k) — all outer products accumulate 3-component and a
    single relinearization closes the sum.
    """
    lvl = eval_level or bfv.q.k
    rk_lvl = relin_key.level  # key generation level (≥ lvl)
    q = bfv.levels[lvl]
    ph = ps_low_degree + 1
    B, C = coeff_cache.shape[0], coeff_cache.shape[1]
    K = max_degree  # cache planes beyond K+1 are zero padding for Pallas
    nh = K // ph
    N = coeff_cache.shape[-1]
    ell = low_powers_ntt.shape[1]
    assert ell == ps_low_degree
    # every gather index k·ph + i (k ≤ nh, i ≤ ℓ) must land on a real plane
    # (zero-padded past K+1 by the DB build) — an out-of-range index would be
    # clipped onto the NONZERO leading-coefficient plane and silently corrupt
    # results whenever K % ph < ℓ (ADVICE round 1, medium)
    assert coeff_cache.shape[2] >= nh * ph + ell + 1, (
        f"coefficient cache has {coeff_cache.shape[2]} planes; PS gather "
        f"needs {nh * ph + ell + 1} (pad with zero planes in the DB build)"
    )

    # Row-chunked batched execution over the flattened (bundle, cache) axis:
    # each chunk runs the whole chain — inner sums, ONE batched BEHZ outer
    # product, k-sum, relinearize, mod-switch, mask — as a single fused
    # device program, replacing the former B·C Python-serialized dispatches
    # (24 at 16M scale) with ceil(B·C / row_chunk).  The chunk size bounds
    # peak HBM: one row's BEHZ working set is ~nh·3·(L_q+L_bsk)·N·4 bytes
    # times ~4 live copies (operand lifts in both bases + NTT temporaries),
    # ~1.3 GB at the 16M shape — and the coefficient cache itself already
    # holds several GB of the chip.
    rows = B * C
    Lb = bfv._mul_ctx(lvl)["bsk"].k
    # per-row peak: BEHZ working set (~4 live copies across q ∪ Bsk) plus
    # the row's cache slice (argument layout copies count double)
    behz_bytes_per_row = nh * 3 * (q.k + Lb) * N * 4 * 4
    cache_bytes = int(np.prod(coeff_cache.shape)) * 4
    cache_bytes_per_row = cache_bytes // rows
    # per-row operand gathers: pre-transformed rhs (q ∪ Bsk) + low powers
    fb_bytes_per_row = nh * 2 * (q.k + Lb) * N * 4 * 2
    low_bytes_per_row = ps_low_degree * 2 * q.k * N * 4 * 2
    row_bytes = (
        behz_bytes_per_row
        + 2 * cache_bytes_per_row
        + fb_bytes_per_row
        + low_bytes_per_row
    )
    budget = max(1 << 30, (10 << 30) - cache_bytes)
    row_chunk = int(max(1, min(rows, budget // max(1, row_bytes))))
    # BUNDLE-ALIGNED chunks (r5, from the profiler trace): per-row
    # jnp.take gathers of the per-bundle constants (low powers + the
    # pre-transformed fb in q ∪ Bsk) materialized GB-scale HBM copies
    # inside every chunk program (%copy/%slice DMA ~100 ms overlapped in
    # PROFILE_TRACE_16M.json).  When the chunk covers WHOLE bundles the
    # constants stay per-bundle and BROADCAST into the kernels instead —
    # same values, zero copies, bit-identical.  The aligned row budget
    # drops the gather terms, so chunks also get larger (fewer host
    # dispatches).
    row_bytes_aligned = (
        behz_bytes_per_row
        + 2 * cache_bytes_per_row
        + (fb_bytes_per_row + low_bytes_per_row) // max(1, C)
    )
    rc_a = int(max(1, min(rows, budget // max(1, row_bytes_aligned))))
    rc_a -= rc_a % C
    aligned = rc_a >= C
    if aligned:
        row_chunk = rc_a

    rbase = bfv.levels[result_level]

    # pre-transform the outer-product rhs ONCE per query: the high powers
    # are per-bundle constants, so their q/Bsk NTT forms amortize over all
    # row chunks (bfv.premul_sum_rhs)
    fbq, fbb = bfv.premul_sum_rhs(
        Ciphertext(high_powers_coeff, is_ntt=False, level=lvl), nh
    )

    def rows_impl(cache_r, const_r, mask_r, low_b, fbq_b, fbb_b, ksk,
                  cpb=1):
        # cpb: caches per bundle covered by this chunk.  cpb == 1 means
        # low_b/fbq_b/fbb_b arrive pre-gathered PER ROW (legacy unaligned
        # path); cpb == C means they stay PER BUNDLE ([R/cpb, ...]) and
        # broadcast into the kernels — same values, no gather copies.
        R = cache_r.shape[0]
        low_r = low_b if cpb == 1 else jnp.repeat(low_b, cpb, axis=0)
        # plane k·ph + i == [k, i] of a [(nh+1), ph] plane view: ph = ℓ+1
        # makes (nh+1)·ph == nh·ph + ℓ + 1 exactly, so the PS gather is a
        # contiguous reshape + one dynamic index (a jnp.take gather here
        # materialized GB-scale temps at the 16M shape)
        cache5 = cache_r[:, : (nh + 1) * ph].reshape(
            (R, nh + 1, ph) + cache_r.shape[2:]
        )

        import os as _os

        _inner_kind = _os.environ.get("APSU_PS_INNER", "pallas3")
        if _inner_kind == "pallas3" and _use_pallas(bfv, lvl):
            # carry-free 14-bit-split kernel (ops/polyeval.py v3): ~10 VPU
            # ops/term vs v2's ~18 — bit-identical (same fold points;
            # verified on chip at the 16M shape incl. the p-1 edge).
            # DEFAULT since r5: same-process full-query A/B on chip
            # 2026-08-20 measured 159.9 ms vs 201.2 ms warm (+25.8%).
            from apsu_tpu.ops.polyeval import eval_ps_inner_pallas3

            consts = np.stack(
                [np.asarray(q.p_d).ravel(), np.asarray(q.pni_d).ravel()]
            )
            nseg = cache_r.shape[1] // ph
            cache5p = cache_r[:, : nseg * ph].reshape(
                (R, nseg, ph) + cache_r.shape[2:]
            )
            acc = eval_ps_inner_pallas3(
                low_b, cache5p, consts[0], consts[1], cpb,
                interpret=_pallas_interpret(),
            )[:, : nh + 1]
        elif _inner_kind == "pallas2" and _use_pallas(bfv, lvl):
            # row-resident segmented kernel (ops/polyeval.py v2): the
            # accumulator + lazy scratch live in VMEM across the whole
            # plane sweep, the cache streams exactly once, each power
            # plane loads once per row.  Bit-identical (same Montgomery
            # fold points as v1); DEFAULT — the measured winner in
            # tools/eval_substage_bench.py on v5e at the 16M shape
            # (inner_p2 65.7 ms vs XLA fori 91.6 ms vs v1 95.5 ms).
            from apsu_tpu.ops.polyeval import eval_ps_inner_pallas2

            consts = np.stack(
                [np.asarray(q.p_d).ravel(), np.asarray(q.pni_d).ravel()]
            )
            nseg = cache_r.shape[1] // ph
            cache5p = cache_r[:, : nseg * ph].reshape(
                (R, nseg, ph) + cache_r.shape[2:]
            )
            acc = eval_ps_inner_pallas2(
                low_b, cache5p, consts[0], consts[1], cpb,
                interpret=_pallas_interpret(),
            )[:, : nh + 1]
        elif _inner_kind == "pallas" and _use_pallas(bfv, lvl):
            # segmented Pallas kernel (ops/polyeval.py) — bit-identical to
            # the fori_loop (same Montgomery multiply-add order) but OPT-IN:
            # at the 16M shape it measured ~2.4× slower than the XLA loop
            # (the inner sum is HBM-streaming-bound and XLA's fusion already
            # saturates it; the segmented grid re-reads the power block per
            # k-chunk).  Use ALL build-aligned segments so the kernel's
            # SEG_CHUNK padding is a no-op (plane_count aligns the cache);
            # extra segments are zero planes and are sliced off.
            from apsu_tpu.ops.polyeval import eval_ps_inner_pallas

            consts = np.stack(
                [np.asarray(q.p_d).ravel(), np.asarray(q.pni_d).ravel()]
            )
            nseg = cache_r.shape[1] // ph
            cache5p = cache_r[:, : nseg * ph].reshape(
                (R, nseg, ph) + cache_r.shape[2:]
            )
            acc = eval_ps_inner_pallas(
                low_b, cache5p, consts[0], consts[1], cpb,
                interpret=_pallas_interpret(),
            )[:, : nh + 1]
        else:

            # i-chunked dot product: the accumulator [R, nh+1, 2, L, N] is
            # ~1.1 GB at the 16M shape, and a 1-term-per-iteration fori_loop
            # re-reads + re-writes it every one of ℓ=44 steps (~97 GB of HBM
            # traffic — measured as the dominant eval substage).  Summing CH
            # terms per iteration cuts that traffic ×CH; modular adds are
            # exact, so the reassociation is bit-identical.
            CH = min(11, ell)
            nch = ell // CH

            def body(ci, acc):
                i0 = ci * CH
                pw = jax.lax.dynamic_slice_in_dim(low_r, i0, CH, axis=1)
                pt = jax.lax.dynamic_slice_in_dim(cache5, i0 + 1, CH, axis=2)
                part = None
                for u in range(CH):
                    term = mont_mul(
                        pw[:, u, None, :, :, :],
                        pt[:, :, u, None, :, :],
                        q.p_d,
                        q.pni_d,
                    )  # [R, nh+1, 2, L, N]
                    part = term if part is None else add_mod(part, term, q.p_d)
                return add_mod(acc, part, q.p_d)

            acc = jax.lax.fori_loop(
                0, nch, body, jnp.zeros((R, nh + 1, 2, q.k, N), jnp.uint32)
            )

            def tail(i, acc):
                pw = jax.lax.dynamic_index_in_dim(
                    low_r, i - 1, axis=1, keepdims=False
                )
                pt = jax.lax.dynamic_index_in_dim(
                    cache5, i, axis=2, keepdims=False
                )
                term = mont_mul(
                    pw[:, None, :, :, :], pt[:, :, None, :, :], q.p_d, q.pni_d
                )
                return add_mod(acc, term, q.p_d)

            acc = jax.lax.fori_loop(nch * CH + 1, ell + 1, tail, acc)
        inner_c = q.from_mont(q.ntt.intt(acc))      # coeff plain
        dm = bfv._scale_impl(const_r, lvl)          # [R, nh+1, L, N]
        c0 = add_mod(inner_c[..., 0, :, :], dm, q.p_d)
        inner = inner_c.at[..., 0, :, :].set(c0)    # [R, nh+1, 2, L, N]

        # lazy BEHZ with both operand transforms amortized: the lhs's
        # q-NTT form is the inner accumulator itself (NTT is linear, so
        # adding NTT(mont(dm)) to component 0 equals re-transforming
        # inner), and the rhs arrives pre-transformed — ONE scale-down
        # for the whole Σ_k I_k·y^k (bfv.multiply_sum_fused)
        dm_ntt = q.ntt.ntt(q.to_mont(dm[:, 1:]))    # [R, nh, L, N]
        fa_q = acc[:, 1:].at[:, :, 0].set(
            add_mod(acc[:, 1:, 0], dm_ntt, q.p_d)
        )
        if cpb == 1:
            tot = bfv.multiply_sum_fused(
                fa_q, inner[:, 1:], fbq_b, fbb_b, lvl, nh
            )                                       # [R, 3, L, N]
        else:
            # per-bundle rhs broadcasts against bundle-blocked lhs rows —
            # identical products to the gathered path, zero copies
            nb = R // cpb
            blk = lambda x: x.reshape((nb, cpb) + x.shape[1:])
            tot = bfv.multiply_sum_fused(
                blk(fa_q), blk(inner[:, 1:]), fbq_b[:, None], fbb_b[:, None],
                lvl, nh,
            ).reshape((R, 3, q.k, N))
        tot = tot.at[:, :2].set(add_mod(tot[:, :2], inner[:, 0], q.p_d))
        rel = bfv.relinearize(
            Ciphertext(tot, is_ntt=False, level=lvl), RelinKey(ksk, rk_lvl)
        )
        sw = bfv.mod_switch_to(rel, result_level)   # [R, 2, Lr, N]
        dm2 = bfv._scale_impl(bfv.encode(mask_r), result_level)
        return sw.data.at[:, 0].set(add_mod(sw.data[:, 0], dm2, rbase.p_d))

    # Chunk dispatch with ALL slicing inside jit: each chunk program takes
    # the full device-resident tensors plus a traced row offset and
    # dynamic-slices its rows — the former eager row reshape copied the
    # multi-GB cache and each eager slice/take paid a separate dispatch
    # (~11 ms over a remote tunnel, 6 operands × n_chunks calls).  At most
    # two program shapes compile (full chunk + remainder).
    def chunk_impl(size):
        def impl(cache_full, const_full, mask_full, low_full, fbq_full,
                 fbb_full, ksk, r0):
            cache_rows = cache_full.reshape((rows,) + cache_full.shape[2:])
            const_rows = const_full.reshape((rows,) + const_full.shape[2:])
            cache_r = jax.lax.dynamic_slice_in_dim(cache_rows, r0, size, axis=0)
            const_r = jax.lax.dynamic_slice_in_dim(const_rows, r0, size, axis=0)
            mask_r = jax.lax.dynamic_slice_in_dim(
                mask_full.reshape(rows, N), r0, size, axis=0
            )
            if aligned:
                # whole-bundle chunk: slice the per-bundle constants and
                # let them broadcast (no per-row gather copies)
                b0 = r0 // C
                nb = size // C
                return rows_impl(
                    cache_r,
                    const_r,
                    mask_r,
                    jax.lax.dynamic_slice_in_dim(low_full, b0, nb, axis=0),
                    jax.lax.dynamic_slice_in_dim(fbq_full, b0, nb, axis=0),
                    jax.lax.dynamic_slice_in_dim(fbb_full, b0, nb, axis=0),
                    ksk,
                    cpb=C,
                )
            bo = (r0 + jnp.arange(size, dtype=jnp.int32)) // C
            return rows_impl(
                cache_r,
                const_r,
                mask_r,
                jnp.take(low_full, bo, axis=0),
                jnp.take(fbq_full, bo, axis=0),
                jnp.take(fbb_full, bo, axis=0),
                ksk,
            )

        impl.__name__ = "ps_eval_rows"  # named XLA module (profiler)
        return impl

    import os as _os

    out = []
    for r0 in range(0, rows, row_chunk):
        size = min(rows, r0 + row_chunk) - r0
        fn = bfv._jitted(
            ("ps_rows", size, ps_low_degree, nh, lvl, result_level, rk_lvl,
             aligned, _os.environ.get("APSU_PS_INNER", "pallas3")),
            chunk_impl(size),
        )
        out.append(
            fn(
                coeff_cache,
                const_polys,
                mask_slots,
                low_powers_ntt,
                fbq,
                fbb,
                relin_key.ksk,
                np.int32(r0),
            )
        )
    data = jnp.concatenate(out).reshape(B, C, 2, rbase.k, N)
    return Ciphertext(data, is_ntt=False, level=result_level)
