"""Multi-chip sharded query runtime — the FULL production path.

Scales the DB party across a ``jax.sharding.Mesh`` along the protocol's two
native work axes (SURVEY §2.7 P2/P3 → C4), matching the reference's
parallel structure (receiver_osn.cpp:320-359: per-bundle power computation,
per-(bundle, cache) BinBundle evaluation fanned out to threads — here to
chips):

* **Eval stage** (non-PS and Paterson-Stockmeyer): the coefficient cache
  [B, C, planes, L, N] flattens to rows on the (bundle × cache) product axis
  and shards; each chip evaluates its rows with the SAME kernels as the
  single-device evaluator — the Pallas lazy-reduction dot product on TPU
  (ops/polyeval.py) under ``shard_map``, the fori_loop fallback elsewhere.
  Results stay sharded until one all-gather at the end (a concat, not a
  reduction — SURVEY §5).
* **Power wavefront**: each schedule level is one batched BEHZ multiply +
  relinearize over the level's (target × bundle) products, sharded on that
  flattened product axis (the reference's PowersDag parallel_apply, P4).

Every sharded op is element-for-element the single-device computation
(modular arithmetic is exact, addition order preserved), so results are
bit-identical to ``Receiver.run_query`` — asserted by tests/test_sharded.py
and the driver's ``dryrun_multichip``.

On the single-chip dev box this runs under a virtual CPU mesh
(xla_force_host_platform_device_count); the same code drives real v5p/v5e
slices — XLA inserts the ICI collectives.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax >= 0.4.35 moved shard_map to the top level
    from jax import shard_map as _shard_map_mod  # type: ignore

    shard_map = _shard_map_mod.shard_map if hasattr(_shard_map_mod, "shard_map") else _shard_map_mod
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from apsu_tpu.api.parties import QueryRequest, QueryResponse, Receiver
from apsu_tpu.core.bfv import BfvContext, Ciphertext, RelinKey
from apsu_tpu.core.mod32 import add_mod, mont_mul
from apsu_tpu.db.receiver_db import ReceiverDB
from apsu_tpu.engine.powers import PowerSchedule
from apsu_tpu.ops.polyeval import DEG_CHUNK, eval_dot_pallas


def _use_pallas_shard(bfv: BfvContext, level: int) -> bool:
    import os

    if jax.default_backend() == "cpu" and not os.environ.get("APSU_PALLAS_INTERPRET"):
        return False
    return all(p < (1 << 28) for p in bfv.levels[level].primes)


class ShardedEvaluator:
    """Shards a built ReceiverDB's cache over a mesh and evaluates queries.

    The cache [B, C, planes, L, N] is reshaped to [B·C, planes, L, N] and
    sharded on axis 0 (rows padded with zero caches to a device multiple —
    zero polynomials never match and are dropped after the gather).  Both
    query paths are covered; PS configs additionally shard the chunk-constant
    polynomials the same way.
    """

    def __init__(self, db: ReceiverDB, mesh: Mesh, axis: str = "bundle"):
        self.db = db
        self.bfv: BfvContext = db.bfv
        self.mesh = mesh
        self.axis = axis
        B, C = db.coeff_cache.shape[0], db.coeff_cache.shape[1]
        self.B, self.C = B, C
        n_dev = mesh.devices.size
        self.n_dev = n_dev
        pad = (-(B * C)) % n_dev
        self.pad = pad
        self.rows = B * C + pad

        shard = NamedSharding(mesh, P(axis))
        flat = db.coeff_cache.reshape((B * C,) + db.coeff_cache.shape[2:])
        if pad:
            flat = jnp.concatenate(
                [flat, jnp.zeros((pad,) + flat.shape[1:], flat.dtype)]
            )
        self.cache = jax.device_put(flat, shard)          # [rows, planes, L, N]

        self.uses_ps = db.ps_const_polys is not None
        if self.uses_ps:
            pc = db.ps_const_polys.reshape((B * C,) + db.ps_const_polys.shape[2:])
            if pad:
                pc = jnp.concatenate(
                    [pc, jnp.zeros((pad,) + pc.shape[1:], pc.dtype)]
                )
            self.ps_consts = jax.device_put(pc, shard)    # [rows, nh+1, N]
            self.const_slots = None
        else:
            consts = db.const_slots.reshape(B * C, -1)
            if pad:
                consts = jnp.concatenate(
                    [consts, jnp.zeros((pad, consts.shape[1]), consts.dtype)]
                )
            self.const_slots = jax.device_put(consts, shard)  # [rows, N]
            self.ps_consts = None
        self.repl = NamedSharding(mesh, P())

    # ------------------------------------------------------------------
    # power wavefront (reference ComputePowers / PowersDag parallel_apply)
    # ------------------------------------------------------------------
    # Both power paths DELEGATE to the fused single-device programs
    # (engine/evaluator.compute_power_tensor / compute_ps_power_tensors)
    # with ``shard=(mesh, axis)``: the WHOLE wavefront — operand-form
    # dedup, merged low+high schedule, chunked BEHZ products,
    # relinearizations, deferred-terminal assembly, final mod-switch+NTT —
    # compiles to ONE shard_map program whose per-row stages distribute
    # over the mesh and all-gather between DAG levels.  The former
    # per-level eager dispatch loop (jit call + device_put resharding per
    # level) cost +112% at 1 device (SHARDED_OVERHEAD.json, r4); one fused
    # program pays one dispatch, like the direct path.  Bit-identical
    # (engine/evaluator._make_rowmap).

    def compute_power_tensor(
        self,
        source_cts: Dict[int, Ciphertext],
        schedule: PowerSchedule,
        relin_key: Optional[RelinKey],
        eval_level: int,
        at_eval: bool = False,
    ) -> jnp.ndarray:
        """Sharded analogue of engine.evaluator.compute_power_tensor."""
        from apsu_tpu.engine.evaluator import compute_power_tensor

        return compute_power_tensor(
            self.bfv, source_cts, schedule, relin_key, eval_level,
            at_eval=at_eval, shard=(self.mesh, self.axis),
        )

    def compute_ps_power_tensors(
        self, source_cts, plan, relin_key, eval_level, at_eval: bool = False,
        defer_relin: bool = False, batch_first: bool = False,
    ):
        """Sharded analogue of engine.evaluator.compute_ps_power_tensors."""
        from apsu_tpu.engine.evaluator import compute_ps_power_tensors

        return compute_ps_power_tensors(
            self.bfv, source_cts, plan, relin_key, eval_level=eval_level,
            at_eval=at_eval, defer_relin=defer_relin,
            batch_first=batch_first, shard=(self.mesh, self.axis),
        )

    # ------------------------------------------------------------------
    # eval stage, non-PS
    # ------------------------------------------------------------------
    def eval_query(self, powers_ntt, mask_slots, eval_level: int) -> jnp.ndarray:
        """powers_ntt: [B, D, 2, Le, N] replicated; mask_slots [B, C, N].
        Returns result ct data [B, C, 2, Le, N] (gathered)."""
        base = self.bfv.levels[eval_level]
        bfv = self.bfv
        B, C, pad, rows = self.B, self.C, self.pad, self.rows
        t = np.uint32(bfv.t)
        Dp = self.cache.shape[1]
        D = powers_ntt.shape[1]
        N = self.cache.shape[-1]
        R = rows // self.n_dev  # rows per shard
        use_pallas = _use_pallas_shard(bfv, eval_level)
        consts = np.stack(
            [np.asarray(base.p_d).ravel(), np.asarray(base.pni_d).ravel()]
        )

        import os

        interp = jax.default_backend() == "cpu" and bool(
            os.environ.get("APSU_PALLAS_INTERPRET")
        )

        def per_shard(cache_rows, const_rows, mask_rows, pw_full):
            # global row ids of this shard -> bundle index per row
            shard_i = jax.lax.axis_index(self.axis)
            row0 = shard_i * R
            bundle_of = ((row0 + jnp.arange(R, dtype=jnp.int32)) // C).clip(0, B - 1)
            pw_rows = pw_full[bundle_of]  # [R, Dp, 2, L, N]
            if use_pallas:
                acc = eval_dot_pallas(
                    pw_rows, cache_rows[:, None], consts[0], consts[1],
                    interpret=interp,
                )[:, 0]  # [R, 2, L, N]
            else:
                def body(j, acc):
                    a = jax.lax.dynamic_index_in_dim(pw_rows, j, axis=1, keepdims=False)
                    b = jax.lax.dynamic_index_in_dim(cache_rows, j, axis=1, keepdims=False)
                    return add_mod(
                        acc, mont_mul(a, b[:, None], base.p_d, base.pni_d), base.p_d
                    )

                acc = jax.lax.fori_loop(
                    0, Dp, body, jnp.zeros((R, 2, base.k, N), jnp.uint32)
                )
            acc = base.from_mont(base.ntt.intt(acc))
            cms = add_mod(const_rows, mask_rows, t)
            dm = bfv._scale_impl(bfv.encode(cms), eval_level)
            return acc.at[:, 0].set(add_mod(acc[:, 0], dm, base.p_d))

        def impl(cache, consts_s, mask, powers):
            # align powers with the cache's plane layout (plane 0 + pad zero)
            pw = jnp.concatenate(
                [
                    jnp.zeros((B, 1, 2, base.k, N), jnp.uint32),
                    powers,
                    jnp.zeros((B, Dp - D - 1, 2, base.k, N), jnp.uint32),
                ],
                axis=1,
            )
            maskf = mask.reshape(B * C, -1)
            if pad:
                maskf = jnp.concatenate(
                    [maskf, jnp.zeros((pad, maskf.shape[1]), maskf.dtype)]
                )
            rows_out = shard_map(
                per_shard,
                mesh=self.mesh,
                in_specs=(P(self.axis), P(self.axis), P(self.axis), P()),
                out_specs=P(self.axis),
                check_vma=False,
            )(cache, consts_s, maskf, pw)
            return rows_out[: B * C].reshape(B, C, 2, base.k, N)

        f = self.bfv._jitted(
            ("sharded_eval", eval_level, id(self.mesh), use_pallas),
            jax.jit(impl, out_shardings=self.repl),
        )
        with self.mesh:
            return f(self.cache, self.const_slots, mask_slots, powers_ntt)

    # ------------------------------------------------------------------
    # eval stage, Paterson-Stockmeyer
    # ------------------------------------------------------------------
    def eval_query_ps(
        self,
        low_powers_ntt,      # [B, ℓ, 2, L, N] NTT mont, replicated
        high_powers_coeff,   # [B, nh, 2, L, N] coeff plain, replicated
        mask_slots,          # [B, C, N]
        relin_key: RelinKey,
        ps_low_degree: int,
        result_level: int,
        max_degree: int,
        eval_level: int,
    ) -> jnp.ndarray:
        """Sharded PS evaluation over the flattened (bundle × cache) rows:
        inner dot products, batched BEHZ outer products, k-sum, one
        relinearization, mod-switch, mask — all shard-local, one gather.
        Mirrors engine.evaluator.eval_matching_polys_ps element-for-element.
        """
        bfv = self.bfv
        lvl = eval_level
        rk_lvl = relin_key.level  # key generation level (≥ lvl)
        q = bfv.levels[lvl]
        ph = ps_low_degree + 1
        B, C, pad = self.B, self.C, self.pad
        K = max_degree
        nh = K // ph
        N = self.cache.shape[-1]
        ell = low_powers_ntt.shape[1]
        assert ell == ps_low_degree
        assert self.cache.shape[1] >= nh * ph + ell + 1
        R = self.rows // self.n_dev
        shard = NamedSharding(self.mesh, P(self.axis))

        import os

        # PS inner kernel choice mirrors the single-chip evaluator
        # (eval_matching_polys_ps): row-resident pallas2 is the measured
        # default on TPU, pallas3/pallas opt-in, XLA fori elsewhere
        inner_kind = os.environ.get("APSU_PS_INNER", "pallas3")
        use_pallas = (
            inner_kind in ("pallas", "pallas2", "pallas3")
            and _use_pallas_shard(bfv, lvl)
        )
        consts = np.stack([np.asarray(q.p_d).ravel(), np.asarray(q.pni_d).ravel()])

        interp = jax.default_backend() == "cpu" and bool(
            os.environ.get("APSU_PALLAS_INTERPRET")
        )

        # rhs pre-transform once (replicated; per-bundle constants)
        fbq, fbb = bfv.premul_sum_rhs(
            Ciphertext(high_powers_coeff, is_ntt=False, level=lvl), nh
        )

        def per_shard(cache_rows, const_rows, mask_rows, low_full, fbq_full,
                      fbb_full, ksk):
            shard_i = jax.lax.axis_index(self.axis)
            row0 = shard_i * R
            bundle_of = ((row0 + jnp.arange(R, dtype=jnp.int32)) // C).clip(0, B - 1)
            low_rows = low_full[bundle_of]    # [R, ℓ, 2, L, N]
            fbq_rows = fbq_full[bundle_of]    # [R, nh, 2, Lq, N]
            fbb_rows = fbb_full[bundle_of]    # [R, nh, 2, Lb, N]

            # plane k·ph + i == [k, i] of a [(nh+1), ph] plane view (ph=ℓ+1
            # makes the counts line up exactly) — a contiguous reshape +
            # dynamic index instead of a temp-heavy gather
            cache5 = cache_rows[:, : (nh + 1) * ph].reshape(
                (cache_rows.shape[0], nh + 1, ph) + cache_rows.shape[2:]
            )

            if use_pallas:
                # same segmented Pallas kernels as the single-chip
                # evaluator — bit-identical to the fori_loop (same
                # multiply-add order / fold points); build-aligned
                # segments keep the kernel pad a no-op
                from apsu_tpu.ops.polyeval import (
                    eval_ps_inner_pallas,
                    eval_ps_inner_pallas2,
                    eval_ps_inner_pallas3,
                )

                inner_fn = {
                    "pallas": eval_ps_inner_pallas,
                    "pallas2": eval_ps_inner_pallas2,
                    "pallas3": eval_ps_inner_pallas3,
                }[inner_kind]
                nseg = cache_rows.shape[1] // ph
                cache5p = cache_rows[:, : nseg * ph].reshape(
                    (cache_rows.shape[0], nseg, ph) + cache_rows.shape[2:]
                )
                acc = inner_fn(
                    low_rows, cache5p, consts[0], consts[1], 1,
                    interpret=interp,
                )[:, : nh + 1]
            else:

                def body(i, acc):
                    pw = jax.lax.dynamic_index_in_dim(
                        low_rows, i - 1, axis=1, keepdims=False
                    )
                    pt = jax.lax.dynamic_index_in_dim(
                        cache5, i, axis=2, keepdims=False
                    )  # [R, nh+1, L, N]
                    term = mont_mul(
                        pw[:, None, :, :, :], pt[:, :, None, :, :], q.p_d, q.pni_d
                    )  # [R, nh+1, 2, L, N]
                    return add_mod(acc, term, q.p_d)

                acc = jax.lax.fori_loop(
                    1, ell + 1, body,
                    jnp.zeros((R, nh + 1, 2, q.k, N), jnp.uint32),
                )
            inner_c = q.from_mont(q.ntt.intt(acc))      # coeff plain
            dm = bfv._scale_impl(const_rows, lvl)       # [R, nh+1, L, N]
            c0 = add_mod(inner_c[..., 0, :, :], dm, q.p_d)
            inner = inner_c.at[..., 0, :, :].set(c0)    # [R, nh+1, 2, L, N]

            # fused lazy BEHZ — mirrors the single-chip evaluator exactly
            # (bit-identity requirement): lhs q-NTT form is the inner
            # accumulator + NTT(mont(dm)) on component 0, rhs pre-transformed
            dm_ntt = q.ntt.ntt(q.to_mont(dm[:, 1:]))    # [R, nh, L, N]
            fa_q = acc[:, 1:].at[:, :, 0].set(
                add_mod(acc[:, 1:, 0], dm_ntt, q.p_d)
            )
            tot = bfv.multiply_sum_fused(
                fa_q, inner[:, 1:], fbq_rows, fbb_rows, lvl, nh
            )                                           # [R, 3, L, N]
            tot = tot.at[:, :2].set(add_mod(tot[:, :2], inner[:, 0], q.p_d))
            rel = bfv.relinearize(
                Ciphertext(tot, is_ntt=False, level=lvl), RelinKey(ksk, rk_lvl)
            )
            sw = bfv.mod_switch_to(rel, result_level)   # [R, 2, Lr, N]
            rbase = bfv.levels[result_level]
            dm2 = bfv._scale_impl(bfv.encode(mask_rows), result_level)
            out = sw.data.at[:, 0].set(add_mod(sw.data[:, 0], dm2, rbase.p_d))
            return out

        def impl(cache, consts_s, mask, low_full, fbq_full, fbb_full, ksk):
            maskf = mask.reshape(B * C, -1)
            if pad:
                maskf = jnp.concatenate(
                    [maskf, jnp.zeros((pad, maskf.shape[1]), maskf.dtype)]
                )
            rows_out = shard_map(
                per_shard,
                mesh=self.mesh,
                in_specs=(P(self.axis), P(self.axis), P(self.axis), P(), P(),
                          P(), P()),
                out_specs=P(self.axis),
                check_vma=False,
            )(cache, consts_s, maskf, low_full, fbq_full, fbb_full, ksk)
            rbase = bfv.levels[result_level]
            return rows_out[: B * C].reshape(B, C, 2, rbase.k, N)

        f = self.bfv._jitted(
            ("sharded_eval_ps", lvl, result_level, rk_lvl, id(self.mesh), nh,
             ell, use_pallas, inner_kind),
            jax.jit(impl, out_shardings=self.repl),
        )
        with self.mesh:
            return f(
                self.cache,
                self.ps_consts,
                mask_slots,
                low_powers_ntt,
                fbq,
                fbb,
                relin_key.ksk,
            )


class ShardedReceiver(Receiver):
    """DB party whose full query path runs sharded over a mesh — the
    drop-in multi-chip Receiver (same wire behavior, bit-identical
    responses)."""

    def __init__(self, params, db: ReceiverDB, mesh: Mesh, rng=None):
        super().__init__(params, db, rng=rng)
        self.evaluator = ShardedEvaluator(db, mesh)

    def run_query(self, req: QueryRequest) -> QueryResponse:
        p = self.params
        ql = self.query_lvl
        self.validate_query(req)
        cts = {
            s: Ciphertext(req.powers_data[i], is_ntt=False, level=ql)
            for i, s in enumerate(req.power_list)
        }
        rk = (
            RelinKey(jnp.asarray(req.relin_key), ql)
            if req.relin_key is not None
            else None
        )
        B, C = self.db.coeff_cache.shape[0], self.db.coeff_cache.shape[1]
        N = p.poly_degree
        t = p.seal_params.plain_modulus
        mask = self.rng.integers(0, t, size=(B, C, N), dtype=np.uint64).astype(
            np.uint32
        )
        self.last_mask = mask
        ev = self.evaluator
        from apsu_tpu.db.measured_levels import defer_relin, powers_at_eval

        at_eval = powers_at_eval(p)
        defer = defer_relin(p)
        if self.plan.uses_ps:
            low_ntt, high_coeff = ev.compute_ps_power_tensors(
                cts, self.plan, rk, self.db.eval_lvl, at_eval=at_eval,
                defer_relin=defer, batch_first=True,
            )
            res = ev.eval_query_ps(
                low_ntt,
                high_coeff,
                jnp.asarray(mask),
                rk,
                p.query_params.ps_low_degree,
                self.db.result_lvl,
                p.table_params.max_items_per_bin,
                self.db.eval_lvl,
            )
            return QueryResponse(results=res, eval_level=self.db.result_lvl)

        powers = ev.compute_power_tensor(cts, self.plan.low, rk, self.db.eval_lvl)
        res = ev.eval_query(
            jnp.moveaxis(powers, 0, 1), jnp.asarray(mask), self.db.eval_lvl
        )
        return QueryResponse(results=res, eval_level=self.db.eval_lvl)
