"""Sender / Receiver party objects (reference naming — see SURVEY §0:
*Sender* holds the SMALL set and ultimately transfers its non-matching items;
*Receiver* holds the LARGE preprocessed DB and evaluates homomorphically).

Mirrors the lifecycle of /root/reference/sender/apsu/sender_osn.cpp
(create_query :318-496, result decryption :642-708) and
/root/reference/receiver/apsu/receiver_osn.cpp (RunQuery :140-540), with the
PEQT/OT endgame pluggable (debug comparator or real MPC backends).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from apsu_tpu.core.bfv import BfvContext, Ciphertext, RelinKey
from apsu_tpu.core.params import PSUParams
from apsu_tpu.db.receiver_db import ReceiverDB
from apsu_tpu.engine.evaluator import (
    compute_power_tensor,
    compute_ps_power_tensors,
    eval_matching_polys,
    eval_matching_polys_labeled,
    eval_matching_polys_ps,
)
from apsu_tpu.engine.powers import plan_query
from apsu_tpu.hash.cuckoo import CuckooTable, cuckoo_insert
from apsu_tpu.hash.encoding import felts_from_items
from apsu_tpu.hash.items import LocFuncs
from apsu_tpu.mpc.oprf import OprfBackend
from apsu_tpu.mpc.prg import CsRng


@dataclass
class QueryRequest:
    """Wire content of rop_query (reference rop.fbs:15-24): ciphertext batches
    for every source power + relinearization keys.

    Data stays a single device/jnp array — D2H transfers over the TPU tunnel
    cost ~0.5 s each irrespective of size, so the in-process path never pulls
    to host; the network layer serializes with exactly one transfer.
    """

    power_list: Tuple[int, ...]          # sorted source powers
    powers_data: jnp.ndarray             # [P, B, 2, L, N] ct data per power
    relin_key: Optional[jnp.ndarray]     # [kdig, 2, Lqp, N] NTT mont or None
    # seed-compression (seal_object.h Serializable semantics): the uniform
    # components above expand deterministically from these public seeds, so
    # the wire carries only c0 / ksk[:, 0] plus 32 bytes each
    a_seed: Optional[bytes] = None
    rk_seed: Optional[bytes] = None


@dataclass
class QueryResponse:
    """All result packages of one query, batched (reference streams one
    ResultPackage per (bundle_idx, cache) — result_package.h:42-69)."""

    results: np.ndarray                  # [B, C, 2, Le, N] coeff-domain ct
    eval_level: int
    label_results: Optional[np.ndarray] = None  # labeled mode only


class Sender:
    """Query side (small set)."""

    def __init__(
        self,
        params: PSUParams,
        oprf: Optional[OprfBackend],
        rng=None,
        loc_seed: bytes = b"apsu-loc",
        oprf_factory=None,
    ):
        """oprf_factory(cuckoo_table_items) -> OprfBackend: late-bound OPRF
        construction for interactive backends (KKRT binds the query party's
        cuckoo table at setup; reference sender_osn.cpp:428).

        rng sources ALL party secrets (BFV secret key, encryption noise, OT
        state); defaults to an OS-entropy AES-CTR CsRng.  Pass a fixed-key
        CsRng (or a numpy Generator) only for deterministic tests."""
        from apsu_tpu.db.measured_levels import query_level

        self.params = params
        self.oprf = oprf
        self.oprf_factory = oprf_factory
        self.bfv = BfvContext(params.seal_params)
        self.rng = rng if rng is not None else CsRng()
        self.sk = self.bfv.gen_secret_key(self.rng)
        # fresh-query encryption level: full chain unless a measured
        # "query" override sheds limbs (both parties derive the same value
        # from the shared parameter content)
        self.query_lvl = query_level(params, len(self.bfv.q_primes))
        needs_relin = bool(
            plan_query(
                params.query_params.query_powers,
                params.table_params.max_items_per_bin,
                params.query_params.ps_low_degree,
            ).low.levels
        ) or params.query_params.ps_low_degree > 0
        self.rk_seed = bytes(self.rng.bytes(32)) if needs_relin else None
        self.rk = (
            self.bfv.gen_relin_key(
                self.sk, self.rng, a_seed=self.rk_seed, level=self.query_lvl
            )
            if needs_relin
            else None
        )
        self.locs = LocFuncs(
            params.table_params.table_size, params.table_params.hash_func_count, loc_seed
        )
        self.cuckoo: Optional[CuckooTable] = None
        self._items: Optional[np.ndarray] = None

    def create_query(self, items: np.ndarray) -> QueryRequest:
        """items: [n, 2] uint64 hashed items -> encrypted query powers."""
        p = self.params
        tp = p.table_params
        self._items = items
        self.cuckoo = cuckoo_insert(
            items, tp.table_size, tp.hash_func_count, locs=self.locs
        )
        if self.oprf_factory is not None:
            self.oprf = self.oprf_factory(self.cuckoo.table)
        slots = np.arange(tp.table_size, dtype=np.int64)
        prf = self.oprf.eval(self.cuckoo.table, slots)
        felts = felts_from_items(
            prf, p.felts_per_item, p.item_bit_count_per_felt
        )  # [table_size, fpi]
        self._query_felts = felts

        # slot vector per bundle index: lane (s % ipb)·fpi + f = felt f of slot s
        B, N, ipb, fpi = p.bundle_idx_count, p.poly_degree, p.items_per_bundle, p.felts_per_item
        qvec = np.zeros((B, N), dtype=np.uint32)
        b = slots // ipb
        lane = (slots % ipb) * fpi
        for f in range(fpi):
            qvec[b, lane + f] = felts[:, f]

        # plaintext powers of the query vector, batch-encoded and encrypted in
        # ONE device call over a [P, B, N] stack (reference computes these
        # per-power on threads: PlaintextPowers, sender_osn.cpp:466-484)
        t = p.seal_params.plain_modulus
        plist = tuple(p.query_params.query_powers)
        stack = np.stack(
            [
                _pow_mod(qvec.astype(np.uint64), s, t).astype(np.uint32)
                for s in plist
            ]
        )  # [P, B, N]
        pt = self.bfv.encode(stack)
        a_seed = bytes(self.rng.bytes(32))
        ct = self.bfv.encrypt_symmetric(
            pt, self.sk, self.rng, a_seed=a_seed, level=self.query_lvl
        )  # [P, B, 2, L, N]
        return QueryRequest(
            power_list=plist,
            powers_data=ct.data,
            relin_key=self.rk.ksk if self.rk else None,
            a_seed=a_seed,
            rk_seed=self.rk_seed,
        )

    def extract_matrix(self, resp: QueryResponse) -> np.ndarray:
        """Decrypt result packages -> slot-value matrix [B, C, N] mod t.

        Fully device-resident (BEHZ {t,γ} scale-and-round + decode); one
        transfer at the end."""
        ct = Ciphertext(jnp.asarray(resp.results), is_ntt=False, level=resp.eval_level)
        polys = self.bfv.decrypt_device(ct, self.sk)   # [B, C, N] on device
        return jax.device_get(self.bfv.decode(polys))

    def peqt_matrix(self, slot_matrix: np.ndarray) -> np.ndarray:
        """[B, C, N] -> per-item felt blocks [C, table_size, fpi]."""
        return _slots_to_item_blocks(self.params, slot_matrix)

    def extract_labels(self, resp: QueryResponse) -> np.ndarray:
        """Labeled mode: decrypt the label results -> per-slot 16-byte label
        candidates [C, table_size, 16] uint8.  Row (c, slot) holds the TRUE
        label exactly where that cache's matching result equals the mask
        (elsewhere ρ·M(x) blinding makes it garbage)."""
        from apsu_tpu.hash.encoding import items_from_felts

        if resp.label_results is None:
            raise ValueError("response carries no label results")
        ct = Ciphertext(
            jnp.asarray(resp.label_results), is_ntt=False, level=resp.eval_level
        )
        polys = self.bfv.decrypt_device(ct, self.sk)
        slot_matrix = jax.device_get(self.bfv.decode(polys))      # [B, C, N]
        blocks = _slots_to_item_blocks(self.params, slot_matrix)  # [C, S, fpi]
        C, S, fpi = blocks.shape
        items = items_from_felts(
            blocks.reshape(C * S, fpi).astype(np.uint32),
            self.params.item_bit_count_per_felt,
        )
        return items.view(np.uint8).reshape(C, S, 16)


class Receiver:
    """DB side (large set)."""

    def __init__(self, params: PSUParams, db: ReceiverDB, rng=None):
        from apsu_tpu.db.measured_levels import query_level

        self.params = params
        self.db = db
        self.bfv = db.bfv
        self.rng = rng if rng is not None else CsRng()
        self.query_lvl = query_level(params, len(self.bfv.q_primes))
        self.plan = plan_query(
            params.query_params.query_powers,
            params.table_params.max_items_per_bin,
            params.query_params.ps_low_degree,
        )
        self.last_mask: Optional[np.ndarray] = None

    def validate_query(self, req: QueryRequest) -> None:
        """Request validation (the reference's Query ctor, query.cpp:30-128):
        source powers must match the parameter set, ciphertext batches must
        cover every bundle index, relin keys must be present iff needed."""
        p = self.params
        expected = tuple(p.query_params.query_powers)
        if tuple(req.power_list) != expected:
            raise ValueError(
                f"query powers {req.power_list} != parameter powers {expected}"
            )
        P, B = req.powers_data.shape[0], req.powers_data.shape[1]
        expected_B = self.db.coeff_cache.shape[0]  # local bundle partition
        if P != len(expected) or B != expected_B:
            raise ValueError(
                f"power tensor {req.powers_data.shape} inconsistent with "
                f"{len(expected)} powers × {expected_B} bundle indices"
            )
        if req.powers_data.shape[-1] != p.poly_degree:
            raise ValueError("ciphertext degree mismatch")
        if req.powers_data.shape[-2] != self.query_lvl:
            raise ValueError(
                f"query ciphertexts carry {req.powers_data.shape[-2]} limbs; "
                f"this parameter set encrypts at level {self.query_lvl}"
            )
        # PS always relinearizes its outer ct×ct products, even when the
        # query powers directly cover both domains (matches Sender.__init__)
        needs_relin = (
            bool(self.plan.low.levels)
            or (self.plan.high is not None and bool(self.plan.high.levels))
            or self.plan.uses_ps
        )
        if needs_relin and req.relin_key is None:
            raise ValueError("query requires relinearization keys")

    def run_query(
        self, req: QueryRequest, timings: Optional[dict] = None
    ) -> QueryResponse:
        """Evaluate one query (reference RunQuery, receiver_osn.cpp:140-540).

        timings: pass a dict to get an IN-CALL phase split — a device sync
        (jitted scalar checksum + device_get) is inserted between the power
        wavefront and the bundle evaluation, and {"powers_s", "eval_s"} are
        recorded such that powers_s + eval_s ≈ the instrumented call's wall
        time.  Timing the stages as separate re-dispatched calls instead
        overstated the total by ~30% (BENCH_r03: 143+128 ms vs a 206 ms
        query) because run_query overlaps host dispatch of the eval chunk
        programs with device execution of the powers program; the sync
        serializes that overlap, so an instrumented call runs slightly
        LONGER than an uninstrumented one — the split is attribution, the
        uninstrumented number is the headline.
        """
        import time as _time

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
        mask = self.rng.integers(0, t, size=(B, C, N), dtype=np.uint64).astype(np.uint32)
        self.last_mask = mask

        from apsu_tpu.db.measured_levels import defer_relin, powers_at_eval

        at_eval = powers_at_eval(p)
        defer = defer_relin(p)

        def _sync(x):
            f = self.bfv._jitted("chk_u32", lambda o: jnp.sum(o, dtype=jnp.uint32))
            jax.device_get(f(x))

        if self.plan.uses_ps:
            t0 = _time.perf_counter()
            low_ntt, high_coeff = compute_ps_power_tensors(
                self.bfv, cts, self.plan, rk, eval_level=self.db.eval_lvl,
                batch_first=True, at_eval=at_eval, defer_relin=defer,
            )
            if timings is not None:
                _sync(low_ntt)
                _sync(high_coeff)
                timings["powers_s"] = _time.perf_counter() - t0
                t0 = _time.perf_counter()
            res = eval_matching_polys_ps(
                self.bfv,
                low_ntt,     # [B, ℓ, 2, L, N]
                high_coeff,  # [B, nh, 2, L, N]
                self.db.coeff_cache,
                self.db.ps_const_polys,
                jnp.asarray(mask),
                rk,
                p.query_params.ps_low_degree,
                self.db.result_lvl,
                p.table_params.max_items_per_bin,
                eval_level=self.db.eval_lvl,
            )
            if timings is not None:
                _sync(res.data)
                timings["eval_s"] = _time.perf_counter() - t0
            return QueryResponse(results=res.data, eval_level=self.db.result_lvl)

        t0 = _time.perf_counter()
        powers = compute_power_tensor(
            self.bfv, cts, self.plan.low, rk, self.db.eval_lvl, at_eval=at_eval
        )  # [D, B, 2, Le, N]
        if timings is not None:
            _sync(powers)
            timings["powers_s"] = _time.perf_counter() - t0
            t0 = _time.perf_counter()
        powers = jnp.moveaxis(powers, 0, 1)  # [B, D, 2, Le, N]
        if self.db.label_cache is not None:
            rho = self.rng.integers(1, t, size=(B, C, N), dtype=np.uint64).astype(
                np.uint32
            )
            resM, resL = eval_matching_polys_labeled(
                self.bfv,
                powers,
                self.db.coeff_cache,
                self.db.const_slots,
                jnp.asarray(mask),
                self.db.label_cache,
                self.db.label0_slots,
                jnp.asarray(rho),
                self.db.eval_lvl,
            )
            if timings is not None:
                _sync(resM.data)
                timings["eval_s"] = _time.perf_counter() - t0
            return QueryResponse(
                results=resM.data,
                eval_level=self.db.eval_lvl,
                label_results=resL.data,
            )
        res = eval_matching_polys(
            self.bfv,
            powers,
            self.db.coeff_cache,
            self.db.const_slots,
            jnp.asarray(mask),
            self.db.eval_lvl,
        )
        if timings is not None:
            _sync(res.data)
            timings["eval_s"] = _time.perf_counter() - t0
        return QueryResponse(results=res.data, eval_level=self.db.eval_lvl)

    def peqt_matrix(self) -> np.ndarray:
        """Mask matrix in per-item felt-block form [C, table_size, fpi]."""
        return _slots_to_item_blocks(self.params, self.last_mask)


def _pow_mod(base: np.ndarray, e: int, m: int) -> np.ndarray:
    """Vectorized square-and-multiply (values < 2^32, m < 2^31: uint64-safe)."""
    result = np.ones_like(base)
    b = base % np.uint64(m)
    while e:
        if e & 1:
            result = result * b % np.uint64(m)
        b = b * b % np.uint64(m)
        e >>= 1
    return result


def _slots_to_item_blocks(params: PSUParams, slot_matrix: np.ndarray) -> np.ndarray:
    """[B, C, N] slot values -> [C, table_size, fpi] per-item felt blocks."""
    p = params
    tp = p.table_params
    ipb, fpi = p.items_per_bundle, p.felts_per_item
    slots = np.arange(tp.table_size)
    b = slots // ipb
    lane = (slots % ipb) * fpi
    C = slot_matrix.shape[1]
    out = np.empty((C, tp.table_size, fpi), dtype=slot_matrix.dtype)
    for f in range(fpi):
        out[:, :, f] = slot_matrix[b, :, lane + f].T
    return out
