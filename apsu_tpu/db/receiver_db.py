"""ReceiverDB — the large-set party's preprocessed database as dense tensors.

Replaces the reference's ``ReceiverDB`` + ``BinBundle`` object graph
(/root/reference/receiver/apsu/receiver_db.cpp — cuckoo-location insert
pipeline at :246-510; /root/reference/receiver/apsu/bin_bundle.cpp — per-bin
polynomials and batched plaintext caches at :366-430, :975-1026) with a
TPU-first representation:

* a *BinBundle* ceases to exist as an object — the whole DB partition is
    roots   [B, C, K, N]   (B bundle indices, C caches = the reference's
                            alpha/cache axis, K = max_items_per_bin,
                            N = poly degree lanes)
  built by vectorized numpy scatter from (item, slot) pairs, then
* one device pass computes every matching polynomial at once
  (engine/interpolate.py), and
* the *evaluation cache* is the batch-encoded, q-lifted, NTT'd coefficient
  tensor ``coeff_cache [B, C, K+1, L, N]`` resident in HBM — the operand of
  the hot query kernel.

Insertion semantics match the reference: each item is inserted at every one
of its ``hash_func_count`` cuckoo locations (receiver_db.cpp:70-79
``all_locations``); within a slot, overflow beyond ``max_items_per_bin``
spills into the next cache (the BinBundle multi_insert first-fit of
bin_bundle.cpp:477 with uniform capacity); every insert stores the item's
``felts_per_item`` field elements in consecutive lanes of the same cache.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from apsu_tpu.core.bfv import BfvContext
from apsu_tpu.core.params import PSUParams
from apsu_tpu.engine.interpolate import newton_interpolate, polyn_with_roots
from apsu_tpu.hash.encoding import felts_from_items
from apsu_tpu.hash.items import LocFuncs
from apsu_tpu.mpc.oprf import OprfBackend


def _place_labeled(
    slots: np.ndarray, felts: np.ndarray, K: int
) -> tuple[np.ndarray, np.ndarray]:
    """Collision-aware (cache, depth) assignment for labeled bins.

    Round c selects, among still-unplaced items, those that are the first
    remaining occurrence of their felt value in EVERY column of their slot
    (so x-values are distinct per (slot, cache) interpolation lane), capped
    at K per slot; selected items take cache c at within-slot rank depth.
    The first remaining item of a slot is always selected, so the loop
    terminates in ≤ max-bin-total rounds."""
    m = len(slots)
    cache_idx = np.zeros(m, dtype=np.int64)
    depth = np.zeros(m, dtype=np.int64)
    if m == 0:
        return cache_idx, depth
    fpi = felts.shape[1]
    keys = slots.astype(np.int64)[:, None] << 32 | felts.astype(np.int64)
    remaining = np.arange(m)
    c = 0
    while len(remaining):
        ok = np.ones(len(remaining), dtype=bool)
        for f in range(fpi):
            key = keys[remaining, f]
            order = np.argsort(key, kind="stable")
            ks = key[order]
            first = np.empty(len(remaining), dtype=bool)
            first[order] = np.concatenate([[True], ks[1:] != ks[:-1]])
            ok &= first
        sel = remaining[ok]
        # within-slot rank (stable slot sort preserves input order)
        so = np.argsort(slots[sel], kind="stable")
        ss = slots[sel][so]
        first_pos = np.searchsorted(ss, ss, side="left")
        rank = np.arange(len(ss)) - first_pos
        keep = rank < K
        chosen = sel[so][keep]
        cache_idx[chosen] = c
        depth[chosen] = rank[keep]
        mask = np.ones(len(remaining), dtype=bool)
        mask[np.searchsorted(remaining, chosen)] = False
        remaining = remaining[mask]
        c += 1
    return cache_idx, depth


@dataclasses.dataclass
class DbStats:
    n_items: int
    n_insertions: int
    n_caches: int            # alpha_max_cache_count
    cache_counts: np.ndarray  # [B] caches actually used per bundle index
    max_bin_load: int

    def __eq__(self, other) -> bool:
        # dataclass tuple-equality raises on the ndarray field whenever
        # B > 1 ("truth value of an array is ambiguous") — compare it
        # with array_equal instead (ADVICE r4)
        if not isinstance(other, DbStats):
            return NotImplemented
        return (
            self.n_items == other.n_items
            and self.n_insertions == other.n_insertions
            and self.n_caches == other.n_caches
            and self.max_bin_load == other.max_bin_load
            and np.array_equal(self.cache_counts, other.cache_counts)
        )


class ReceiverDB:
    def __init__(
        self,
        params: PSUParams,
        oprf: OprfBackend,
        bfv: Optional[BfvContext] = None,
        loc_seed: bytes = b"apsu-loc",
        bundle_range: Optional[tuple] = None,
        cache_range: Optional[tuple] = None,
    ):
        """bundle_range=(b0, b1): build/hold only bundle indices [b0, b1) —
        one host's partition of a multi-host DB (SURVEY §2.7 C4; the
        reference's scaling axis at receiver_osn.cpp:188-205).  Tensors then
        have B = b1-b0 and the worker serves its slice of every query.

        cache_range=(c0, c1): additionally hold only caches [c0, c1) of
        those bundles — the second partition axis the 256M-4096 working set
        (~32 caches/bundle, ~76 GB cache) needs.  A cache-partitioned DB is
        build-once (no incremental mutation: a bin's overflow spill crosses
        cache ranges)."""
        self.params = params
        self.oprf = oprf
        self.bfv = bfv or BfvContext(params.seal_params)
        tp = params.table_params
        self.bundle_range = (
            tuple(int(x) for x in bundle_range)
            if bundle_range is not None
            else (0, params.bundle_idx_count)
        )
        self.cache_range = (
            tuple(int(x) for x in cache_range) if cache_range is not None else None
        )
        self._loc_seed = loc_seed  # forwarded by rebind() (ADVICE r4)
        self.locs = LocFuncs(tp.table_size, tp.hash_func_count, loc_seed)
        self.coeff_cache: Optional[jnp.ndarray] = None  # [B, C, planes, L, N] NTT mont
        self.label_cache: Optional[jnp.ndarray] = None  # labeled mode only
        self.label0_slots: Optional[jnp.ndarray] = None  # [B, C, N] L_0 coeffs
        self.stats: Optional[DbStats] = None
        # mutation state (roots/counts host tensors), dropped by strip()
        self._roots: Optional[np.ndarray] = None    # [B, C, K, N] uint32
        self._counts: Optional[np.ndarray] = None   # [B, C, N] int32
        self._eval_level_arg: Optional[int] = None
        # OPRF-independent placement retained by the unlabeled build so a
        # new OPRF correlation can rebind without redoing locations/dedup/
        # ranks (VERDICT r3 #9 resident-KKRT economics); dropped by strip()
        # and invalidated by incremental mutation
        self._placement: Optional[tuple] = None

    # ------------------------------------------------------------------
    def set_data(
        self,
        items: np.ndarray,
        eval_level: Optional[int] = None,
        labels: Optional[np.ndarray] = None,
        assume_unique: bool = False,
    ) -> DbStats:
        """items: [n, 2] uint64 128-bit hashed items. Builds the eval cache.

        labels: optional [n, 16] uint8 per-item labels (LABELED mode —
        reference bin_bundle.cpp:975-1026 label interpolation; non-PS
        configs only).  Callers wanting item-bound label privacy encrypt
        with hash.items.encrypt_label first.

        assume_unique: the caller guarantees ``items`` holds no duplicate
        rows, skipping the global duplicate-insert sort (the dominant host
        cost at 2^28 items; colliding location functions are still
        deduplicated row-wise either way)."""
        p = self.params
        tp = p.table_params
        n = items.shape[0]
        h = tp.hash_func_count
        fpi = p.felts_per_item
        K = tp.max_items_per_bin
        b0, b1 = self.bundle_range
        ipb = p.items_per_bundle
        lo_slot, hi_slot = b0 * ipb, min(tp.table_size, b1 * ipb)

        # 1. all cuckoo locations, flattened (item, slot) pairs
        locs = self.locs.locations(items)          # [n, h]
        slots = locs.reshape(-1)                   # [n*h]

        # colliding location functions: drop repeats of a slot within one
        # item's own row (h·(h-1)/2 vectorized compares — no global sort)
        keep2d = np.ones(locs.shape, dtype=bool)
        for j in range(1, h):
            for i in range(j):
                keep2d[:, j] &= locs[:, j] != locs[:, i]
        row_keep = keep2d.reshape(-1)

        if labels is None:
            return self._set_data_unlabeled(
                items, slots, row_keep, eval_level, assume_unique
            )

        # LABELED path (smaller scale by construction: non-PS configs only)
        rep = np.repeat(items, h, axis=0)
        lab_u64 = (
            np.ascontiguousarray(labels, dtype=np.uint8)
            .view(np.uint64)
            .reshape(-1, 2)
        )
        # a label rides the same felt lanes as its item: capacity is
        # item_bit_count bits (longer labels need the encryptor's
        # chunking — reject rather than truncate silently)
        cap = p.item_bit_count
        hi_ok = (
            lab_u64[:, 1] >> np.uint64(max(0, cap - 64)) == 0
            if cap < 128
            else np.ones(len(lab_u64), bool)
        )
        lo_ok = (
            lab_u64[:, 0] >> np.uint64(cap) == 0 if cap < 64 else True
        )
        if not (np.all(hi_ok) and np.all(lo_ok)):
            raise ValueError(
                f"label exceeds the {cap}-bit per-item capacity of this "
                "parameter set"
            )
        rep_labels = np.repeat(lab_u64, h, axis=0)

        # drop duplicate (item, slot) pairs — colliding loc funcs AND
        # duplicate input items (the reference's all_locations is a set,
        # receiver_db.cpp:70-79, and its per-bin cuckoo filter rejects
        # re-inserts of the same item; runs for h == 1 too)
        if self.cache_range is not None:
            raise ValueError("labeled mode does not support cache_range")

        # drop duplicate (item, slot) pairs — colliding loc funcs AND
        # duplicate input items (the reference's all_locations is a set,
        # receiver_db.cpp:70-79, and its per-bin cuckoo filter rejects
        # re-inserts of the same item; runs for h == 1 too)
        if len(slots):
            keep = np.ones(len(slots), dtype=bool)
            order0 = np.lexsort((rep[:, 1], rep[:, 0], slots))
            sk, r0, r1 = slots[order0], rep[order0, 0], rep[order0, 1]
            dup = (sk[1:] == sk[:-1]) & (r0[1:] == r0[:-1]) & (r1[1:] == r1[:-1])
            keep_sorted = np.concatenate([[True], ~dup])
            keep[order0] = keep_sorted
            slots, rep = slots[keep], rep[keep]
            rep_labels = rep_labels[keep]

        # multi-host partition: keep only this worker's slot range
        if (b0, b1) != (0, p.bundle_idx_count):
            in_range = (slots >= lo_slot) & (slots < hi_slot)
            slots, rep = slots[in_range], rep[in_range]
            rep_labels = rep_labels[in_range]

        # 2. slot-bound OPRF, 3. felts
        prf = self.oprf.eval(rep, slots)
        felts = felts_from_items(prf, fpi, p.item_bit_count_per_felt)  # [m, fpi]
        label_felts = felts_from_items(
            rep_labels, fpi, p.item_bit_count_per_felt
        )

        # 4. labeled placement: bins interpolate over felt x-values, which
        # must be DISTINCT within a (slot, cache) bin lane; a colliding
        # item spills to the next cache — the reference's labeled
        # multi_insert dry-run behavior (bin_bundle.cpp:477).  Vectorized
        # round-based placement (round c fills cache c): a remaining item
        # is selected iff, per felt column, it is the FIRST remaining
        # occurrence of its (slot, value) — slightly more conservative
        # than sequential first-fit (a later item blocked only by an
        # unselected earlier one also spills) but collision-free by
        # construction, deterministic, and O(rounds · m log m) instead of
        # a per-item Python/dict walk
        cache_idx, depth = _place_labeled(slots, felts, K)
        C = int(cache_idx.max()) + 1 if len(cache_idx) else 1

        slot_counts_full = np.bincount(slots, minlength=tp.table_size)[
            lo_slot:hi_slot
        ]
        if eval_level is None:
            eval_level = self.labeled_eval_level()
        return self._finish_build(
            n, slots, felts, label_felts, cache_idx, depth, C, 0,
            slot_counts_full, eval_level,
        )

    def _set_data_unlabeled(
        self,
        items: np.ndarray,
        slots: np.ndarray,
        row_keep: np.ndarray,
        eval_level: Optional[int],
        assume_unique: bool,
    ) -> DbStats:
        """Unlabeled build back-end: placement depends only on slots, so
        the slot-bound OPRF and felt extraction are DEFERRED until after
        the rank and partition filters — at 2^28 items the PRF then runs
        on the kept slice instead of all n·h pairs, and no [n·h, 2] item
        repeat is ever materialized (the host phase of the 256M slice
        build dropped ~3x)."""
        self._placement = self._compute_placement_unlabeled(
            items, slots, row_keep, assume_unique
        )
        return self._materialize_placement(self, self.cache_range, eval_level)

    def _compute_placement_unlabeled(
        self, items, slots, row_keep, assume_unique
    ) -> tuple:
        """OPRF-independent placement over the FULL cache axis: cuckoo
        dedup + bundle-range filter + per-slot ranks.  Depends only on the
        item hashes (reference: locations precede the PRF encoding,
        receiver_db.cpp:70-79 vs :157-240).  Returned (and retained as
        ``_placement``) in narrowed dtypes with an items REFERENCE instead
        of a materialized items_kept (ADVICE r4: the wide retention held
        ~40 B per kept pair — ~2 GB at 16M·h=3; this holds ~14 B/pair +
        the caller's input array)."""
        p = self.params
        tp = p.table_params
        n = items.shape[0]
        h = tp.hash_func_count
        K = tp.max_items_per_bin
        b0, b1 = self.bundle_range
        ipb = p.items_per_bundle
        lo_slot, hi_slot = b0 * ipb, min(tp.table_size, b1 * ipb)

        item_idx = np.broadcast_to(
            np.arange(n, dtype=np.int64)[:, None], (n, h)
        ).reshape(-1)
        slots, item_idx = slots[row_keep], item_idx[row_keep]

        if not assume_unique and len(slots):
            # duplicate INPUT items (same item inserted twice hits the
            # same slots; the reference's per-bin cuckoo filter rejects
            # re-inserts, receiver_db.cpp:70-79): keep the first
            # (item, slot) pair.  O(m log m) global sort — callers that
            # guarantee distinct items (the 256M harness, OPRF'd inputs)
            # skip it with assume_unique=True.
            r0, r1 = items[item_idx, 0], items[item_idx, 1]
            order0 = np.lexsort((r1, r0, slots))
            sk, s0, s1 = slots[order0], r0[order0], r1[order0]
            dup = (sk[1:] == sk[:-1]) & (s0[1:] == s0[:-1]) & (s1[1:] == s1[:-1])
            keepu = np.empty(len(slots), dtype=bool)
            keepu[order0] = np.concatenate([[True], ~dup])
            slots, item_idx = slots[keepu], item_idx[keepu]

        # multi-host partition: keep only this worker's slot range
        if (b0, b1) != (0, p.bundle_idx_count):
            in_range = (slots >= lo_slot) & (slots < hi_slot)
            slots, item_idx = slots[in_range], item_idx[in_range]

        # per-slot ranks -> (cache, depth), from slots alone
        order = np.argsort(slots, kind="stable")
        ss = slots[order]
        first = np.searchsorted(ss, ss, side="left")
        ranks = np.empty(len(ss), dtype=np.int64)
        ranks[order] = np.arange(len(ss)) - first
        cache_idx = ranks // K
        depth = ranks % K
        C = int(cache_idx.max()) + 1 if len(cache_idx) else 1

        # per-slot load counts (full cache axis; identical on every worker)
        slot_counts_full = np.bincount(slots, minlength=tp.table_size)[
            lo_slot:hi_slot
        ]
        return (
            items, item_idx.astype(np.int32), slots.astype(np.int32),
            cache_idx.astype(np.int32), depth.astype(np.uint16), n, C,
            0, slot_counts_full,
        )

    def _materialize_placement(
        self, into: "ReceiverDB", cache_range, eval_level
    ) -> DbStats:
        """PRF + felts + device build of ``into`` from this DB's retained
        full-cache-axis placement, filtered to ``cache_range``.  Restores
        the build path's canonical dtypes first (every downstream consumer
        — OPRF slot binding, scatter indices — must see byte-identical
        inputs to a direct set_data)."""
        assert self._placement is not None
        (items, item_idx_n, slots_n, cache_idx_n, depth_n, n, C_full, _,
         slot_counts_full) = self._placement
        p = self.params
        slots = slots_n.astype(np.int64)
        item_idx = item_idx_n.astype(np.int64)
        cache_idx = cache_idx_n.astype(np.int64)
        depth = depth_n.astype(np.int64)
        C = C_full
        cache_base = 0
        if cache_range is not None:
            c0r, c1r = (int(x) for x in cache_range)
            in_c = (cache_idx >= c0r) & (cache_idx < c1r)
            slots, item_idx = slots[in_c], item_idx[in_c]
            cache_idx, depth = cache_idx[in_c] - c0r, depth[in_c]
            C = c1r - c0r
            cache_base = c0r

        # slot-bound OPRF + felts on the kept slice only
        items_kept = items[item_idx]
        prf = into.oprf.eval(items_kept, slots)
        felts = felts_from_items(prf, p.felts_per_item,
                                 p.item_bit_count_per_felt)
        return into._finish_build(
            n, slots, felts, None, cache_idx, depth, C, cache_base,
            slot_counts_full, eval_level,
        )

    # ------------------------------------------------------------------
    # placement-only build + cache-range partitions (the 256M grid path:
    # place 2^28 items ONCE, then materialize each worker's cache-range
    # partition from the shared placement — reference scaling axis
    # receiver_osn.cpp:188-205, caches per bundle)
    # ------------------------------------------------------------------
    def place_data(self, items: np.ndarray, assume_unique: bool = False) -> int:
        """Compute and retain the full-cache-axis placement WITHOUT
        building any device cache.  Returns the total cache count C (the
        grid's partition denominator).  Follow with ``build_partition``."""
        tp = self.params.table_params
        locs = self.locs.locations(items)
        slots = locs.reshape(-1)
        keep2d = np.ones(locs.shape, dtype=bool)
        for j in range(1, tp.hash_func_count):
            for i in range(j):
                keep2d[:, j] &= locs[:, j] != locs[:, i]
        self._placement = self._compute_placement_unlabeled(
            items, slots, keep2d.reshape(-1), assume_unique
        )
        return int(self._placement[6])

    def build_partition(
        self, cache_range, oprf=None, eval_level: Optional[int] = None
    ) -> "ReceiverDB":
        """ReceiverDB over caches [c0, c1) materialized from the retained
        placement (from ``place_data`` or a full ``set_data``).  The
        partition shares this DB's BfvContext (compiled kernels) and
        LocFuncs seed; drop it after serving to release its HBM cache."""
        if self._placement is None:
            raise ValueError(
                "no retained placement: call place_data/set_data first"
            )
        db = ReceiverDB(
            self.params, oprf if oprf is not None else self.oprf,
            bfv=self.bfv, loc_seed=self._loc_seed,
            bundle_range=self.bundle_range, cache_range=tuple(cache_range),
        )
        self._materialize_placement(db, db.cache_range, eval_level)
        return db

    def _finish_build(
        self, n, slots, felts, label_felts, cache_idx, depth, C, cache_base,
        slot_counts_full, eval_level,
    ) -> DbStats:
        """Shared build tail: dense roots/counts tensors + device build."""
        p = self.params
        tp = p.table_params
        fpi = p.felts_per_item
        K = tp.max_items_per_bin
        b0, b1 = self.bundle_range
        B = b1 - b0
        N = p.poly_degree
        ipb = p.items_per_bundle
        lo_slot, hi_slot = b0 * ipb, min(tp.table_size, b1 * ipb)

        # 5. dense roots tensor + per-lane counts
        bundle_idx = slots // ipb - b0
        lane = (slots % ipb) * fpi
        roots = np.zeros((B, C, K, N), dtype=np.uint32)
        counts = np.zeros((B, C, N), dtype=np.int32)
        for f in range(fpi):
            roots[bundle_idx, cache_idx, depth, lane + f] = felts[:, f]
        label_vals = None
        if label_felts is not None:
            label_vals = np.zeros((B, C, K, N), dtype=np.uint32)
            for f in range(fpi):
                label_vals[bundle_idx, cache_idx, depth, lane + f] = label_felts[:, f]
        slot_counts = slot_counts_full
        per_bundle_caches = np.zeros(B, dtype=np.int64)
        sidx = np.arange(lo_slot, hi_slot)
        sb = sidx // ipb - b0
        sl = (sidx % ipb) * fpi
        # per-(slot, cache) fills: dense rank filling in the unlabeled path
        # (cache index global = local + cache_base), the actual
        # collision-aware placement in the labeled path
        slot_cache_cnt = np.zeros((len(sidx), C), dtype=np.int32)
        if label_felts is None:
            for c in range(C):
                slot_cache_cnt[:, c] = np.clip(
                    slot_counts - (c + cache_base) * K, 0, K
                )
        else:
            np.add.at(slot_cache_cnt, (slots - lo_slot, cache_idx), 1)
        for c in range(C):
            cnt_c = slot_cache_cnt[:, c]
            for f in range(fpi):
                counts[sb, c, sl + f] = cnt_c
            used = np.bincount(sb[cnt_c > 0], minlength=B) > 0
            per_bundle_caches[used] += 1

        # 6. device build of the evaluation cache (roots/counts retained
        # host-side until strip() for incremental insert/remove)
        self._build_cache(roots, counts, eval_level)
        if label_vals is not None:
            self._build_label_cache(roots, label_vals, counts)
        self._roots, self._counts = roots, counts
        self._eval_level_arg = eval_level
        self.stats = DbStats(
            n_items=n,
            n_insertions=len(slots),
            n_caches=C,
            cache_counts=per_bundle_caches,
            max_bin_load=int(slot_counts.max()) if len(slot_counts) else 0,
        )
        if self.cache_range is None and self.stats.max_bin_load > K * C:
            raise ValueError("bin overflow beyond cache capacity")
        return self.stats

    # incremental mutation needs the full cache axis (bin overflow spills
    # across cache ranges)
    def _check_full_cache_axis(self) -> None:
        if self.cache_range is not None:
            raise ValueError(
                "cache-partitioned DBs are build-once (no incremental ops)"
            )

    # ------------------------------------------------------------------
    def _build_cache(
        self, roots: np.ndarray, counts: np.ndarray, eval_level: Optional[int] = None
    ) -> None:
        """Device build: polynomials -> batch encode -> lift to NTT mod q.

        roots [B, C, K, N] uint32 mod t, counts [B, C, N] int32 per-lane bin
        loads.  PS configs keep the cache at FULL level (the outer ct×ct
        products happen there) and additionally retain the encoded
        chunk-constant polynomials c_{k·(ℓ+1)} in coefficient domain.
        """
        p = self.params
        B, C, K, N = roots.shape
        ps_low = p.query_params.ps_low_degree
        uses_ps = ps_low > 0
        lvl = self.ps_level() if uses_ps else (eval_level or self.eval_level())
        t = p.seal_params.plain_modulus

        from apsu_tpu.ops.polyeval import plane_count

        # Zero-pad the coefficient-plane axis so (a) it aligns to the Pallas
        # degree chunk / PS segment chunk and (b) every PS gather index
        # nh·ph + i (i ≤ ℓ) is in-bounds on a REAL zero plane — when
        # K % ph < ℓ the last chunk reads planes past K+1, which must exist
        # and be zero (ADVICE r1).
        if uses_ps:
            ph = ps_low + 1
            nh = K // ph
            const_idx = np.arange(0, nh + 1) * ph
        planes = plane_count(K, ps_low)
        pad_planes = planes - (K + 1)

        def build(roots_d, counts_d):
            coeffs = polyn_with_roots(roots_d, counts_d, t)    # [C, K+1, N] mod t
            if pad_planes:
                coeffs = jnp.concatenate(
                    [
                        coeffs,
                        jnp.zeros(coeffs.shape[:-2] + (pad_planes, N), jnp.uint32),
                    ],
                    axis=-2,
                )
            polys = self.bfv.encode(coeffs)                    # batch-encode slots
            cache = self.bfv.lift_plaintext_ntt(polys, lvl)    # [C, planes, L, N]
            if uses_ps:
                return cache, coeffs[..., 0, :], polys[..., const_idx, :]
            # constant coefficients stay in slot domain: the evaluator folds
            # them into the per-query random mask before encoding
            return cache, coeffs[..., 0, :]

        # chunked per-bundle build bounds device temporaries to one bundle's
        # worth (the 16M cache is ~7 GB; building it in one shot would need
        # 2-3x that transiently).  Chunks are written into a preallocated,
        # DONATED buffer — a final jnp.stack would transiently double the
        # full cache and OOM the 16 GB chip.  At 256M-slice shapes even ONE
        # bundle's chunk (C·planes·L·N, ~2.4 GB at C=3/K=4000/L=6) plus its
        # lift/NTT temporaries no longer fits beside the donated buffer, so
        # the build sub-chunks the cache axis once a bundle chunk exceeds
        # ~1 GB (cc caches per device call; r4 — the 256M slice OOM'd at
        # both --caches 4 and 3 before this).
        Lq = self.bfv.levels[lvl].k
        chunk_bytes = C * planes * Lq * N * 4
        cc = C
        # 1.25 GB: the 16M bundle chunk (1.04 GB) stays a single call
        while cc > 1 and (chunk_bytes * cc + C - 1) // C > (5 << 28):
            cc -= 1
        fn = self.bfv._jitted(("db_build", lvl, uses_ps, cc, planes), build)
        place_key = ("db_place", lvl, uses_ps, cc, planes)
        if place_key not in self.bfv._jit_cache:
            self.bfv._jit_cache[place_key] = jax.jit(
                lambda buf, chunk, b, c: jax.lax.dynamic_update_slice(
                    buf,
                    chunk[None],
                    (b, c) + (0,) * (buf.ndim - 2),
                ),
                donate_argnums=0,
                static_argnums=(),
            )
        place = self.bfv._jit_cache[place_key]
        cache_buf = jnp.zeros((B, C, planes, Lq, N), jnp.uint32)
        consts = []
        ps_consts = []
        for b in range(B):
            c_out, c_ps = [], []
            for c0 in range(0, C, cc):
                cs = slice(c0, min(C, c0 + cc))
                if cs.stop - cs.start != cc:  # remainder chunk: own program
                    fn_r = self.bfv._jitted(
                        ("db_build", lvl, uses_ps, cs.stop - cs.start, planes),
                        build,
                    )
                    out = fn_r(jnp.asarray(roots[b, cs]), jnp.asarray(counts[b, cs]))
                else:
                    out = fn(jnp.asarray(roots[b, cs]), jnp.asarray(counts[b, cs]))
                cache_buf = place(
                    cache_buf, out[0], np.int32(b), np.int32(c0)
                )
                c_out.append(out[1])
                if uses_ps:
                    c_ps.append(out[2])
            consts.append(
                c_out[0] if len(c_out) == 1 else jnp.concatenate(c_out)
            )
            if uses_ps:
                ps_consts.append(
                    c_ps[0] if len(c_ps) == 1 else jnp.concatenate(c_ps)
                )
        self.coeff_cache = cache_buf
        self.const_slots = jnp.stack(consts)
        self.ps_const_polys = jnp.stack(ps_consts) if uses_ps else None
        self.eval_lvl = lvl
        self.result_lvl = self.result_level() if uses_ps else lvl

    def _build_label_cache(
        self, roots: np.ndarray, label_vals: np.ndarray, counts: np.ndarray
    ) -> None:
        """Interpolate per-bin label polynomials L with L(item_felt) =
        label_felt (reference regen_polyns' Newton branch) and lift them
        into an NTT cache shaped like coeff_cache (same plane count, so the
        evaluator reuses one padded power tensor for both dot products)."""
        p = self.params
        if p.query_params.ps_low_degree > 0:
            raise ValueError("labeled mode supports non-PS configs only")
        B, C, K, N = roots.shape
        t = p.seal_params.plain_modulus

        # Newton needs DISTINCT x-values within each lane's valid prefix;
        # two different items may collide on one felt lane (probability
        # ~K²/2t per lane) — reject loudly rather than corrupt labels
        depth_idx = np.arange(K, dtype=np.int64)
        invalid = depth_idx[None, None, :, None] >= counts[:, :, None, :]
        # padding entries get unique out-of-range keys so they never collide
        key = np.where(
            invalid, (t + depth_idx)[None, None, :, None], roots.astype(np.int64)
        )
        ks = np.sort(key, axis=2)
        if bool((ks[:, :, 1:, :] == ks[:, :, :-1, :]).any()):
            raise ValueError(
                "label interpolation impossible: two bin entries share a "
                "felt value in one lane (re-randomize the OPRF or rebuild)"
            )

        lvl = self.eval_lvl
        planes = self.coeff_cache.shape[2]

        def build(roots_d, lvals_d, counts_d):
            coeffs = newton_interpolate(roots_d, lvals_d, counts_d, t)  # [C, K, N]
            pad = planes - K
            if pad:
                coeffs = jnp.concatenate(
                    [coeffs, jnp.zeros(coeffs.shape[:-2] + (pad, N), jnp.uint32)],
                    axis=-2,
                )
            polys = self.bfv.encode(coeffs)
            return self.bfv.lift_plaintext_ntt(polys, lvl), coeffs[..., 0, :]

        fn = self.bfv._jitted(("db_label_build", lvl, C, planes), build)
        caches, l0s = [], []
        for b in range(B):
            out = fn(
                jnp.asarray(roots[b]),
                jnp.asarray(label_vals[b]),
                jnp.asarray(counts[b]),
            )
            caches.append(out[0])
            l0s.append(out[1])
        self.label_cache = jnp.stack(caches)
        self.label0_slots = jnp.stack(l0s)

    def set_synthetic_dense(
        self, rng, n_caches: int = 1, eval_level: Optional[int] = None
    ) -> np.ndarray:
        """Worst-case synthetic DB: every bin packed to max_items_per_bin.

        Builds the evaluation cache from random full bins (the densest load
        any parameter file permits) without cuckoo hashing or an OPRF — the
        operand of the noise-margin sweep (tools/param_sweep.py) and of
        full-degree evaluator tests.  Returns the roots tensor
        [B, C, K, N] so callers can plant matching query values."""
        p = self.params
        tp = p.table_params
        B, N, K = p.bundle_idx_count, p.poly_degree, tp.max_items_per_bin
        C = n_caches
        t = p.seal_params.plain_modulus
        roots = (
            np.asarray(rng.integers(1, t, size=(B, C, K, N), dtype=np.uint64))
            .astype(np.uint32)
        )
        counts = np.full((B, C, N), K, dtype=np.int32)
        self._build_cache(roots, counts, eval_level)
        self.stats = DbStats(
            n_items=B * C * K * N,
            n_insertions=B * C * K * N,
            n_caches=C,
            cache_counts=np.full(B, C, dtype=np.int64),
            max_bin_load=K * C,
        )
        return roots

    # ------------------------------------------------------------------
    def eval_level(self, extra_bits: float = 0.0) -> int:
        """Smallest modulus level with enough room for the matching-poly sum
        at FULL bin load (the densest state a parameter file permits).

        log2(Q_l) ≳ 2·log2 t + log2 N + log2(K+1) + 4 + 2·depth, where depth
        is the power-DAG ct×ct depth: the mod-switch rounding floor
        (~t·√N/Q_l invariant noise) and the DAG's per-level t·√N noise
        amplification both survive into the dot product, each multiplied by
        another t·√N and summed over K+1 terms.  The original
        fresh-ciphertext-only estimate (2·t_bits + ½·log2 N + log2(K+1) + 8)
        silently overflowed on deep-DAG configs at full load — caught by
        tools/param_sweep.py (256K-512, 1M-512-*: 100% of dense matches
        decrypted wrong at the old level).  Exhausting the chain returns the
        full level (e.g. single-limb 100K-1, measured exact).

        A chip-measured per-parameter-set override (db/measured_levels.py)
        takes precedence when present and ``extra_bits`` is 0.
        """
        import math

        from apsu_tpu.db import measured_levels
        from apsu_tpu.engine.powers import plan_query

        if extra_bits == 0.0:
            ov = measured_levels.lookup(self.params)
            if ov and "eval" in ov:
                return min(ov["eval"], len(self.bfv.q_primes))

        p = self.params
        sp = p.seal_params
        t_bits = sp.plain_modulus.bit_length()
        K = p.table_params.max_items_per_bin
        depth = plan_query(
            p.query_params.query_powers, K, p.query_params.ps_low_degree
        ).low.depth
        need = (
            2 * t_bits
            + math.log2(p.poly_degree)
            + math.log2(K + 1)
            + 4
            + 2 * depth
            + extra_bits
        )
        bits = 0
        for lvl, q in enumerate(self.bfv.q_primes, start=1):
            bits += q.bit_length()
            if bits >= need:
                return lvl
        return len(self.bfv.q_primes)

    def labeled_eval_level(self) -> int:
        """Labeled results carry one more plaintext multiply (the ρ·M(x)
        blinding): ~log2(t·√N) additional invariant-noise bits."""
        import math

        t_bits = self.params.seal_params.plain_modulus.bit_length()
        return self.eval_level(
            extra_bits=t_bits + 0.5 * math.log2(self.params.poly_degree) + 4
        )

    def ps_level(self) -> int:
        """Evaluation level for the PS path: the outer ct×ct products need
        one multiply's growth (~log2(N·t)) of room above the result level.
        A chip-measured override (db/measured_levels.py) takes precedence."""
        import math

        from apsu_tpu.db import measured_levels

        ov = measured_levels.lookup(self.params)
        if ov and "ps" in ov:
            return min(ov["ps"], len(self.bfv.q_primes))

        sp = self.params.seal_params
        t_bits = sp.plain_modulus.bit_length()
        need = (
            self._result_need()
            + t_bits
            + math.log2(self.params.poly_degree) / 2
            + 12
        )
        bits = 0
        for lvl, q in enumerate(self.bfv.q_primes, start=1):
            bits += q.bit_length()
            if bits >= need:
                return lvl
        return len(self.bfv.q_primes)

    def _result_need(self) -> float:
        import math

        p = self.params
        sp = p.seal_params
        t_bits = sp.plain_modulus.bit_length()
        ell = p.query_params.ps_low_degree
        inner_need = (
            2 * t_bits
            - 1
            + 0.5 * (math.log2(p.poly_degree) - 3.58)
            + math.log2(ell + 1)
            + 8
        )
        nh = p.table_params.max_items_per_bin // (ell + 1)
        # +22 margin: measured budgets with DENSE full-degree bins sit ~10
        # bits above the sparse small-DB case; leave real headroom
        return inner_need + t_bits + math.log2(p.poly_degree) / 2 + math.log2(nh + 1) + 22

    def result_level(self) -> int:
        """Result-transmission level for the PS path: inner-sum noise (degree
        ℓ dot product) multiplied once by a high power, summed over nh chunks
        and relinearized — needs roughly inner_need + log2(N·t) + margin bits.
        A chip-measured override (db/measured_levels.py) takes precedence."""
        import math

        from apsu_tpu.db import measured_levels

        ov = measured_levels.lookup(self.params)
        if ov and "result" in ov:
            return min(ov["result"], len(self.bfv.q_primes))

        p = self.params
        sp = p.seal_params
        t_bits = sp.plain_modulus.bit_length()
        ell = p.query_params.ps_low_degree
        inner_need = (
            2 * t_bits
            - 1
            + 0.5 * (math.log2(p.poly_degree) - 3.58)
            + math.log2(ell + 1)
            + 8
        )
        need = self._result_need()
        bits = 0
        for lvl, q in enumerate(self.bfv.q_primes, start=1):
            bits += q.bit_length()
            if bits >= need:
                return lvl
        return len(self.bfv.q_primes)

    def strip(self) -> None:
        """Drop raw data, keep only the evaluation cache — the minimal
        query-serving checkpoint (receiver_db.cpp:828-856).  A stripped DB
        can no longer insert_or_assign/remove (reference parity)."""
        self._roots = None
        self._counts = None
        self._placement = None

    # ------------------------------------------------------------------
    @property
    def can_rebind(self) -> bool:
        """True iff this DB retains the OPRF-independent placement (built
        unlabeled via set_data, not stripped, not mutated since)."""
        return self._placement is not None

    def rebind(
        self, oprf: OprfBackend, eval_level: Optional[int] = None
    ) -> "ReceiverDB":
        """New ReceiverDB over the SAME item set under a fresh OPRF
        correlation, reusing the retained placement.

        The cuckoo locations, duplicate filtering and per-slot ranks
        depend only on the 128-bit item hashes — the slot-bound PRF
        replaces item VALUES after the placement is fixed (reference:
        all_locations at receiver_db.cpp:70-79 precedes the oprf_sender
        encoding at :157-240).  A resident server answering a new KKRT
        session therefore only re-derives the PRF outputs, felts, the
        roots scatter and the device evaluation cache — skipping the
        location hashing and the global dedup sort that dominate the host
        phase of a giant build.  The resident DB is untouched (its ECDH
        cache keeps serving other clients); drop the returned DB after the
        session to release its HBM cache."""
        if self._placement is None:
            raise ValueError(
                "no retained placement (labeled build, stripped, or "
                "mutated since set_data): rebind needs a fresh set_data"
            )
        db = ReceiverDB(
            self.params, oprf, bfv=self.bfv, loc_seed=self._loc_seed,
            bundle_range=self.bundle_range, cache_range=self.cache_range,
        )
        self._materialize_placement(
            db, self.cache_range,
            eval_level if eval_level is not None else self._eval_level_arg,
        )
        db._placement = self._placement  # shared read-only host state
        return db

    # ------------------------------------------------------------------
    # incremental mutation (reference insert_or_assign into an existing DB,
    # remove, has_item — receiver_db.cpp:330-510, 746-806).  Host-side
    # roots/counts update + device rebuild of ONLY the touched bundle
    # indices (each ~1/B of the cache), instead of a full set_data.
    # ------------------------------------------------------------------
    def _require_mutable(self) -> None:
        self._check_full_cache_axis()
        if self._roots is None:
            raise ValueError(
                "DB was stripped (or never built via set_data): incremental "
                "mutation needs the retained roots/counts tensors"
            )

    def _locations_felts(self, items: np.ndarray):
        """items -> deduped ((slots, rep_items, felts)) like set_data 1-3."""
        p = self.params
        locs = self.locs.locations(items)
        slots = locs.reshape(-1)
        rep = np.repeat(items, p.table_params.hash_func_count, axis=0)
        if len(slots):
            keep = np.ones(len(slots), dtype=bool)
            order0 = np.lexsort((rep[:, 1], rep[:, 0], slots))
            sk, r0, r1 = slots[order0], rep[order0, 0], rep[order0, 1]
            dup = (sk[1:] == sk[:-1]) & (r0[1:] == r0[:-1]) & (r1[1:] == r1[:-1])
            keep[order0] = np.concatenate([[True], ~dup])
            slots, rep = slots[keep], rep[keep]
        b0, b1 = self.bundle_range
        if (b0, b1) != (0, p.bundle_idx_count):
            ipb = p.items_per_bundle
            in_range = (slots >= b0 * ipb) & (
                slots < min(p.table_params.table_size, b1 * ipb)
            )
            slots, rep = slots[in_range], rep[in_range]
        prf = self.oprf.eval(rep, slots)
        felts = felts_from_items(prf, p.felts_per_item, p.item_bit_count_per_felt)
        return slots, rep, felts

    def _slot_geometry(self, slot: int):
        p = self.params
        b = slot // p.items_per_bundle - self.bundle_range[0]
        lane0 = (slot % p.items_per_bundle) * p.felts_per_item
        return b, lane0

    def _find_entry(self, slot: int, felt_row: np.ndarray):
        """(cache, depth) of felt_row in the slot's bin, or None."""
        c, d = self._find_entries(
            np.asarray([slot], dtype=np.int64), felt_row[None, :]
        )
        return (int(c[0]), int(d[0])) if c[0] >= 0 else None

    def _find_entries(self, slots: np.ndarray, felt_rows: np.ndarray):
        """Batch bin lookup: per (slot, felt_row) pair the (cache, depth)
        position of the row, or (-1, -1) — one gather over all m pairs
        instead of a per-item Python scan."""
        p = self.params
        fpi = p.felts_per_item
        m = len(slots)
        if m == 0:
            e = np.empty(0, dtype=np.int64)
            return e, e.copy()
        C, K = self._roots.shape[1], self._roots.shape[2]
        b = slots // p.items_per_bundle - self.bundle_range[0]
        lane0 = (slots % p.items_per_bundle) * fpi
        lanes = lane0[:, None, None, None] + np.arange(fpi)
        view = self._roots[
            b[:, None, None, None],
            np.arange(C)[None, :, None, None],
            np.arange(K)[None, None, :, None],
            lanes,
        ]  # [m, C, K, fpi]
        match = np.all(view == felt_rows[:, None, None, :], axis=3)
        depth_ok = (
            np.arange(K)[None, None, :]
            < self._counts[b[:, None], np.arange(C)[None, :], lane0[:, None]][
                :, :, None
            ]
        )
        hit = (match & depth_ok).reshape(m, C * K)
        pos = np.argmax(hit, axis=1)
        found = hit[np.arange(m), pos]
        c = np.where(found, pos // K, -1)
        d = np.where(found, pos % K, -1)
        return c, d

    def _slot_total(self, slot: int) -> int:
        b, lane0 = self._slot_geometry(slot)
        return int(self._counts[b, :, lane0].sum())

    def _set_slot_total(self, slot: int, total: int) -> None:
        p = self.params
        K = p.table_params.max_items_per_bin
        b, lane0 = self._slot_geometry(slot)
        fpi = p.felts_per_item
        C = self._counts.shape[1]
        per_cache = np.clip(total - np.arange(C) * K, 0, K).astype(np.int32)
        self._counts[b, :, lane0 : lane0 + fpi] = per_cache[:, None]

    def has_item(self, items: np.ndarray) -> np.ndarray:
        """[n] bool: is each (hashed) item present in the DB?"""
        self._require_mutable()
        h = self.params.table_params.hash_func_count
        locs = self.locs.locations(items)
        rep = np.repeat(items, h, axis=0)
        slots = locs.reshape(-1)
        prf = self.oprf.eval(rep, slots)
        felts = felts_from_items(
            prf, self.params.felts_per_item, self.params.item_bit_count_per_felt
        )
        c, _ = self._find_entries(slots.astype(np.int64), felts)
        return (c >= 0).reshape(-1, h).any(axis=1)

    def insert_or_assign(self, new_items: np.ndarray) -> DbStats:
        """Insert items into the existing DB (skipping already-present
        (item, slot) pairs), then rebuild only the touched bundle indices.

        Fully vectorized (no per-item Python walk): one batch bin lookup
        for presence, within-slot ranks for target positions, one scatter
        — the reference's per-bundle insert workers (receiver_db.cpp:
        330-510) collapse into numpy index arithmetic."""
        self._require_mutable()
        self._placement = None  # stale after mutation; rebind() refuses
        p = self.params
        K = p.table_params.max_items_per_bin
        fpi = p.felts_per_item
        B, C = self._roots.shape[0], self._roots.shape[1]
        slots, _, felts = self._locations_felts(new_items)
        slots = slots.astype(np.int64)

        c_found, _ = self._find_entries(slots, felts)
        pend = np.flatnonzero(c_found < 0)
        ps, pf = slots[pend], felts[pend]

        # target position of each pending pair: current slot total + its
        # within-slot rank (stable slot sort preserves input order)
        so = np.argsort(ps, kind="stable")
        ss = ps[so]
        first_pos = np.searchsorted(ss, ss, side="left")
        rank = np.arange(len(ss)) - first_pos
        b = ss // p.items_per_bundle - self.bundle_range[0]
        lane0 = (ss % p.items_per_bundle) * fpi
        tot0 = self._counts[b, :, lane0].sum(axis=1).astype(np.int64)
        target = tot0 + rank
        grow_to = max(C, int(-(-(target.max() + 1) // K)) if len(target) else C)
        if grow_to > C:
            new_roots = np.zeros(
                (B, grow_to, K, self._roots.shape[3]), dtype=self._roots.dtype
            )
            new_roots[:, :C] = self._roots
            new_counts = np.zeros((B, grow_to, self._counts.shape[2]), np.int32)
            new_counts[:, :C] = self._counts
            self._roots, self._counts = new_roots, new_counts

        ci, di = target // K, target % K
        lanes = lane0[:, None] + np.arange(fpi)
        self._roots[b[:, None], ci[:, None], di[:, None], lanes] = pf[so]
        # new per-slot totals -> dense per-cache counts for touched slots
        if len(ss):
            last = np.concatenate([first_pos[1:] != first_pos[:-1], [True]])
            su, tot_new = ss[last], target[last] + 1
            self._set_slot_totals(su, tot_new)
        touched = set(np.unique(b).tolist())

        if grow_to > C:
            self._build_cache(self._roots, self._counts, self._eval_level_arg)
        else:
            self._rebuild_bundles(touched)
        self._refresh_stats(len(pend))
        return self.stats

    def _set_slot_totals(self, slots: np.ndarray, totals: np.ndarray) -> None:
        """Vectorized _set_slot_total over unique slots."""
        p = self.params
        K = p.table_params.max_items_per_bin
        fpi = p.felts_per_item
        C = self._counts.shape[1]
        b = slots // p.items_per_bundle - self.bundle_range[0]
        lane0 = (slots % p.items_per_bundle) * fpi
        per_cache = np.clip(
            totals[:, None] - np.arange(C)[None, :] * K, 0, K
        ).astype(np.int32)
        lanes = lane0[:, None, None] + np.arange(fpi)[None, None, :]
        self._counts[
            b[:, None, None], np.arange(C)[None, :, None], lanes
        ] = per_cache[:, :, None]

    def remove(self, items: np.ndarray) -> DbStats:
        """Remove items (at every cuckoo location), compacting each touched
        bin, then rebuild the touched bundle indices.

        Vectorized: one batch bin lookup marks doomed positions; touched
        bins are gathered as [T, C·K, fpi] rows, stably compacted with one
        argsort (root order within a bin is immaterial — they are the
        unordered roots of the matching polynomial), and scattered back."""
        self._require_mutable()
        self._placement = None  # stale after mutation; rebind() refuses
        p = self.params
        K = p.table_params.max_items_per_bin
        fpi = p.felts_per_item
        slots, _, felts = self._locations_felts(items)
        slots = slots.astype(np.int64)
        c_f, d_f = self._find_entries(slots, felts)
        hit = c_f >= 0
        hs, hc, hd = slots[hit], c_f[hit], d_f[hit]
        if not len(hs):
            self._rebuild_bundles(set())
            return self.stats
        C = self._roots.shape[1]

        # distinct doomed positions per touched slot (duplicate (slot,
        # felts) pairs in one batch mark the same position once)
        su, inv = np.unique(hs, return_inverse=True)
        pos_key = inv * (C * K) + hc * K + hd
        pos_key = np.unique(pos_key)
        inv_u, flat_pos = pos_key // (C * K), pos_key % (C * K)
        removed = len(pos_key)

        T = len(su)
        b = su // p.items_per_bundle - self.bundle_range[0]
        lane0 = (su % p.items_per_bundle) * fpi
        cidx = (np.arange(C * K) // K)[None, :]
        didx = (np.arange(C * K) % K)[None, :]
        lanes = lane0[:, None, None] + np.arange(fpi)[None, None, :]
        flat = self._roots[
            b[:, None, None], cidx[:, :, None], didx[:, :, None], lanes
        ]  # [T, C*K, fpi]
        tot0 = self._counts[b, :, lane0].sum(axis=1).astype(np.int64)
        keep = np.arange(C * K)[None, :] < tot0[:, None]
        keep[inv_u, flat_pos] = False
        order = np.argsort(~keep, kind="stable", axis=1)
        compacted = np.take_along_axis(flat, order[:, :, None], axis=1)
        n_kept = keep.sum(axis=1)
        compacted[np.arange(C * K)[None, :] >= n_kept[:, None]] = 0
        self._roots[
            b[:, None, None], cidx[:, :, None], didx[:, :, None], lanes
        ] = compacted
        self._set_slot_totals(su, n_kept)
        self._rebuild_bundles(set(np.unique(b).tolist()))
        self._refresh_stats(-removed)
        return self.stats

    def _rebuild_bundles(self, bundles) -> None:
        """Re-run the device cache build for the given bundle indices only,
        writing into the resident (donated) cache buffer."""
        if not bundles:
            return
        p = self.params
        C = self._roots.shape[1]
        lvl = self.eval_lvl
        uses_ps = self.ps_const_polys is not None
        planes = self.coeff_cache.shape[2]
        # the initial build registered these under its cache-chunk size cc;
        # incremental rebuilds run at shapes where cc == C (the sub-chunked
        # 256M-slice builds are bulk-load-only)
        fn = self.bfv._jit_cache[("db_build", lvl, uses_ps, C, planes)]
        place = self.bfv._jit_cache[("db_place", lvl, uses_ps, C, planes)]
        for b in sorted(bundles):
            out = fn(jnp.asarray(self._roots[b]), jnp.asarray(self._counts[b]))
            self.coeff_cache = place(
                self.coeff_cache, out[0], np.int32(b), np.int32(0)
            )
            self.const_slots = self.const_slots.at[b].set(out[1])
            if uses_ps:
                self.ps_const_polys = self.ps_const_polys.at[b].set(out[2])

    def _refresh_stats(self, delta_items: int) -> None:
        p = self.params
        K = p.table_params.max_items_per_bin
        B, C = self._counts.shape[0], self._counts.shape[1]
        b0, b1 = self.bundle_range
        sidx = np.arange(
            b0 * p.items_per_bundle,
            min(p.table_params.table_size, b1 * p.items_per_bundle),
        )
        sb = sidx // p.items_per_bundle - b0
        sl = (sidx % p.items_per_bundle) * p.felts_per_item
        slot_counts = self._counts[sb, :, sl].sum(axis=1)
        per_bundle = np.zeros(B, dtype=np.int64)
        for c in range(C):
            used = np.bincount(
                sb[self._counts[sb, c, sl] > 0], minlength=B
            ) > 0
            per_bundle[used] += 1
        self.stats = DbStats(
            n_items=self.stats.n_items + delta_items,
            n_insertions=int(slot_counts.sum()),
            n_caches=C,
            cache_counts=per_bundle,
            max_bin_load=int(slot_counts.max()) if len(slot_counts) else 0,
        )

    # ------------------------------------------------------------------
    # checkpoint (the reference's FlatBuffers ReceiverDB save/load,
    # receiver_db.cpp:1182-1429: params + OPRF key + eval caches; our OPRF
    # key is the KKRT sender state when the interactive backend is in use)
    # ------------------------------------------------------------------
    def save(self, path: str) -> None:
        import json
        import os

        import jax

        os.makedirs(path, exist_ok=True)
        with open(os.path.join(path, "params.json"), "w") as f:
            f.write(self.params.to_json())
        np.save(os.path.join(path, "coeff_cache.npy"), jax.device_get(self.coeff_cache))
        np.save(os.path.join(path, "const_slots.npy"), jax.device_get(self.const_slots))
        if self.ps_const_polys is not None:
            np.save(
                os.path.join(path, "ps_const_polys.npy"),
                jax.device_get(self.ps_const_polys),
            )
        if self.label_cache is not None:
            np.save(os.path.join(path, "label_cache.npy"), jax.device_get(self.label_cache))
            np.save(
                os.path.join(path, "label0_slots.npy"), jax.device_get(self.label0_slots)
            )
        meta = {
            "eval_lvl": int(self.eval_lvl),
            "result_lvl": int(self.result_lvl),
            "bundle_range": list(self.bundle_range),
            "cache_range": (
                list(self.cache_range) if self.cache_range is not None else None
            ),
            "n_items": self.stats.n_items,
            "n_insertions": self.stats.n_insertions,
            "n_caches": self.stats.n_caches,
            "cache_counts": self.stats.cache_counts.tolist(),
            "max_bin_load": self.stats.max_bin_load,
        }
        with open(os.path.join(path, "meta.json"), "w") as f:
            json.dump(meta, f)
        oprf = self.oprf
        if hasattr(oprf, "q_cols") and hasattr(oprf, "s_pack"):
            np.save(os.path.join(path, "oprf_q_cols.npy"), oprf.q_cols)
            np.save(os.path.join(path, "oprf_s_pack.npy"), oprf.s_pack)

    @staticmethod
    def load(path: str, oprf: Optional[OprfBackend] = None) -> "ReceiverDB":
        import json
        import os

        params = PSUParams.load_file(os.path.join(path, "params.json"))
        if oprf is None:
            qc = os.path.join(path, "oprf_q_cols.npy")
            if os.path.exists(qc):
                from apsu_tpu.mpc.kkrt import KkrtSender

                oprf = KkrtSender.__new__(KkrtSender)
                oprf.q_cols = np.load(qc)
                oprf.s_pack = np.load(os.path.join(path, "oprf_s_pack.npy"))
                oprf.n_slots = params.table_params.table_size
            else:
                raise ValueError("checkpoint has no OPRF state; pass one")
        with open(os.path.join(path, "meta.json")) as f:
            meta = json.load(f)
        cr = meta.get("cache_range")
        db = ReceiverDB(
            params, oprf,
            bundle_range=tuple(meta.get("bundle_range", ())) or None,
            cache_range=tuple(cr) if cr else None,
        )
        db.coeff_cache = jnp.asarray(np.load(os.path.join(path, "coeff_cache.npy")))
        db.const_slots = jnp.asarray(np.load(os.path.join(path, "const_slots.npy")))
        pcp = os.path.join(path, "ps_const_polys.npy")
        db.ps_const_polys = jnp.asarray(np.load(pcp)) if os.path.exists(pcp) else None
        lcp = os.path.join(path, "label_cache.npy")
        if os.path.exists(lcp):
            db.label_cache = jnp.asarray(np.load(lcp))
            db.label0_slots = jnp.asarray(
                np.load(os.path.join(path, "label0_slots.npy"))
            )
        db.eval_lvl = meta["eval_lvl"]
        db.result_lvl = meta["result_lvl"]
        db.stats = DbStats(
            n_items=meta["n_items"],
            n_insertions=meta["n_insertions"],
            n_caches=meta["n_caches"],
            cache_counts=np.asarray(meta["cache_counts"]),
            max_bin_load=meta["max_bin_load"],
        )
        return db
