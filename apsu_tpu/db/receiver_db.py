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
from apsu_tpu.engine.interpolate import polyn_with_roots
from apsu_tpu.hash.encoding import felts_from_items
from apsu_tpu.hash.items import LocFuncs
from apsu_tpu.mpc.oprf import OprfBackend


@dataclasses.dataclass
class DbStats:
    n_items: int
    n_insertions: int
    n_caches: int            # alpha_max_cache_count
    cache_counts: np.ndarray  # [B] caches actually used per bundle index
    max_bin_load: int


class ReceiverDB:
    def __init__(
        self,
        params: PSUParams,
        oprf: OprfBackend,
        bfv: Optional[BfvContext] = None,
        loc_seed: bytes = b"apsu-loc",
    ):
        self.params = params
        self.oprf = oprf
        self.bfv = bfv or BfvContext(params.seal_params)
        tp = params.table_params
        self.locs = LocFuncs(tp.table_size, tp.hash_func_count, loc_seed)
        self.coeff_cache: Optional[jnp.ndarray] = None  # [B, C, K+1, L, N] NTT mont
        self.stats: Optional[DbStats] = None
        self._raw_coeff_slots: Optional[np.ndarray] = None  # kept until strip()

    # ------------------------------------------------------------------
    def set_data(self, items: np.ndarray, eval_level: Optional[int] = None) -> DbStats:
        """items: [n, 2] uint64 128-bit hashed items. Builds the eval cache."""
        p = self.params
        tp = p.table_params
        n = items.shape[0]
        h = tp.hash_func_count
        fpi = p.felts_per_item
        K = tp.max_items_per_bin
        B = p.bundle_idx_count
        N = p.poly_degree
        ipb = p.items_per_bundle

        # 1. all cuckoo locations, flattened (item, slot) pairs
        locs = self.locs.locations(items)          # [n, h]
        slots = locs.reshape(-1)                   # [n*h]
        rep = np.repeat(items, h, axis=0)

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

        # 2. slot-bound OPRF, 3. felts
        prf = self.oprf.eval(rep, slots)
        felts = felts_from_items(prf, fpi, p.item_bit_count_per_felt)  # [m, fpi]

        # 4. per-slot ranks -> (cache, depth)
        order = np.argsort(slots, kind="stable")
        ss = slots[order]
        first = np.searchsorted(ss, ss, side="left")
        ranks = np.empty(len(ss), dtype=np.int64)
        ranks[order] = np.arange(len(ss)) - first
        cache_idx = ranks // K
        depth = ranks % K
        C = int(cache_idx.max()) + 1 if len(cache_idx) else 1

        # 5. dense roots tensor + per-lane counts
        bundle_idx = slots // ipb
        lane = (slots % ipb) * fpi
        roots = np.zeros((B, C, K, N), dtype=np.uint32)
        counts = np.zeros((B, C, N), dtype=np.int32)
        for f in range(fpi):
            roots[bundle_idx, cache_idx, depth, lane + f] = felts[:, f]
        slot_counts = np.bincount(slots, minlength=tp.table_size)
        per_bundle_caches = np.zeros(B, dtype=np.int64)
        sidx = np.arange(tp.table_size)
        sb = sidx // ipb
        sl = (sidx % ipb) * fpi
        for c in range(C):
            cnt_c = np.clip(slot_counts - c * K, 0, K).astype(np.int32)
            for f in range(fpi):
                counts[sb, c, sl + f] = cnt_c
            used = np.bincount(sb[cnt_c > 0], minlength=B) > 0
            per_bundle_caches[used] += 1

        # 6. device build of the evaluation cache
        self._build_cache(roots, counts, eval_level)
        self.stats = DbStats(
            n_items=n,
            n_insertions=len(slots),
            n_caches=C,
            cache_counts=per_bundle_caches,
            max_bin_load=int(slot_counts.max()) if len(slot_counts) else 0,
        )
        if self.stats.max_bin_load > K * C:
            raise ValueError("bin overflow beyond cache capacity")
        return self.stats

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

        from apsu_tpu.ops.polyeval import DEG_CHUNK

        # Zero-pad the coefficient-plane axis so (a) it aligns to the Pallas
        # degree chunk and (b) every PS gather index nh·ph + i (i ≤ ℓ) is
        # in-bounds on a REAL zero plane — when K % ph < ℓ the last chunk
        # reads planes past K+1, which must exist and be zero (ADVICE r1).
        if uses_ps:
            ph = ps_low + 1
            nh = K // ph
            min_planes = max(K + 1, nh * ph + ps_low + 1)
            const_idx = np.arange(0, nh + 1) * ph
        else:
            min_planes = K + 1
        planes = -(-min_planes // DEG_CHUNK) * DEG_CHUNK
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
        # full cache and OOM the 16 GB chip.
        fn = self.bfv._jitted(("db_build", lvl, uses_ps, C, planes), build)
        place_key = ("db_place", lvl, uses_ps, C, planes)
        if place_key not in self.bfv._jit_cache:
            self.bfv._jit_cache[place_key] = jax.jit(
                lambda buf, chunk, b: jax.lax.dynamic_update_slice_in_dim(
                    buf, chunk[None], b, axis=0
                ),
                donate_argnums=0,
            )
        place = self.bfv._jit_cache[place_key]
        Lq = self.bfv.levels[lvl].k
        cache_buf = jnp.zeros((B, C, planes, Lq, N), jnp.uint32)
        consts = []
        ps_consts = []
        for b in range(B):
            out = fn(jnp.asarray(roots[b]), jnp.asarray(counts[b]))
            cache_buf = place(cache_buf, out[0], b)
            consts.append(out[1])
            if uses_ps:
                ps_consts.append(out[2])
        self.coeff_cache = cache_buf
        self.const_slots = jnp.stack(consts)
        self.ps_const_polys = jnp.stack(ps_consts) if uses_ps else None
        self.eval_lvl = lvl
        self.result_lvl = self.result_level() if uses_ps else lvl

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
    def eval_level(self) -> int:
        """Smallest modulus level with enough room for the matching-poly sum.

        Needs log2(Q_l) ≳ 2·log2 t + ½·log2(N/12) + log2(K+1) + margin —
        the invariant-noise estimate for a degree-K ct×pt dot product over
        batch-encoded plaintexts.
        """
        import math

        sp = self.params.seal_params
        t_bits = sp.plain_modulus.bit_length()
        need = (
            2 * t_bits
            - 1
            + 0.5 * (math.log2(self.params.poly_degree) - 3.58)
            + math.log2(self.params.table_params.max_items_per_bin + 1)
            + 8
        )
        bits = 0
        for lvl, q in enumerate(self.bfv.q_primes, start=1):
            bits += q.bit_length()
            if bits >= need:
                return lvl
        return len(self.bfv.q_primes)

    def ps_level(self) -> int:
        """Evaluation level for the PS path: the outer ct×ct products need
        one multiply's growth (~log2(N·t)) of room above the result level."""
        import math

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
        and relinearized — needs roughly inner_need + log2(N·t) + margin bits."""
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
        need = self._result_need()
        bits = 0
        for lvl, q in enumerate(self.bfv.q_primes, start=1):
            bits += q.bit_length()
            if bits >= need:
                return lvl
        return len(self.bfv.q_primes)

    def strip(self) -> None:
        """Drop raw data, keep only the evaluation cache (receiver_db.cpp:828)."""
        self._raw_coeff_slots = None

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
        meta = {
            "eval_lvl": int(self.eval_lvl),
            "result_lvl": int(self.result_lvl),
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
        db = ReceiverDB(params, oprf)
        db.coeff_cache = jnp.asarray(np.load(os.path.join(path, "coeff_cache.npy")))
        db.const_slots = jnp.asarray(np.load(os.path.join(path, "const_slots.npy")))
        pcp = os.path.join(path, "ps_const_polys.npy")
        db.ps_const_polys = jnp.asarray(np.load(pcp)) if os.path.exists(pcp) else None
        with open(os.path.join(path, "meta.json")) as f:
            meta = json.load(f)
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
