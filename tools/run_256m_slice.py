#!/usr/bin/env python
"""Execute ONE cache-range partition of 256M-4096 FOR REAL on the chip.

The north-star config (parameters/256M-4096.json: 2^28-item DB, 4096
queries, ps_low_degree=310) has a ~90 GB full eval cache (~34 caches of
K=4000 per bin at L=7) — a multi-host workload (reference scaling axis:
receiver_osn.cpp:188-205; SURVEY §2.7 C4).  One worker's 1/8 share is a
(3-bundle × 4-cache) slice ≈ 10.4 GB, which fits a single v5e's 16 GB HBM.

This tool builds that slice from 2^28 REAL placed items (host cuckoo
placement of all 768M (item, slot) pairs, then the device polynomial
build), checkpoints it, and runs a REAL encrypted 4096-item query through
the production PS pipeline against it, verifying planted matches against
the partition's root tensors (exactness oracle, not a smoke test).

Prints one JSON line with build/query/checkpoint timings and sizes.

Run on the chip (budget ~45-75 min; compile cache helps repeat runs):

    timeout 5400 python tools/run_256m_slice.py \
        [--items 268435456] [--caches 4] [--queries 4096] [--out /tmp/s.npz]

Smaller shakeout (e.g. CPU): --items 1000000 --caches 2 --queries 512.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

T0 = time.perf_counter()


def log(msg: str) -> None:
    print(f"[256m +{time.perf_counter() - T0:7.1f}s] {msg}", file=sys.stderr,
          flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--items", type=int, default=1 << 28)
    ap.add_argument("--caches", type=int, default=4,
                    help="cache-range width of the slice (full DB ~34)")
    ap.add_argument("--queries", type=int, default=4096)
    ap.add_argument("--planted", type=int, default=256,
                    help="query items drawn from the DB (the rest are fresh)")
    ap.add_argument("--params", default="parameters/256M-4096.json")
    ap.add_argument("--out", default="/tmp/apsu_256m_slice.npz")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from apsu_tpu.api.parties import Receiver, Sender
    from apsu_tpu.core.params import PSUParams
    from apsu_tpu.db.receiver_db import ReceiverDB
    from apsu_tpu.mpc.oprf import DebugOprf
    from apsu_tpu.mpc.prg import CsRng

    params = PSUParams.load_file(args.params)
    tp = params.table_params
    fpi = params.felts_per_item
    n = args.items

    # OPRF outputs are uniform 128-bit strings; DebugOprf (the framework's
    # shared-key functional stand-in, mpc/oprf.py:135) keeps the real
    # hash→OPRF→felts→build pipeline while skipping a 2^28-point
    # interactive KKRT session this single-process tool cannot host.
    oprf = DebugOprf(0x256AD)
    rng = np.random.default_rng(0x256AD)

    log(f"generating {n} random 128-bit items")
    items = rng.integers(0, 1 << 64, size=(n, 2), dtype=np.uint64)

    db = ReceiverDB(params, oprf, cache_range=(0, args.caches))

    # compile the query pipeline FIRST against a synthetic same-shape
    # cache: the remote compile service drops connections unpredictably
    # (a 310-power wavefront compile died 33 min AFTER a 31-min build on
    # 2026-08-20), so pay the compile risk before the expensive build —
    # the real query then reuses the in-process executables (identical
    # shapes/jit keys)
    if not os.environ.get("APSU_SLICE_NO_PREWARM"):
        from apsu_tpu.api.parties import QueryRequest, _pow_mod
        from apsu_tpu.core.params import PSUParams as _P
        from apsu_tpu.db.measured_levels import query_level
        from apsu_tpu.ops.polyeval import plane_count

        log("pre-compiling the query pipeline on a synthetic cache")
        t0 = time.perf_counter()
        tp_ = params.table_params
        qp_ = params.query_params
        B_ = params.bundle_idx_count
        K_, N_ = tp_.max_items_per_bin, params.poly_degree
        t_ = params.seal_params.plain_modulus
        lvl_ = db.ps_level()
        L_ = db.bfv.levels[lvl_].k
        nh_ = K_ // (qp_.ps_low_degree + 1)
        planes_ = plane_count(K_, qp_.ps_low_degree)
        import jax.numpy as jnp_

        key = jax.random.PRNGKey(1)
        k1, k2 = jax.random.split(key)
        mk = lambda k, shape, hi: jax.random.randint(
            k, shape, 0, hi, dtype=jnp_.int32
        ).astype(jnp_.uint32)
        db.coeff_cache = mk(k1, (B_, args.caches, planes_, L_, N_), 1 << 20)
        db.ps_const_polys = mk(k2, (B_, args.caches, nh_ + 1, N_), int(t_))
        db.const_slots = None
        db.eval_lvl = lvl_
        db.result_lvl = db.result_level()
        wrng = CsRng(b"256m-slice-prewarm-key-01")
        sk_ = db.bfv.gen_secret_key(wrng)
        ql_ = query_level(params, len(db.bfv.q_primes))
        rk_ = db.bfv.gen_relin_key(sk_, wrng, level=ql_)
        qvec_ = np.asarray(
            wrng.integers(1, t_, size=(B_, N_), dtype=np.uint64)
        ).astype(np.uint32)
        plist_ = tuple(qp_.query_powers)
        st_ = np.stack(
            [
                _pow_mod(qvec_.astype(np.uint64), s, t_).astype(np.uint32)
                for s in plist_
            ]
        )
        ct_ = db.bfv.encrypt_symmetric(db.bfv.encode(st_), sk_, wrng, level=ql_)
        req_ = QueryRequest(
            power_list=plist_, powers_data=ct_.data, relin_key=rk_.ksk
        )
        recv_ = Receiver(params, db, rng=CsRng(b"256m-slice-prewarm-rcv-1"))
        chk0 = jax.jit(lambda o: jnp.sum(o, dtype=jnp.uint32))
        r_ = recv_.run_query(req_)
        jax.device_get(chk0(r_.results))
        del r_, recv_, req_, ct_
        db.coeff_cache = None
        db.ps_const_polys = None
        import gc

        gc.collect()
        log(f"pre-compile done in {time.perf_counter() - t0:.1f}s")
    log(f"building cache slice (0, {args.caches}) of "
        f"{params.bundle_idx_count} bundles — host placement of "
        f"{n * tp.hash_func_count} pairs, then device build")
    t0 = time.perf_counter()
    stats = db.set_data(items, assume_unique=True)  # random 128-bit rows
    # force completion (block_until_ready is unreliable over the tunnel)
    chk = jax.jit(lambda o: jnp.sum(o, dtype=jnp.uint32))
    jax.device_get(chk(db.coeff_cache))
    build_s = time.perf_counter() - t0
    cache_bytes = int(np.prod(db.coeff_cache.shape)) * 4
    log(f"build done in {build_s:.1f}s: cache {db.coeff_cache.shape} "
        f"({cache_bytes / 2**30:.2f} GB), max_bin_load {stats.max_bin_load}")

    # ---- real encrypted query --------------------------------------
    qn = args.queries
    planted_idx = rng.choice(n, size=args.planted, replace=False)
    fresh = rng.integers(0, 1 << 64, size=(qn - args.planted, 2),
                         dtype=np.uint64)
    qitems = np.concatenate([items[planted_idx], fresh])
    rng.shuffle(qitems)

    sender = Sender(params, oprf, rng=CsRng(b"256m-slice-sender-key-01"))
    log(f"creating encrypted query ({qn} items, {args.planted} planted)")
    req = sender.create_query(qitems)
    recv = Receiver(params, db, rng=CsRng(b"256m-slice-recv-key-0001"))

    log("first query (compiles the 310-power wavefront + PS eval)")
    t0 = time.perf_counter()
    resp = recv.run_query(req)
    jax.device_get(chk(resp.results))
    first_s = time.perf_counter() - t0
    log(f"first query {first_s:.1f}s")

    warm = []
    for _ in range(2):
        t0 = time.perf_counter()
        resp = recv.run_query(req)
        jax.device_get(chk(resp.results))
        warm.append(time.perf_counter() - t0)
    warm_s = min(warm)
    log(f"warm query {warm_s:.3f}s ({db.coeff_cache.shape[0] * args.caches / warm_s:.1f} bundles/s)")

    # ---- exactness oracle on the partition --------------------------
    # ground truth from the partition's root tensors: a query slot matches
    # cache c iff its felt vector appears at its (bundle, lane) in
    # db._roots[b, c] within the valid count prefix
    log("oracle: decrypt + compare against partition roots")
    mat = sender.extract_matrix(resp)            # [B, C, N] mod t
    mask = recv.last_mask                        # [B, C, N] mod t
    got_match = mat == mask                      # per felt lane
    ipb = params.items_per_bundle
    roots, counts = db._roots, db._counts        # [B, C, K, N], [B, C, N]
    qf = sender._query_felts                     # [table_size, fpi]
    filled = np.asarray(sender.cuckoo.filled)    # [table_size] bool
    checked = mism = nmatch = 0
    for s in np.nonzero(filled)[0]:
        b, lane = s // ipb, (s % ipb) * fpi
        want = np.zeros(args.caches, dtype=bool)
        for c in range(args.caches):
            depth = counts[b, c, lane]
            if depth:
                eq = np.ones(depth, dtype=bool)
                for f in range(fpi):
                    eq &= roots[b, c, :depth, lane + f] == qf[s, f]
                want[c] = bool(eq.any())
        got = got_match[b, :, lane : lane + fpi].all(axis=1)
        checked += 1
        nmatch += int(want.sum())
        if not np.array_equal(want, got):
            mism += 1
            if mism <= 5:
                log(f"MISMATCH slot {s}: want {want.tolist()} got {got.tolist()}")
    log(f"oracle: {checked} filled slots checked, {nmatch} true matches, "
        f"{mism} mismatches")
    assert mism == 0, f"{mism} slots disagree with the partition roots"
    assert nmatch > 0, "no planted item landed in this cache slice"

    # ---- checkpoint --------------------------------------------------
    db.strip()  # drop host mutation state: the checkpoint is the cache
    t0 = time.perf_counter()
    db.save(args.out)
    ckpt_s = time.perf_counter() - t0
    # db.save may write a directory layout — size the whole tree (the
    # first committed 256M run reported 0.00 GB from getsize on the dir)
    if os.path.isdir(args.out):
        ckpt_bytes = sum(
            os.path.getsize(os.path.join(r, f))
            for r, _, fs in os.walk(args.out)
            for f in fs
        )
    else:
        ckpt_bytes = os.path.getsize(args.out)
    log(f"checkpoint {ckpt_bytes / 2**30:.2f} GB in {ckpt_s:.1f}s -> {args.out}")

    print(json.dumps({
        "config": os.path.basename(args.params),
        "n_items": n,
        "slice": {"bundles": params.bundle_idx_count, "caches": args.caches},
        "build_s": round(build_s, 1),
        "cache_gb": round(cache_bytes / 2**30, 2),
        "max_bin_load": int(stats.max_bin_load),
        "query_first_s": round(first_s, 1),
        "query_warm_s": round(warm_s, 3),
        "planted_matches_verified": int(nmatch),
        "checkpoint_s": round(ckpt_s, 1),
        "checkpoint_gb": round(ckpt_bytes / 2**30, 2),
    }))


if __name__ == "__main__":
    main()
