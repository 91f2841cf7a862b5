#!/usr/bin/env python
"""Assemble and query the FULL 256M-4096 DB through the partition grid,
time-multiplexed on one chip (VERDICT r4 next-#4).

The full config (parameters/256M-4096.json) needs ~11 three-cache
partitions (~33 caches of K=4000); one v5e holds one partition at a time
(BENCH_256M_SLICE.json: 3 caches = 6.67 GB + build temporaries).  This
tool is the whole grid on one chip, sequentially:

  1. place 2^28 items ONCE (ReceiverDB.place_data — the placement is
     partition-independent; the r4 slice re-placed per partition),
  2. for each cache-range partition: materialize it from the shared
     placement (build_partition), run the REAL encrypted 4096-item query
     through the production 310-degree PS pipeline, verify every filled
     query slot against the partition's root tensors (exactness oracle),
     bank the decrypted slot matrix + masks, release the HBM cache,
  3. run the PEQT + chosen-OT endgame over the ASSEMBLED matrix
     (query-thread vs db-thread over an in-process duplex — the same
     endgame code the production wire session runs, api/session.py) and
     check the transferred set against ground truth.

With every partition covered the transferred set IS the exact difference
set X \\ Y of the full 256M DB — the first complete end-to-end 256M
evaluation.  --max-build-seconds bounds the partition loop (the artifact
then reports coverage honestly and the endgame oracle restricts to the
covered caches).

Run on the chip:
    timeout 28000 python tools/run_256m_grid.py [--parts all]
Shakeout (CPU): --items 500000 --params parameters/1M-2048-cmp.json \
    --queries 512 --caches-per-part 1

Reference match: receiver_osn.cpp:188-205 (caches-per-bundle scaling),
cli/receiver/receiver.cpp:76-119 (whole-DB serving).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

T0 = time.perf_counter()


def log(msg: str) -> None:
    print(f"[grid +{time.perf_counter() - T0:7.1f}s] {msg}", file=sys.stderr,
          flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--items", type=int, default=1 << 28)
    ap.add_argument("--caches-per-part", type=int, default=3)
    ap.add_argument("--parts", default="all",
                    help="'all' or the number of partitions to run")
    ap.add_argument("--first-cache", type=int, default=0,
                    help="start the partition sweep at this cache index "
                         "(supplement a budget-truncated earlier run; the "
                         "endgame + oracle then cover [first_cache, ...))")
    ap.add_argument("--queries", type=int, default=4096)
    ap.add_argument("--planted", type=int, default=256)
    ap.add_argument("--params", default="parameters/256M-4096.json")
    ap.add_argument("--out-json", default="BENCH_256M_GRID.json")
    ap.add_argument("--max-build-seconds", type=float, default=18000.0,
                    help="stop adding partitions when the build budget runs out")
    ap.add_argument("--peqt", default="osn", choices=["osn", "ddh"])
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

    from apsu_tpu.api.parties import (
        QueryRequest, Receiver, Sender, _pow_mod, _slots_to_item_blocks,
    )
    from apsu_tpu.core.params import PSUParams
    from apsu_tpu.db.measured_levels import query_level
    from apsu_tpu.db.receiver_db import ReceiverDB
    from apsu_tpu.mpc.duplex import pipe_pair
    from apsu_tpu.mpc.endgame import (
        endgame_db_side, endgame_query_side, felts_to_blocks,
    )
    from apsu_tpu.mpc.oprf import DebugOprf
    from apsu_tpu.mpc.prg import CsRng
    from apsu_tpu.ops.polyeval import plane_count

    params = PSUParams.load_file(args.params)
    tp, qp = params.table_params, params.query_params
    fpi = params.felts_per_item
    n = args.items
    B = params.bundle_idx_count
    N = params.poly_degree
    t_mod = params.seal_params.plain_modulus
    ipb = params.items_per_bundle
    Cp = args.caches_per_part

    # DebugOprf: uniform shared-key slot-bound PRF — keeps the real
    # hash→OPRF→felts→build→query→decrypt→PEQT→OT pipeline while skipping
    # a 2^28-point interactive KKRT session this single-process tool
    # cannot host; the KKRT wire flow is proven at 16.7M in
    # MULTIWORKER_16M.json (same code path, mpc/kkrt.py).
    oprf = DebugOprf(0x256AD)
    rng = np.random.default_rng(0x256AD)

    log(f"generating {n} random 128-bit items")
    items = rng.integers(0, 1 << 64, size=(n, 2), dtype=np.uint64)

    placer = ReceiverDB(params, oprf)
    chk = jax.jit(lambda o: jnp.sum(o, dtype=jnp.uint32))

    # ---- pre-compile the query pipeline on a synthetic cache ----------
    # (the remote compile service drops long connections; pay the compile
    # risk FIRST — all real partitions then reuse the executables)
    log("pre-compiling the query pipeline on a synthetic cache")
    t0 = time.perf_counter()
    lvl_ = placer.ps_level()
    L_ = placer.bfv.levels[lvl_].k
    K_ = tp.max_items_per_bin
    nh_ = K_ // (qp.ps_low_degree + 1)
    planes_ = plane_count(K_, qp.ps_low_degree)
    key = jax.random.PRNGKey(1)
    k1, k2 = jax.random.split(key)
    mk = lambda k, shape, hi: jax.random.randint(
        k, shape, 0, hi, dtype=jnp.int32
    ).astype(jnp.uint32)
    placer.coeff_cache = mk(k1, (B, Cp, planes_, L_, N), 1 << 20)
    placer.ps_const_polys = mk(k2, (B, Cp, nh_ + 1, N), int(t_mod))
    placer.const_slots = None
    placer.eval_lvl = lvl_
    placer.result_lvl = placer.result_level()
    wrng = CsRng(b"256m-grid-prewarm-key-001")
    sk_ = placer.bfv.gen_secret_key(wrng)
    ql_ = query_level(params, len(placer.bfv.q_primes))
    rk_ = placer.bfv.gen_relin_key(sk_, wrng, level=ql_)
    qvec_ = np.asarray(
        wrng.integers(1, t_mod, size=(B, N), dtype=np.uint64)
    ).astype(np.uint32)
    plist_ = tuple(qp.query_powers)
    st_ = np.stack(
        [_pow_mod(qvec_.astype(np.uint64), s, t_mod).astype(np.uint32)
         for s in plist_]
    )
    ct_ = placer.bfv.encrypt_symmetric(
        placer.bfv.encode(st_), sk_, wrng, level=ql_
    )
    req_ = QueryRequest(power_list=plist_, powers_data=ct_.data,
                        relin_key=rk_.ksk)
    recv_ = Receiver(params, placer, rng=CsRng(b"256m-grid-prewarm-rcv-01"))
    r_ = recv_.run_query(req_)
    jax.device_get(chk(r_.results))
    del r_, recv_, req_, ct_
    placer.coeff_cache = None
    placer.ps_const_polys = None
    import gc

    gc.collect()
    prewarm_s = time.perf_counter() - t0
    log(f"pre-compile done in {prewarm_s:.1f}s")

    # ---- placement, ONCE ---------------------------------------------
    log(f"placing {n} items ({n * tp.hash_func_count} pairs) — shared "
        "across all partitions")
    t0 = time.perf_counter()
    C_total = placer.place_data(items, assume_unique=True)
    place_s = time.perf_counter() - t0
    n_parts_total = -(-C_total // Cp)
    log(f"placement done in {place_s:.1f}s: {C_total} caches total "
        f"-> {n_parts_total} partitions of {Cp}")

    # ---- encrypted query (partition-independent) ----------------------
    planted_idx = rng.choice(n, size=args.planted, replace=False)
    fresh = rng.integers(0, 1 << 64, size=(args.queries - args.planted, 2),
                         dtype=np.uint64)
    qitems = np.concatenate([items[planted_idx], fresh])
    rng.shuffle(qitems)
    sender = Sender(params, oprf, rng=CsRng(b"256m-grid-sender-key-0001"))
    log(f"creating encrypted query ({args.queries} items, "
        f"{args.planted} planted)")
    req = sender.create_query(qitems)
    qf = sender._query_felts
    filled = np.asarray(sender.cuckoo.filled)

    want_parts = (
        n_parts_total if args.parts == "all" else int(args.parts)
    )

    # ---- partition loop ----------------------------------------------
    mats, masks, partitions = [], [], []
    # ground-truth per covered cache: want[s, c_global]
    want_cols = {}
    budget_t0 = time.perf_counter()
    first_part = args.first_cache // Cp
    for pidx in range(first_part,
                      min(first_part + want_parts, n_parts_total)):
        c0 = pidx * Cp
        c1 = min(C_total, c0 + Cp)
        if pidx and (time.perf_counter() - budget_t0) > args.max_build_seconds:
            log(f"build budget exhausted after {pidx} partitions — "
                "proceeding to the endgame on the covered caches")
            break
        log(f"partition {pidx}: materializing caches [{c0}, {c1})")
        t0 = time.perf_counter()
        db_p = placer.build_partition((c0, c1))
        jax.device_get(chk(db_p.coeff_cache))
        build_s = time.perf_counter() - t0
        cache_gb = int(np.prod(db_p.coeff_cache.shape)) * 4 / 2**30
        log(f"partition {pidx}: built in {build_s:.1f}s "
            f"({cache_gb:.2f} GB cache)")

        recv = Receiver(params, db_p,
                        rng=CsRng(b"256m-grid-recv-" + bytes([pidx])))
        t0 = time.perf_counter()
        resp = recv.run_query(req)
        jax.device_get(chk(resp.results))
        q1_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        resp = recv.run_query(req)
        jax.device_get(chk(resp.results))
        q2_s = time.perf_counter() - t0
        log(f"partition {pidx}: query {q1_s:.2f}s / warm {q2_s:.3f}s "
            f"({B * (c1 - c0) / q2_s:.1f} bundles/s)")

        mat = sender.extract_matrix(resp)        # [B, Cp, N] mod t
        mask = recv.last_mask
        got_match = mat == mask

        # oracle vs the partition's root tensors
        roots, counts = db_p._roots, db_p._counts
        mism = nmatch = 0
        for s in np.nonzero(filled)[0]:
            b, lane = s // ipb, (s % ipb) * fpi
            want = np.zeros(c1 - c0, dtype=bool)
            for c in range(c1 - c0):
                depth = counts[b, c, lane]
                if depth:
                    eq = np.ones(depth, dtype=bool)
                    for f in range(fpi):
                        eq &= roots[b, c, :depth, lane + f] == qf[s, f]
                    want[c] = bool(eq.any())
            got = got_match[b, :, lane : lane + fpi].all(axis=1)
            nmatch += int(want.sum())
            if not np.array_equal(want, got):
                mism += 1
            want_cols.setdefault(s, np.zeros(0, bool))
            want_cols[s] = np.concatenate([want_cols[s], want])
        assert mism == 0, f"partition {pidx}: {mism} slots disagree"
        log(f"partition {pidx}: oracle OK, {nmatch} true matches in "
            "this cache range")

        mats.append(mat)
        masks.append(mask)
        partitions.append({
            "part": pidx, "caches": [c0, c1],
            "build_s": round(build_s, 1),
            "cache_gb": round(cache_gb, 2),
            "query_first_s": round(q1_s, 2),
            "query_warm_s": round(q2_s, 3),
            "bundles_per_sec": round(B * (c1 - c0) / q2_s, 1),
            "true_matches": nmatch,
        })
        # free the HBM cache before the next partition
        db_p.coeff_cache = None
        db_p.ps_const_polys = None
        del db_p, recv, resp
        gc.collect()

        # incremental artifact (a dropped tunnel mid-run keeps the bank)
        with open(args.out_json + ".partial", "w") as f:
            json.dump({"partitions": partitions,
                       "caches_covered": int(sum(
                           p["caches"][1] - p["caches"][0]
                           for p in partitions)),
                       "caches_total": int(C_total)}, f)

    C_cov = sum(p["caches"][1] - p["caches"][0] for p in partitions)
    log(f"{len(partitions)} partitions done: {C_cov}/{C_total} caches")

    # ---- endgame over the assembled matrix ----------------------------
    # the same PEQT + chosen-OT code the production wire session runs
    # (api/session.py): query thread holds the decrypted matrix, db
    # thread the masks; transferred = filled & not matched anywhere
    mat_full = np.concatenate(mats, axis=1)      # [B, C_cov, N]
    mask_full = np.concatenate(masks, axis=1)
    qblocks = felts_to_blocks(
        _slots_to_item_blocks(params, mat_full), params.item_bit_count_per_felt
    )
    dblocks = felts_to_blocks(
        _slots_to_item_blocks(params, mask_full), params.item_bit_count_per_felt
    )
    payload_by_slot = (
        np.ascontiguousarray(sender.cuckoo.table).view(np.uint8).reshape(-1, 16)
    )
    a, bch = pipe_pair()
    out, errs = {}, []

    def q_side():
        try:
            endgame_query_side(
                a, qblocks, payload_by_slot, filled,
                CsRng(b"256m-grid-endgame-query-1"), peqt=args.peqt,
            )
        except Exception as e:  # pragma: no cover
            errs.append(e)

    def d_side():
        try:
            out["got"] = endgame_db_side(
                bch, dblocks, CsRng(b"256m-grid-endgame-db-0001"),
                peqt=args.peqt,
            )
        except Exception as e:  # pragma: no cover
            errs.append(e)

    log(f"endgame ({args.peqt} PEQT + chosen OT) over "
        f"[{C_cov}, {tp.table_size}] matrix")
    t0 = time.perf_counter()
    tq, td = threading.Thread(target=q_side), threading.Thread(target=d_side)
    tq.start(); td.start(); tq.join(); td.join()
    endgame_s = time.perf_counter() - t0
    if errs:
        raise errs[0]

    got_items = {
        tuple(int(x) for x in row)
        for row in np.ascontiguousarray(out["got"])
        .view(np.uint64).reshape(-1, 2).tolist()
    }
    # ground truth restricted to covered caches: transferred = filled
    # slots whose item matches NOWHERE in the covered caches.  With full
    # coverage this is exactly X \ Y of the full 256M set.
    want_items = set()
    for s in np.nonzero(filled)[0]:
        if not want_cols.get(s, np.zeros(0, bool)).any():
            it = sender.cuckoo.table[s]
            want_items.add((int(it[0]), int(it[1])))
    assert got_items == want_items, (
        f"endgame oracle FAILED: |got|={len(got_items)} "
        f"|want|={len(want_items)} |sym-diff|="
        f"{len(got_items ^ want_items)}"
    )
    full = C_cov == C_total
    log(f"endgame OK in {endgame_s:.1f}s: {len(got_items)} items "
        f"transferred{' (FULL 256M difference set)' if full else ''}")

    result = {
        "config": os.path.basename(args.params),
        "n_items": n,
        "queries": args.queries,
        "planted": args.planted,
        "caches_total": int(C_total),
        "caches_covered": int(C_cov),
        "full_coverage": bool(full),
        "placement_s": round(place_s, 1),
        "prewarm_compile_s": round(prewarm_s, 1),
        "partitions": partitions,
        "sum_partition_build_s": round(
            sum(p["build_s"] for p in partitions), 1
        ),
        "sum_partition_query_warm_s": round(
            sum(p["query_warm_s"] for p in partitions), 3
        ),
        "endgame_s": round(endgame_s, 1),
        "endgame_peqt": args.peqt,
        "transferred": len(got_items),
        "oracle": "exact: per-partition roots + endgame difference set",
        "tool": " ".join(sys.argv),
        "date": time.strftime("%Y-%m-%d"),
    }
    with open(args.out_json + ".partial", "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
