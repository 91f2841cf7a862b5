#!/usr/bin/env python
"""User-style drive of the resident-KKRT rebind path (VERDICT r3 #9).

Starts a resident DB server (serve_clients) on a localhost socket, runs an
ECDH client then a KKRT client against it, checks both unions with the set
oracle, and reports the KKRT session's db_build (the rebind) versus the
initial full build.  Also times ReceiverDB.rebind vs set_data directly.

Run on the chip:  timeout 900 python tools/rebind_drive.py [n_db]
CPU (APSU_DRIVE_CPU=1): the rebind mechanism is host-side (placement reuse
+ PRF + scatter); the device cache build it re-runs is the same code the
bench/slice runs exercise on chip, and the erratic remote compile service
can eat the whole budget on the three cold 100K-1 programs.
"""

import os
import sys
import threading
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
    if os.environ.get("APSU_DRIVE_CPU") == "1":
        jax.config.update("jax_platforms", "cpu")

    from apsu_tpu.api.session import QueryClient, serve_clients
    from apsu_tpu.core.params import PSUParams
    from apsu_tpu.db.receiver_db import ReceiverDB
    from apsu_tpu.mpc.duplex import SocketDuplex, SocketListener
    from apsu_tpu.mpc.oprf import DebugOprf
    from apsu_tpu.mpc.prg import CsRng

    n_db = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    params = PSUParams.load_file(
        os.path.join(os.path.dirname(__file__), "..", "parameters", "100K-1.json")
    )
    rng = np.random.default_rng(7)
    db_items = rng.integers(0, 1 << 64, size=(n_db, 2), dtype=np.uint64)
    queries = []
    for _ in range(2):
        fresh = rng.integers(0, 1 << 64, size=(200, 2), dtype=np.uint64)
        common = db_items[rng.choice(n_db, size=56, replace=False)]
        queries.append(np.concatenate([fresh, common]))

    # --- direct timing: full set_data vs rebind (same item set) ---------
    # warm-up build first so the device build kernels are compiled for
    # BOTH timed paths.  The jit cache is per-BfvContext (bfv.py _jit_cache),
    # so the timed ReceiverDB must SHARE the warm context — a fresh one
    # would retrace and the ratio would mostly measure jit compile, not the
    # placement saving (ADVICE r4, medium)
    warm = ReceiverDB(params, DebugOprf(0x111))
    warm.set_data(db_items)
    shared_bfv = warm.bfv
    del warm
    t0 = time.perf_counter()
    db = ReceiverDB(params, DebugOprf(0xAAA), bfv=shared_bfv)
    db.set_data(db_items)
    full_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    db2 = db.rebind(DebugOprf(0xBBB))
    rebind_s = time.perf_counter() - t0
    ok_stats = db2.stats == db.stats
    print(
        f"[direct] n={n_db}: set_data {full_s:.2f}s  rebind {rebind_s:.2f}s "
        f"({full_s / rebind_s:.2f}x)  stats_equal={ok_stats}",
        flush=True,
    )
    del db, db2

    # --- resident server over real sockets ------------------------------
    lst = SocketListener(0, "127.0.0.1")
    out, errs, tms = {}, [], {}

    def server():
        try:
            out["per_client"] = serve_clients(
                lst, params, db_items, CsRng(b"rebind-drive-server-00001"),
                max_clients=2, timings=tms,
            )
        except Exception as e:  # pragma: no cover - surfaced below
            errs.append(e)

    def clients():
        try:
            c = QueryClient(
                SocketDuplex.connect("127.0.0.1", lst.port),
                rng=CsRng(b"rebind-drive-client-ecdh1"), params=params,
                oprf="ecdh",
            )
            t0 = time.perf_counter()
            c.query(queries[0])
            tms["ecdh_query_s"] = time.perf_counter() - t0
            c.close()
            c = QueryClient(
                SocketDuplex.connect("127.0.0.1", lst.port),
                rng=CsRng(b"rebind-drive-client-kkrt1"), params=params,
                oprf="kkrt",
            )
            t0 = time.perf_counter()
            c.query(queries[1])
            tms["kkrt_query_s"] = time.perf_counter() - t0
            c.close()
        except Exception as e:
            errs.append(e)

    ts, tc = threading.Thread(target=server), threading.Thread(target=clients)
    ts.start(); tc.start(); tc.join(); ts.join()
    lst.close()
    if errs:
        raise errs[0]

    dbs = {(int(a), int(b)) for a, b in db_items.tolist()}
    for i, client in enumerate(out["per_client"]):
        got = set()
        for g in client:
            got |= {
                (int(a), int(b))
                for a, b in np.ascontiguousarray(g)
                .view(np.uint64)
                .reshape(-1, 2)
                .tolist()
            }
        want = {(int(a), int(b)) for a, b in queries[i].tolist()} - dbs
        assert got == want, f"client {i}: union oracle FAILED"
        print(f"[oracle] client {i} ({'ecdh' if i == 0 else 'kkrt'}): "
              f"exact difference set, {len(got)} transferred", flush=True)
    # serve_clients records db_build twice: the resident build, then the
    # KKRT session's rebind (serve_db_party overwrites the key)
    print(
        f"[server] resident ECDH build at start; KKRT session db_build "
        f"(rebind path) {tms.get('db_build', float('nan')):.2f}s; "
        f"ecdh_query {tms.get('ecdh_query_s', 0):.2f}s  "
        f"kkrt_query {tms.get('kkrt_query_s', 0):.2f}s",
        flush=True,
    )
    print("REBIND DRIVE OK", flush=True)


if __name__ == "__main__":
    main()
