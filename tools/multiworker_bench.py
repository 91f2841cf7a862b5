#!/usr/bin/env python
"""Multi-worker DB-party rehearsal at production scale (VERDICT r3 ask #6).

Drives the FULL typed wire session — KKRT OPRF + encrypted PS query +
PEQT matrix extraction — against a 2-worker bundle-range-partitioned DB at
the 16M-4096 parameter shape, and banks the three numbers round 3 never
measured: per-worker build time, coordinator scatter/wait/concat overhead,
and intra-party bytes per worker link.

Worker mode:
  --mode thread   (default) workers are threads over pipe duplexes in THIS
                  process — all partitions build/evaluate on the local
                  accelerator serially.  Cross-host transport is already
                  certified by tests/test_multihost.py over real TCP; this
                  mode adds the production-scale numbers a single chip can
                  produce.
  --mode socket   workers are subprocesses (cli/worker_cli) over localhost
                  TCP — the true cross-host launcher path (use --platform
                  cpu to keep workers off the chip).

Scale knob: --items (default 2^24 = 16.7M, the 16M-4096 headline load).

Run on the chip:  timeout 7200 python tools/multiworker_bench.py
Shakeout:         python tools/multiworker_bench.py --items 200000 --platform cpu
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


def log(msg):
    print(f"[mw +{time.perf_counter() - T0:7.1f}s] {msg}", file=sys.stderr,
          flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--items", type=int, default=1 << 24)
    ap.add_argument("--workers", type=int, default=2)
    ap.add_argument("--cache-parts", type=int, default=1)
    ap.add_argument("--params", default="parameters/16M-4096.json")
    ap.add_argument("--mode", choices=["thread", "socket"], default="thread")
    ap.add_argument("--platform", default=None)
    ap.add_argument("--query-size", type=int, default=4096)
    ap.add_argument("--queries", type=int, default=1,
                    help=">1 re-queries the same session: the LAST query is "
                         "the compile-warm distributed number (VERDICT r4 #7)")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from apsu_tpu.api.session import run_query_party, serve_db_party
    from apsu_tpu.core.params import PSUParams
    from apsu_tpu.mpc.duplex import SocketDuplex, pipe_pair
    from apsu_tpu.mpc.prg import CsRng
    from apsu_tpu.parallel.multihost import db_worker

    params = PSUParams.load_file(args.params)
    rng = np.random.default_rng(0x16A)
    n = args.items
    log(f"generating {n} items")
    db_items = rng.integers(0, 1 << 64, size=(n, 2), dtype=np.uint64)
    qn = args.query_size
    q_idx = rng.choice(n, size=qn // 8, replace=False)
    query = np.concatenate(
        [db_items[q_idx],
         rng.integers(0, 1 << 64, size=(qn - qn // 8, 2), dtype=np.uint64)]
    )

    nw = args.workers * args.cache_parts
    errs: list = []
    wlinks = []
    threads = []
    if args.mode == "thread":
        for i in range(nw):
            co_ch, w_ch = pipe_pair()
            wlinks.append(co_ch)

            def run(ch=w_ch, i=i):
                try:
                    db_worker(ch, params, rng=CsRng(b"mw-worker-%010d-key" % i))
                except Exception as e:  # noqa: BLE001
                    errs.append(e)

            th = threading.Thread(target=run)
            th.start()
            threads.append(th)
    else:
        import subprocess

        base = 23461
        procs = []
        for i in range(nw):
            cmd = [
                sys.executable, "-m", "apsu_tpu.cli.worker_cli",
                "--params", args.params, "--port", str(base + i),
            ]
            if args.platform:
                cmd += ["--platform", args.platform]
            procs.append(subprocess.Popen(cmd))
        time.sleep(3.0)
        for i in range(nw):
            wlinks.append(SocketDuplex.connect("127.0.0.1", base + i))

    # query party <-> coordinator over an in-process pipe (the typed wire
    # protocol either way; the cross-host PARTY link is covered by the CLIs)
    ch_q, ch_db = pipe_pair()
    out = {}

    def server():
        try:
            tm: dict = {}
            out["transferred"] = serve_db_party(
                ch_db, params, db_items, CsRng(b"mw-coordinator-key-0001"),
                workers=wlinks, cache_parts=args.cache_parts, timings=tm,
                max_queries=args.queries,
            )
            out["srv_timings"] = tm
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    def client():
        try:
            from apsu_tpu.api.session import QueryClient

            tm: dict = {}
            cl = QueryClient(
                ch_q, rng=CsRng(b"mw-client-key-seed-0001"), params=params,
                oprf="kkrt",
            )
            qts = []
            for qi in range(args.queries):
                t0 = time.perf_counter()
                cl.query(query, peqt="osn", timings=tm)
                qts.append(round(time.perf_counter() - t0, 3))
                log(f"client query {qi}: {qts[-1]:.1f}s")
            cl.close()
            out["cli_timings"] = tm
            out["query_wall_s"] = qts
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    log(f"starting session: {nw} workers ({args.mode}), KKRT + OSN PEQT")
    ts = threading.Thread(target=server, daemon=True)
    tc = threading.Thread(target=client, daemon=True)
    ts.start()
    tc.start()
    tc.join()
    # a dead client leaves the server blocked mid-protocol: surface the
    # client's exception instead of deadlocking the join
    ts.join(timeout=None if not errs else 30)
    for th in threads:
        th.join(timeout=60)
    if errs:
        raise errs[0]

    bytes_per_link = [
        {"sent": ch.bytes_sent, "received": ch.bytes_received}
        for ch in wlinks
    ]
    result = {
        "config": os.path.basename(args.params),
        "n_items": n,
        "mode": args.mode,
        "workers": nw,
        "cache_parts": args.cache_parts,
        "coordinator_timings_s": {
            k: (
                round(v, 3)
                if isinstance(v, float)
                else ([round(x, 3) for x in v] if isinstance(v, list) else v)
            )
            for k, v in out.get("srv_timings", {}).items()
        },
        "client_timings_s": {
            k: round(v, 3)
            for k, v in out.get("cli_timings", {}).items()
            if isinstance(v, float)
        },
        "query_wall_s": out.get("query_wall_s", []),
        "warm_query_s": (
            out.get("query_wall_s", [None])[-1] if args.queries > 1 else None
        ),
        "intra_party_bytes_per_link": bytes_per_link,
        "transferred_items": int(
            sum(len(x) for x in out.get("transferred", []))
        ),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
