"""Receiver (DB-side) CLI — the reference's receiver_cli
(/root/reference/cli/receiver/receiver.cpp): load params + CSV DB, listen,
serve one PSU query, write union.csv.

Usage:
  python -m apsu_tpu.cli.receiver_cli --params parameters/100K-1.json \
      --db-file db.csv --port 1212 --out union.csv [--platform cpu]
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def _make_rng(seed: int):
    """OS-entropy CsRng in production; sha256-derived fixed key when --seed
    is given (reproducible runs for the test harness ONLY — a 32-bit seed is
    brute-forceable and must never be used against a real counterparty)."""
    import hashlib

    from apsu_tpu.mpc.prg import CsRng

    if seed:
        return CsRng(hashlib.sha256(b"apsu-cli-seed:%d" % seed).digest())
    return CsRng()


def main(argv=None):
    ap = argparse.ArgumentParser(description="apsu_tpu receiver (DB party)")
    ap.add_argument("--params", required=True, help="parameter JSON file")
    ap.add_argument("--db-file", required=True, help="CSV of DB items")
    ap.add_argument("--port", type=int, default=1212)
    ap.add_argument("--bind", default="0.0.0.0")
    ap.add_argument("--out", default="union.csv")
    ap.add_argument(
        "--serve", type=int, default=1, metavar="N",
        help="serve N queries from one connection before exiting (0 = until "
        "the client disconnects); N != 1 requires the client to use "
        "--oprf ecdh (resident-server mode)",
    )
    ap.add_argument(
        "--clients", type=int, default=1, metavar="M",
        help="accept M successive client connections against one resident "
        "DB before exiting (0 = forever); M != 1 builds the DB with the "
        "ECDH backend up front (KKRT clients trigger a per-session rebuild)",
    )
    ap.add_argument(
        "--workers", default=None, metavar="HOST:PORT,...",
        help="comma-separated DB worker endpoints (worker_cli processes); "
        "the DB then builds and evaluates as a bundle-range partition "
        "across them with this process as coordinator",
    )
    ap.add_argument(
        "--cache-parts", type=int, default=1,
        help="split each bundle range's cache axis across this many of the "
        "workers (worker count must be bundle_parts*cache_parts)",
    )
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--log-level", default="info")
    ap.add_argument("--log-file", default=None)
    ap.add_argument("--silent", action="store_true")
    ap.add_argument(
        "--platform", default=None, help="jax platform override (e.g. cpu)"
    )
    args = ap.parse_args(argv)

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    from apsu_tpu.api.session import serve_db_party
    from apsu_tpu.cli.csv_io import decode_payloads, load_csv, write_union_csv
    from apsu_tpu.core.params import PSUParams
    from apsu_tpu.mpc.duplex import SocketDuplex
    from apsu_tpu.utils.log import configure
    from apsu_tpu.utils.stopwatch import GLOBAL

    log = configure(args.log_level, args.log_file, args.silent)
    params = PSUParams.load_file(args.params)
    items, _, strings = load_csv(args.db_file)
    log.info("DB: %d items; params N=%d table=%d", len(strings),
             params.poly_degree, params.table_params.table_size)

    workers = None
    if args.workers:
        workers = []
        for ep in args.workers.split(","):
            host, _, port = ep.strip().rpartition(":")
            workers.append(SocketDuplex.connect(host or "127.0.0.1", int(port)))
        log.info("coordinating %d DB workers", len(workers))

    log.info("listening on %s:%d", args.bind, args.port)
    rng = _make_rng(args.seed)
    timings = {}
    if args.clients != 1:
        if workers:
            ap.error("--clients is incompatible with --workers")
        from apsu_tpu.api.session import serve_clients
        from apsu_tpu.mpc.duplex import SocketListener

        with SocketListener(args.port, args.bind) as lst, GLOBAL.span(
            "serve_clients"
        ):
            per_client = serve_clients(
                lst, params, items, rng, timings=timings,
                max_clients=args.clients if args.clients > 0 else None,
                queries_per_client=args.serve if args.serve > 0 else None,
            )
        per_query = [q for client in per_client for q in client]
        ch = None
    else:
        ch = SocketDuplex.listen_accept(args.port, args.bind)
        with GLOBAL.span("serve_query"):
            per_query = serve_db_party(
                ch, params, items, rng, timings=timings,
                max_queries=args.serve if args.serve > 0 else None,
                workers=workers, cache_parts=args.cache_parts,
            )
    new_payloads = [p for q in per_query for p in decode_payloads(q)]
    union = sorted(set(strings) | set(new_payloads))
    write_union_csv(args.out, union)
    log.info("union: %d items -> %s (%d queries, received %d new)", len(union),
             args.out, len(per_query), len(new_payloads))
    log.info(
        "timings: %s",
        {
            # values are floats except worker_build_s (a per-worker list)
            k: round(v, 3) if isinstance(v, (int, float)) else v
            for k, v in timings.items()
        },
    )
    if ch is not None:
        log.info("bytes sent=%d received=%d", ch.bytes_sent, ch.bytes_received)
    print(GLOBAL.report(), file=sys.stderr)


if __name__ == "__main__":
    main()
