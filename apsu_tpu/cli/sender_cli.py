"""Sender (query-side) CLI — the reference's sender_cli
(/root/reference/cli/sender/sender.cpp): load query CSV, connect, run the
query, transfer the difference set.  Parameters are received from the DB
party (the reference's rop_parms request); --params only cross-checks.

Usage:
  python -m apsu_tpu.cli.sender_cli --query-file query.csv \
      --host 127.0.0.1 --port 1212 [--params parameters/100K-1.json]
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

from apsu_tpu.cli.receiver_cli import _make_rng


def main(argv=None):
    ap = argparse.ArgumentParser(description="apsu_tpu sender (query party)")
    ap.add_argument("--query-file", required=True, help="CSV of query items")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=1212)
    ap.add_argument("--params", default=None, help="optional params cross-check")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--log-level", default="info")
    ap.add_argument("--log-file", default=None)
    ap.add_argument("--silent", action="store_true")
    ap.add_argument("--platform", default=None)
    ap.add_argument("--peqt", default="osn", choices=["osn", "ddh"],
                    help="permuted-equality-test variant (reference default: osn)")
    ap.add_argument("--oprf", default="kkrt", choices=["kkrt", "ecdh"],
                    help="OPRF backend: kkrt (one-shot, fastest build) or "
                    "ecdh (fixed-key; required for multi-query servers)")
    args = ap.parse_args(argv)

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    from apsu_tpu.api.session import run_query_party
    from apsu_tpu.cli.csv_io import load_csv
    from apsu_tpu.core.params import PSUParams
    from apsu_tpu.mpc.duplex import SocketDuplex
    from apsu_tpu.utils.log import configure
    from apsu_tpu.utils.stopwatch import GLOBAL

    log = configure(args.log_level, args.log_file, args.silent)
    items, payloads, strings = load_csv(args.query_file)
    params = PSUParams.load_file(args.params) if args.params else None
    log.info("query: %d items; connecting to %s:%d", len(strings), args.host, args.port)

    ch = SocketDuplex.connect(args.host, args.port)
    rng = _make_rng(args.seed)
    timings = {}
    with GLOBAL.span("query"):
        run_query_party(
            ch, items, rng, params=params, payloads=payloads, timings=timings,
            peqt=args.peqt, oprf=args.oprf,
        )
    log.info("query complete; timings: %s", {k: round(v, 3) for k, v in timings.items()})
    log.info("bytes sent=%d received=%d", ch.bytes_sent, ch.bytes_received)
    print(GLOBAL.report(), file=sys.stderr)


if __name__ == "__main__":
    main()
