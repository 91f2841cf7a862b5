"""DB-party worker CLI — one partition host of a multi-host receiver.

The reference scales by adding caches per bundle index on one machine
(/root/reference/receiver/apsu/receiver_osn.cpp:188-205); this launcher is
the cross-host half of the TPU build's scale-out (SURVEY §2.7 C4): each
worker process owns a (bundle-range × cache-range) partition of the DB,
builds it from the coordinator's item shard, and serves query slices until
the coordinator disconnects.

Start workers first, then the coordinator (receiver_cli --workers ...):

  python -m apsu_tpu.cli.worker_cli --params parameters/256M-4096.json \
      --port 1301 [--platform cpu]

The link to the coordinator is INTRA-party (one trust domain): OPRF key
material and masks travel over it, never to the query party.
"""

from __future__ import annotations

import argparse


def main(argv=None):
    ap = argparse.ArgumentParser(description="apsu_tpu DB-party worker")
    ap.add_argument("--params", required=True, help="parameter JSON file")
    ap.add_argument("--port", type=int, required=True)
    ap.add_argument("--bind", default="0.0.0.0")
    ap.add_argument("--log-level", default="info")
    ap.add_argument("--silent", action="store_true")
    ap.add_argument(
        "--platform", default=None, help="jax platform override (e.g. cpu)"
    )
    args = ap.parse_args(argv)

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    from apsu_tpu.core.params import PSUParams
    from apsu_tpu.mpc.duplex import SocketDuplex
    from apsu_tpu.parallel.multihost import db_worker
    from apsu_tpu.utils.log import configure

    log = configure(args.log_level, None, args.silent)
    params = PSUParams.load_file(args.params)
    log.info("worker listening on %s:%d", args.bind, args.port)
    ch = SocketDuplex.listen_accept(args.port, args.bind)
    db_worker(ch, params)
    log.info(
        "worker done (sent %d bytes, received %d)",
        ch.bytes_sent, ch.bytes_received,
    )


if __name__ == "__main__":
    main()
