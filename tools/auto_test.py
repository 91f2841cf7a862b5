#!/usr/bin/env python3
"""End-to-end two-process PSU test harness.

Port of the reference's tools/auto_test.py (/root/reference/tools/
auto_test.py): generates random datasets with a planted intersection,
emits a parameter file, launches the receiver and sender CLIs as separate
processes over TCP, and checks the union output with the set-algebra oracle
(check_ans semantics, auto_test.py:16-39).  Optional `tc`-based loopback
network shaping reproduces the reference's LAN/WAN tiers
(auto_test.py:103-157): 10Gbit/0.1ms, 100Mbit/40ms, 10Mbit/40ms, 1Mbit/40ms.

Usage:
  python tools/auto_test.py --db-size 5000 --query-size 256 --common 64 \
      [--params parameters/256K-512.json] [--peqt osn] [--shape 100mbit]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SHAPES = {
    "10gbit": ("rate 10gbit", "delay 0.1ms"),
    "100mbit": ("rate 100mbit", "delay 40ms"),
    "10mbit": ("rate 10mbit", "delay 40ms"),
    "1mbit": ("rate 1mbit", "delay 40ms"),
}


def prepare_data(rng, n_db, n_query, n_common):
    db = [f"db-{rng.integers(1 << 60)}-{i}" for i in range(n_db)]
    common = list(rng.choice(db, size=n_common, replace=False))
    query = [f"q-{rng.integers(1 << 60)}-{i}" for i in range(n_query - n_common)]
    query += common
    rng.shuffle(query)
    return db, query


def default_params(n_query):
    table = max(64, 1 << int(np.ceil(np.log2(n_query * 2))))
    return {
        "table_params": {
            "hash_func_count": 3,
            "table_size": table,
            "max_items_per_bin": 16,
        },
        "item_params": {"felts_per_item": 4},
        "query_params": {
            "ps_low_degree": 0,
            "query_powers": [1, 2, 5, 8, 11, 14, 15, 16],
        },
        "seal_params": {
            "plain_modulus": 65537,
            "poly_modulus_degree": 1024,
            "coeff_modulus_bits": [48, 48, 48, 28],
        },
    }


def check_ans(db, query, union):
    """The reference's oracle: union additions == query ∖ db."""
    dbs, qs, us = set(db), set(query), set(union)
    added = us - dbs
    assert added == qs - dbs, (
        f"union additions wrong: missing {len((qs - dbs) - added)}, "
        f"extra {len(added - (qs - dbs))}"
    )
    assert us == dbs | qs
    assert not (added & dbs)
    print(
        f"oracle OK: |db|={len(dbs)} |query|={len(qs)} "
        f"|intersection|={len(qs & dbs)} |transferred|={len(added)}"
    )


def shape_network(tier):
    rate, delay = SHAPES[tier]
    cmds = [
        f"tc qdisc add dev lo root handle 1: tbf {rate} burst 32kbit latency 400ms",
        f"tc qdisc add dev lo parent 1:1 handle 10: netem {delay}",
    ]
    for c in cmds:
        r = subprocess.run(c.split(), capture_output=True)
        if r.returncode:
            print(f"warning: network shaping failed ({c}): "
                  f"{r.stderr.decode().strip()}", file=sys.stderr)
            return False
    return True


def unshape_network():
    subprocess.run("tc qdisc del dev lo root".split(), capture_output=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--db-size", type=int, default=5000)
    ap.add_argument("--query-size", type=int, default=128)
    ap.add_argument("--common", type=int, default=32)
    ap.add_argument("--params", default=None)
    ap.add_argument("--peqt", default="osn", choices=["osn", "ddh"])
    ap.add_argument("--port", type=int, default=21212)
    ap.add_argument("--platform", default="cpu")
    ap.add_argument("--shape", default=None, choices=list(SHAPES))
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    rng = np.random.default_rng(args.seed)
    db, query = prepare_data(rng, args.db_size, args.query_size, args.common)

    shaped = False
    if args.shape:
        shaped = shape_network(args.shape)
    try:
        with tempfile.TemporaryDirectory() as tmp:
            dbf = os.path.join(tmp, "db.csv")
            qf = os.path.join(tmp, "query.csv")
            uf = os.path.join(tmp, "union.csv")
            open(dbf, "w").write("\n".join(db))
            open(qf, "w").write("\n".join(query))
            if args.params:
                pfile = args.params
            else:
                pfile = os.path.join(tmp, "params.json")
                json.dump(default_params(args.query_size), open(pfile, "w"))

            env = dict(os.environ)
            env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
            t0 = time.time()
            recv = subprocess.Popen(
                [sys.executable, "-m", "apsu_tpu.cli.receiver_cli",
                 "--params", pfile, "--db-file", dbf, "--port", str(args.port),
                 "--out", uf, "--platform", args.platform, "--seed", "1"],
                env=env,
            )
            time.sleep(3)
            send = subprocess.run(
                [sys.executable, "-m", "apsu_tpu.cli.sender_cli",
                 "--query-file", qf, "--port", str(args.port),
                 "--platform", args.platform, "--peqt", args.peqt, "--seed", "2"],
                env=env, timeout=1800,
            )
            rc = recv.wait(timeout=1800)
            assert send.returncode == 0 and rc == 0, (send.returncode, rc)
            print(f"end-to-end wall time: {time.time() - t0:.1f}s")
            union = open(uf).read().split()
            check_ans(db, query, union)
    finally:
        if shaped:
            unshape_network()


if __name__ == "__main__":
    main()
