"""Two-process CLI integration: receiver server + sender client over TCP,
checked with the set-algebra oracle on union.csv (the reference's
auto_test.py flow, /root/reference/tools/auto_test.py:159-176)."""

import os
import subprocess
import sys
import tempfile

import numpy as np
import pytest


def _write_csv(path, strings):
    with open(path, "w") as f:
        for s in strings:
            f.write(s + "\n")


@pytest.mark.slow
def test_cli_end_to_end(tmp_path):
    rng = np.random.default_rng(0)
    db = [f"db-item-{i}" for i in range(300)]
    common = list(rng.choice(db, size=11, replace=False))
    query = [f"q-{i}" for i in range(24)] + common

    params = {
        "table_params": {"hash_func_count": 2, "table_size": 64, "max_items_per_bin": 8},
        "item_params": {"felts_per_item": 4},
        "query_params": {"ps_low_degree": 0, "query_powers": [1, 2, 3, 4, 5, 6, 7, 8]},
        "seal_params": {
            "plain_modulus": 65537,
            "poly_modulus_degree": 256,
            "coeff_modulus_bits": [40, 40, 30],
        },
    }
    import json

    pfile = tmp_path / "params.json"
    pfile.write_text(json.dumps(params))
    dbfile = tmp_path / "db.csv"
    qfile = tmp_path / "query.csv"
    ufile = tmp_path / "union.csv"
    _write_csv(dbfile, db)
    _write_csv(qfile, query)

    port = 23411
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    recv = subprocess.Popen(
        [
            sys.executable, "-m", "apsu_tpu.cli.receiver_cli",
            "--params", str(pfile), "--db-file", str(dbfile),
            "--port", str(port), "--out", str(ufile), "--platform", "cpu",
            "--seed", "1",
        ],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
    )
    import time

    time.sleep(3)  # let the server bind
    send = subprocess.run(
        [
            sys.executable, "-m", "apsu_tpu.cli.sender_cli",
            "--query-file", str(qfile), "--host", "127.0.0.1",
            "--port", str(port), "--platform", "cpu", "--seed", "2",
        ],
        env=env, capture_output=True, timeout=240,
    )
    rc = recv.wait(timeout=240)
    assert send.returncode == 0, send.stderr.decode()[-2000:]
    assert rc == 0, recv.stderr.read().decode()[-2000:]

    union = set(ufile.read_text().split())
    assert union == set(db) | set(query)


@pytest.mark.slow
def test_cli_multihost_workers(tmp_path):
    """Four-process launch: 2 worker_cli partitions + receiver coordinator
    (--workers) + sender client, full MPC stack over TCP (VERDICT r2 #3b:
    the cross-host launcher)."""
    import json
    import time

    rng = np.random.default_rng(7)
    db = [f"db-item-{i}" for i in range(300)]
    common = list(rng.choice(db, size=9, replace=False))
    query = [f"q-{i}" for i in range(20)] + common

    params = {
        "table_params": {"hash_func_count": 2, "table_size": 128, "max_items_per_bin": 8},
        "item_params": {"felts_per_item": 4},
        "query_params": {"ps_low_degree": 0, "query_powers": [1, 2, 3, 4, 5, 6, 7, 8]},
        "seal_params": {
            "plain_modulus": 65537,
            "poly_modulus_degree": 128,
            "coeff_modulus_bits": [40, 40, 30],
        },
    }
    pfile = tmp_path / "params.json"
    pfile.write_text(json.dumps(params))
    dbfile = tmp_path / "db.csv"
    qfile = tmp_path / "query.csv"
    ufile = tmp_path / "union.csv"
    _write_csv(dbfile, db)
    _write_csv(qfile, query)

    port, wport0, wport1 = 23431, 23441, 23442
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    workers = [
        subprocess.Popen(
            [
                sys.executable, "-m", "apsu_tpu.cli.worker_cli",
                "--params", str(pfile), "--port", str(p), "--platform", "cpu",
            ],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        )
        for p in (wport0, wport1)
    ]
    time.sleep(3)  # let the workers bind
    recv = subprocess.Popen(
        [
            sys.executable, "-m", "apsu_tpu.cli.receiver_cli",
            "--params", str(pfile), "--db-file", str(dbfile),
            "--port", str(port), "--out", str(ufile), "--platform", "cpu",
            "--seed", "1",
            "--workers", f"127.0.0.1:{wport0},127.0.0.1:{wport1}",
        ],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
    )
    time.sleep(3)  # let the coordinator bind
    send = subprocess.run(
        [
            sys.executable, "-m", "apsu_tpu.cli.sender_cli",
            "--query-file", str(qfile), "--host", "127.0.0.1",
            "--port", str(port), "--platform", "cpu", "--seed", "2",
        ],
        env=env, capture_output=True, timeout=300,
    )
    rc = recv.wait(timeout=300)
    assert send.returncode == 0, send.stderr.decode()[-2000:]
    assert rc == 0, recv.stderr.read().decode()[-2000:]
    for w in workers:
        assert w.wait(timeout=60) == 0, w.stderr.read().decode()[-2000:]

    union = set(ufile.read_text().split())
    assert union == set(db) | set(query)
