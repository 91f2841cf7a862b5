"""Resident serve loop: one DB server, multiple sequential queries
(VERDICT round 1, next #6).  The ECDH OPRF backend makes the DB build
offline and the preprocessed cache reusable across queries; the second and
third query must skip the build entirely."""

import pytest
import threading

import numpy as np

from apsu_tpu.api.session import QueryClient, serve_db_party
from apsu_tpu.mpc.duplex import pipe_pair
from apsu_tpu.mpc.prg import CsRng
from tests.test_psu_e2e import as_set, make_sets, small_params


@pytest.mark.slow
def test_three_queries_one_server():
    rng = np.random.default_rng(21)
    params = small_params()
    db_items = rng.integers(0, 1 << 64, size=(250, 2), dtype=np.uint64)
    queries = []
    for _ in range(3):
        fresh = rng.integers(0, 1 << 64, size=(20, 2), dtype=np.uint64)
        common = db_items[rng.choice(250, size=10, replace=False)]
        queries.append(np.concatenate([fresh, common]))

    ch_q, ch_db = pipe_pair()
    out = {}
    errs = []
    timings = {}

    def server():
        try:
            out["per_query"] = serve_db_party(
                ch_db, params, db_items, CsRng(b"serve-loop-test-db-0001"),
                timings=timings, max_queries=None,
            )
        except Exception as e:
            errs.append(e)

    def client():
        try:
            c = QueryClient(ch_q, rng=CsRng(b"serve-loop-test-cli-0001"),
                            params=params, oprf="ecdh")
            for q in queries:
                c.query(q)
            c.close()
        except Exception as e:
            errs.append(e)

    ts, tc = threading.Thread(target=server), threading.Thread(target=client)
    ts.start(); tc.start(); ts.join(); tc.join()
    if errs:
        raise errs[0]

    per_query = out["per_query"]
    assert len(per_query) == 3
    dbs = as_set(db_items)
    for q, got in zip(queries, per_query):
        trans = as_set(
            np.ascontiguousarray(got).view(np.uint64).reshape(-1, 2)
        )
        assert trans == as_set(q) - dbs


@pytest.mark.slow
def test_multi_query_kkrt_session_rebinds():
    """One KKRT session, three queries: each extra query opens a FRESH
    slot-bound correlation (OP_REBIND) and the DB party re-derives only
    the OPRF-dependent tensors from its retained placement
    (ReceiverDB.rebind) — the multi-query KKRT serve loop the reference
    lacks (r5).  Every query's transferred set must be the exact
    difference set."""
    rng = np.random.default_rng(29)
    params = small_params()
    db_items = rng.integers(0, 1 << 64, size=(250, 2), dtype=np.uint64)
    queries = []
    for _ in range(3):
        fresh = rng.integers(0, 1 << 64, size=(20, 2), dtype=np.uint64)
        common = db_items[rng.choice(250, size=10, replace=False)]
        queries.append(np.concatenate([fresh, common]))

    ch_q, ch_db = pipe_pair()
    out = {}
    errs = []
    timings = {}

    def server():
        try:
            out["per_query"] = serve_db_party(
                ch_db, params, db_items, CsRng(b"kkrt-multiq-test-db-001"),
                timings=timings, max_queries=None,
            )
        except Exception as e:
            errs.append(e)

    def client():
        try:
            c = QueryClient(ch_q, rng=CsRng(b"kkrt-multiq-test-cli-01"),
                            params=params, oprf="kkrt")
            for q in queries:
                c.query(q)
            c.close()
        except Exception as e:
            errs.append(e)

    ts, tc = threading.Thread(target=server), threading.Thread(target=client)
    ts.start(); tc.start(); tc.join(); ts.join(30 if errs else None)
    if errs:
        raise errs[0]

    per_query = out["per_query"]
    assert len(per_query) == 3
    assert "rebind" in timings  # the placement-reuse path actually ran
    dbs = as_set(db_items)
    for q, got in zip(queries, per_query):
        trans = as_set(
            np.ascontiguousarray(got).view(np.uint64).reshape(-1, 2)
        )
        assert trans == as_set(q) - dbs


@pytest.mark.slow
def test_multi_client_dispatch():
    """serve_clients: one resident DB, three successive client CONNECTIONS
    over real sockets — an ECDH client with two queries, a KKRT client
    (per-session rebuild), then another ECDH client; plus a client whose
    protocol error must not kill the server (VERDICT r2 missing #4)."""
    from apsu_tpu.api.session import serve_clients
    from apsu_tpu.mpc.duplex import SocketDuplex, SocketListener

    rng = np.random.default_rng(23)
    params = small_params()
    db_items = rng.integers(0, 1 << 64, size=(250, 2), dtype=np.uint64)
    queries = []
    for _ in range(4):
        fresh = rng.integers(0, 1 << 64, size=(15, 2), dtype=np.uint64)
        common = db_items[rng.choice(250, size=8, replace=False)]
        queries.append(np.concatenate([fresh, common]))

    lst = SocketListener(0, "127.0.0.1")
    out = {}
    errs = []

    def server():
        try:
            out["per_client"] = serve_clients(
                lst, params, db_items, CsRng(b"multi-client-test-db-001"),
                max_clients=4,
            )
        except Exception as e:
            errs.append(e)

    def clients():
        try:
            # client 0: ECDH, two queries on one connection
            c = QueryClient(
                SocketDuplex.connect("127.0.0.1", lst.port),
                rng=CsRng(b"multi-client-test-cli-000"), params=params,
                oprf="ecdh",
            )
            c.query(queries[0]); c.query(queries[1]); c.close()
            # client 1: KKRT handshake → per-session rebuild
            c = QueryClient(
                SocketDuplex.connect("127.0.0.1", lst.port),
                rng=CsRng(b"multi-client-test-cli-001"), params=params,
                oprf="kkrt",
            )
            c.query(queries[2]); c.close()
            # client 2: garbage after connect — server must survive
            bad = SocketDuplex.connect("127.0.0.1", lst.port)
            bad.send(b"\x00not-a-typed-frame")
            bad.sock.close()
            # client 3: ECDH again, resident cache still serving
            c = QueryClient(
                SocketDuplex.connect("127.0.0.1", lst.port),
                rng=CsRng(b"multi-client-test-cli-003"), params=params,
                oprf="ecdh",
            )
            c.query(queries[3]); c.close()
        except Exception as e:
            errs.append(e)

    ts, tc = threading.Thread(target=server), threading.Thread(target=clients)
    ts.start(); tc.start(); tc.join(); ts.join()
    lst.close()
    if errs:
        raise errs[0]

    per_client = out["per_client"]
    assert len(per_client) == 4
    dbs = as_set(db_items)
    got_sets = [
        as_set(np.ascontiguousarray(g).view(np.uint64).reshape(-1, 2))
        for client in per_client for g in client
    ]
    assert len(per_client[2]) == 0  # the garbage client transferred nothing
    want = [as_set(queries[i]) - dbs for i in (0, 1, 2, 3)]
    assert got_sets == want


def test_kkrt_server_refuses_reused_correlation():
    """A second OP_QUERY on a consumed KKRT correlation WITHOUT an
    OP_REBIND must be rejected (a replayed correlation would let the
    query party evaluate the PRF on fresh inputs it never bound).  The
    well-behaved client path (QueryClient sends OP_REBIND automatically)
    is covered by test_multi_query_kkrt_session_rebinds."""
    import json as _json

    import pytest

    from apsu_tpu.net.wire import OP_QUERY, ProtocolError, RemoteError

    rng = np.random.default_rng(22)
    params = small_params()
    db_items, q1 = make_sets(rng, 200, 25, 8)

    ch_q, ch_db = pipe_pair()
    errs = []

    def server():
        try:
            serve_db_party(
                ch_db, params, db_items, CsRng(b"kkrt-refuse-test-db-0001"),
                max_queries=None,
            )
        except ProtocolError:
            pass  # expected: the server aborts the misbehaving session
        except Exception as e:
            errs.append(e)

    t = threading.Thread(target=server)
    t.start()
    c = QueryClient(ch_q, rng=CsRng(b"kkrt-refuse-test-cli-001"),
                    params=params, oprf="kkrt")
    c.query(q1)
    # misbehave: replay OP_QUERY directly without opening a fresh
    # correlation (bypassing QueryClient.query's automatic OP_REBIND)
    c.t.send_op(
        OP_QUERY,
        _json.dumps({"power_list": [1], "peqt": "ddh", "mode": "union",
                     "has_rk": False}).encode(),
    )
    with pytest.raises(RemoteError, match="consumed"):
        c.t.expect(OP_QUERY)
    t.join()
    if errs:
        raise errs[0]
