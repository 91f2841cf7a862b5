"""Two-party PSU session: the typed wire flow for both deployment modes.

One function per party over a Duplex — an in-process pipe (run_psu_mpc) or a
TCP socket (the CLIs).  Every message is op-typed and versioned
(net/wire.py; reference op types at common/apsu/network/receiver_operation.
h:27, safe downcasts at requests.h:37-97), the message sequence mirrors the
reference's phases (SURVEY §3): params handshake (rop_parms) → interactive
OPRF → encrypted query powers (rop_query) → result packages → permuted
equality test → chosen-OT transfer of X∖Y.

Wire compression (seal_object.h Serializable semantics): fresh symmetric
query ciphertexts and relin keys travel seed-compressed (c0 / ksk[:,0] plus
a 32-byte PRG seed); result ciphertexts travel bit-packed at the residue
entropy floor (net/wire.py pack_residues).

Serve-loop mode (``serve_db_party`` with max_queries != 1): the DB party
keeps its HBM cache resident and answers successive queries.  Two OPRF
backends: the fixed-key ECDH backend answers any number of queries from
one resident cache; the production KKRT backend binds one correlation per
query, so the client opens a FRESH correlation per extra query
(OP_REBIND) and the DB party re-derives only the OPRF-dependent tensors
from its retained placement (ReceiverDB.rebind — r4/r5).  The reference's
dispatcher quits after one query (receiver_dispatcher_osn.cpp:116); the
resident server is what its preprocessing model was for.

Payloads: the OT carries each item's 16-byte payload (its original bytes) so
the DB party reconstructs the union in the clear, like the reference's
sendMessages of original items (sender_osn.cpp:379-399).
"""

from __future__ import annotations

import json
import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from apsu_tpu.api.parties import QueryRequest, QueryResponse, Receiver, Sender
from apsu_tpu.core.params import PSUParams
from apsu_tpu.db.receiver_db import ReceiverDB
from apsu_tpu.mpc.duplex import Duplex
from apsu_tpu.mpc.endgame import (
    cardsum_db_side,
    cardsum_query_side,
    endgame_db_side,
    endgame_query_side,
    felts_to_blocks,
)
from apsu_tpu.mpc.kkrt import KkrtReceiver, KkrtSender
from apsu_tpu.mpc.oprf import EcdhOprfClient, EcdhOprfServer
from apsu_tpu.mpc.prg import CsRng
from apsu_tpu.net.wire import (
    OP_BYE,
    OP_ENDGAME,
    OP_OPRF,
    OP_PARAMS,
    OP_PARAMS_REQ,
    OP_QUERY,
    OP_QUERY_DATA,
    OP_REBIND,
    OP_RESPONSE,
    OP_RESULT,
    WIRE_VERSION,
    ProtocolError,
    TypedDuplex,
    pack_residues,
    unpack_residues,
)


class QueryClient:
    """Query-party session against a (possibly resident) DB server.

    Handshakes once, then issues one or more queries; each query runs the
    full online phase (cuckoo → OPRF → encrypted powers → decrypt → PEQT →
    OT).  Multi-query KKRT sessions open a fresh correlation per query
    (OP_REBIND → server-side placement-reuse rebuild); ECDH sessions reuse
    the resident cache directly.
    """

    def __init__(
        self,
        ch: Duplex,
        rng=None,
        params: Optional[PSUParams] = None,
        oprf: str = "kkrt",
    ):
        self.t = TypedDuplex(ch)
        self.rng = rng if rng is not None else CsRng()
        self.oprf = oprf
        hello = json.dumps({"version": WIRE_VERSION, "oprf": oprf}).encode()
        self.t.send_op(OP_PARAMS_REQ, hello)
        remote = PSUParams.load_json(self.t.expect(OP_PARAMS).decode())
        if params is not None and params.to_dict() != remote.to_dict():
            raise ValueError("parameter mismatch with DB party")
        self.params = remote
        self._queries = 0

    def _oprf_factory(self, table):
        ch = self.t.scoped(OP_OPRF)
        if self.oprf == "ecdh":
            return EcdhOprfClient(ch, table, self.rng)
        return KkrtReceiver(ch, table, self.rng)

    def query(
        self,
        items: np.ndarray,
        payloads: Optional[np.ndarray] = None,
        peqt: str = "ddh",
        mode: str = "union",
        values: Optional[np.ndarray] = None,
        timings: Optional[Dict[str, float]] = None,
    ) -> None:
        """One full PSU query.  The DB party ends up with the union."""
        timings = timings if timings is not None else {}
        if self._queries and self.oprf != "ecdh":
            # a slot-bound KKRT correlation binds exactly one query: open a
            # FRESH correlation for this one.  The DB party re-derives only
            # the OPRF-dependent tensors from its retained placement
            # (ReceiverDB.rebind) — the reference has no analogue (its
            # dispatcher exits after one query,
            # receiver_dispatcher_osn.cpp:116)
            self.t.send_op(OP_REBIND, b"")
        self._queries += 1
        params, t = self.params, self.t
        snd = Sender(
            params, oprf=None, rng=self.rng, oprf_factory=self._oprf_factory
        )
        t0 = time.perf_counter()
        mark_o = t.bytes_sent + t.bytes_received
        req = snd.create_query(items)
        timings["create_query"] = time.perf_counter() - t0
        timings["oprf_bytes"] = t.bytes_sent + t.bytes_received - mark_o

        meta = {
            "power_list": [int(x) for x in req.power_list],
            "peqt": peqt,
            "mode": mode,
            "has_rk": req.relin_key is not None,
        }
        mark = t.bytes_sent
        t.send_op(OP_QUERY, json.dumps(meta).encode())
        # seed-compressed upload: c0 residues + 32-byte a seed, ksk[:, 0] +
        # 32-byte seed for the relin key
        t.send_op(
            OP_QUERY_DATA, np.ascontiguousarray(jax.device_get(req.powers_data)[:, :, 0])
        )
        t.send_op(OP_QUERY_DATA, req.a_seed)
        if req.relin_key is not None:
            t.send_op(
                OP_QUERY_DATA, np.ascontiguousarray(jax.device_get(req.relin_key)[:, 0])
            )
            t.send_op(OP_QUERY_DATA, req.rk_seed)
        timings["query_upload_bytes"] = t.bytes_sent - mark

        mark = t.bytes_received
        rmeta = t.expect(OP_RESPONSE)
        packed = t.expect(OP_RESULT)
        timings["result_bytes"] = t.bytes_received - mark
        eval_level = int(rmeta[0])
        shape = tuple(int(x) for x in rmeta[1:])
        results = unpack_residues(packed, snd.bfv.levels[eval_level].primes, shape)
        t0 = time.perf_counter()
        mat = snd.extract_matrix(QueryResponse(results, eval_level))
        timings["decrypt"] = time.perf_counter() - t0

        blocks = felts_to_blocks(
            snd.peqt_matrix(mat), params.item_bit_count_per_felt
        )
        if payloads is None:
            payload_by_slot = (
                np.ascontiguousarray(snd.cuckoo.table).view(np.uint8).reshape(-1, 16)
            )
        else:
            payload_by_slot = np.zeros(
                (params.table_params.table_size, payloads.shape[1]), np.uint8
            )
            idx = snd.cuckoo.item_index
            payload_by_slot[snd.cuckoo.filled] = payloads[idx[snd.cuckoo.filled]]
        eg = t.scoped(OP_ENDGAME)
        t0 = time.perf_counter()
        mark_e = t.bytes_sent + t.bytes_received
        if mode == "union":
            endgame_query_side(
                eg, blocks, payload_by_slot, snd.cuckoo.filled, self.rng, peqt=peqt
            )
        else:
            vals = np.zeros(params.table_params.table_size, dtype=np.uint64)
            if mode == "cardsum":
                if values is None:
                    raise ValueError("cardsum mode needs per-item values")
                idx = snd.cuckoo.item_index
                vals[snd.cuckoo.filled] = values[idx[snd.cuckoo.filled]]
            cardsum_query_side(eg, blocks, vals, snd.cuckoo.filled, self.rng, peqt=peqt)
        timings["endgame"] = time.perf_counter() - t0
        timings["endgame_bytes"] = t.bytes_sent + t.bytes_received - mark_e

    def close(self) -> None:
        self.t.send_op(OP_BYE, b"")


def run_query_party(
    ch: Duplex,
    items: np.ndarray,
    rng=None,
    params: Optional[PSUParams] = None,
    payloads: Optional[np.ndarray] = None,
    timings: Optional[Dict[str, float]] = None,
    peqt: str = "ddh",
    mode: str = "union",
    values: Optional[np.ndarray] = None,
    oprf: str = "kkrt",
) -> PSUParams:
    """The small-set party, single query.  mode: "union" (transfer X∖Y),
    "card" or "cardsum" (the reference's CARD/CARDSUM compile-time flags at
    common/apsu/log.h:11-14 folded into runtime config).  Returns the params
    used.  rng sources all of this party's secret material; None means an
    OS-entropy CsRng (production default)."""
    client = QueryClient(ch, rng=rng, params=params, oprf=oprf)
    client.query(
        items, payloads=payloads, peqt=peqt, mode=mode, values=values,
        timings=timings,
    )
    client.close()
    return client.params


def serve_db_party(
    ch: Duplex,
    params: PSUParams,
    items: np.ndarray,
    rng=None,
    timings: Optional[Dict[str, float]] = None,
    db: Optional[ReceiverDB] = None,
    max_queries: Optional[int] = 1,
    workers=None,
    cache_parts: int = 1,
) -> List[np.ndarray]:
    """The large-set party: builds (or reuses) the DB, then serves queries
    until OP_BYE or ``max_queries``.  Returns one transferred-payload array
    [k_i, W] per union query served.

    The OPRF backend follows the client's handshake: "kkrt" (interactive
    build, exactly one query per correlation) or "ecdh" (offline build,
    unlimited queries against the resident cache).

    ``workers``: intra-party Duplex links to DB worker processes
    (parallel/multihost.db_worker) — the DB then builds and evaluates as a
    bundle-range (× cache-range, ``cache_parts``) partition across them,
    with this process as the protocol-facing coordinator.  Works with both
    OPRF backends: the KKRT setup runs once here, its per-slot key columns
    ship to the workers (the correlation is per-slot, receiver_db.cpp:157-
    240, so partitioning is transparent to the query party)."""
    timings = timings if timings is not None else {}
    rng = rng if rng is not None else CsRng()
    t = TypedDuplex(ch)

    hello = json.loads(t.expect(OP_PARAMS_REQ).decode())
    oprf_kind = hello.get("oprf", "kkrt")
    t.send_op(OP_PARAMS, params.to_json().encode())

    rebind_src = None
    if db is not None and oprf_kind == "kkrt":
        # a slot-bound KKRT correlation binds exactly one query session
        # (mpc/oprf.py) — the resident (ECDH-built) cache cannot answer it;
        # rebuild for this client, interactively bound to its correlation.
        # If the resident DB retains its placement, only the OPRF-dependent
        # tensors are re-derived (ReceiverDB.rebind — VERDICT r3 #9)
        if db.can_rebind:
            rebind_src = db
        db = None

    t0 = time.perf_counter()
    dist = None
    if db is None:
        if oprf_kind == "ecdh":
            oprf = EcdhOprfServer(rng)
        else:
            oprf = KkrtSender(
                t.scoped(OP_OPRF), params.table_params.table_size, rng
            )
        if workers:
            from apsu_tpu.parallel.multihost import DistributedReceiver

            dist = DistributedReceiver(
                params, workers, items, oprf=oprf, rng=rng,
                cache_parts=cache_parts,
            )
        elif rebind_src is not None:
            db = rebind_src.rebind(oprf)
        else:
            db = ReceiverDB(params, oprf)
            db.set_data(items)
    timings["db_build"] = time.perf_counter() - t0
    recv = dist if dist is not None else Receiver(params, db, rng=rng)
    oprf_obj = dist.oprf if dist is not None else db.oprf

    transferred: List[np.ndarray] = []
    served = 0
    kkrt_consumed = False  # a served query consumes the KKRT correlation
    while max_queries is None or served < max_queries:
        try:
            op, obj = t.recv_any()
        except (ConnectionError, EOFError):
            break
        if op == OP_BYE:
            break
        if op == OP_OPRF:
            # ECDH blind-evaluation round for the next query's cuckoo table
            if not isinstance(oprf_obj, EcdhOprfServer):
                t.send_error("OPRF round on a non-ECDH session")
                raise ProtocolError("OPRF round on a non-ECDH session")
            t.send_op(OP_OPRF, oprf_obj.serve_round(np.asarray(obj)))
            continue
        if op == OP_REBIND:
            # fresh KKRT correlation for the client's next query: run the
            # interactive setup, then re-derive only the OPRF-dependent
            # tensors from the retained placement (ReceiverDB.rebind /
            # DistributedReceiver.rebind) — the multi-query KKRT serve
            # loop the reference lacks (its dispatcher exits after one
            # query, receiver_dispatcher_osn.cpp:116)
            if oprf_kind == "ecdh":
                t.send_error("OP_REBIND on an ECDH session")
                raise ProtocolError("OP_REBIND on an ECDH session")
            t0 = time.perf_counter()
            oprf_obj = KkrtSender(
                t.scoped(OP_OPRF), params.table_params.table_size, rng
            )
            if dist is not None:
                dist.rebind(oprf_obj)
            else:
                db2 = db.rebind(oprf_obj)
                db.coeff_cache = None  # release the consumed HBM cache
                db = db2
                recv = Receiver(params, db, rng=rng)
            kkrt_consumed = False
            timings["rebind"] = time.perf_counter() - t0
            continue
        if op != OP_QUERY:
            t.send_error(f"unexpected op {op} (wanted OP_QUERY)")
            raise ProtocolError(f"unexpected op {op}")
        if served and oprf_kind != "ecdh" and kkrt_consumed:
            t.send_error(
                "KKRT correlation already consumed; the client must open "
                "a fresh one (OP_REBIND) before its next query"
            )
            raise ProtocolError("KKRT correlation already consumed")

        meta = json.loads(bytes(obj).decode())
        plist = tuple(int(x) for x in meta["power_list"])
        # both parties derive the fresh-query level from the shared params
        # content (measured_levels "query" knob); the c0 limb count is
        # cross-checked by Receiver.validate_query
        ql = recv.query_lvl
        c0 = t.expect(OP_QUERY_DATA)
        a_seed = bytes(t.expect(OP_QUERY_DATA))
        if meta["has_rk"]:
            rk0 = t.expect(OP_QUERY_DATA)
            rk_seed = bytes(t.expect(OP_QUERY_DATA))
            rk = recv.bfv.relin_key_from_seed(rk0, rk_seed, level=ql).ksk
        else:
            rk = None
        powers = recv.bfv.ct_from_seed(c0, a_seed, level=ql)
        t0 = time.perf_counter()
        if dist is not None:
            dtm: Dict[str, float] = {}
            resp = recv.run_query(
                QueryRequest(
                    power_list=plist, powers_data=powers.data, relin_key=rk
                ),
                timings=dtm,
            )
            timings.update({f"dist_{k}": v for k, v in dtm.items()})
            timings["worker_build_s"] = list(recv.worker_build_s)
        else:
            resp = recv.run_query(
                QueryRequest(
                    power_list=plist, powers_data=powers.data, relin_key=rk
                )
            )
        timings["run_query"] = time.perf_counter() - t0
        res_np = jax.device_get(resp.results)
        primes = recv.bfv.levels[resp.eval_level].primes
        t.send_op(OP_RESPONSE, np.array([resp.eval_level, *res_np.shape], np.int64))
        t.send_op(OP_RESULT, pack_residues(res_np, primes))
        timings["result_raw_bytes"] = int(np.asarray(res_np).nbytes)

        blocks = felts_to_blocks(
            recv.peqt_matrix(), params.item_bit_count_per_felt
        )
        eg = t.scoped(OP_ENDGAME)
        t0 = time.perf_counter()
        if meta["mode"] == "union":
            transferred.append(endgame_db_side(eg, blocks, rng, peqt=meta["peqt"]))
        else:
            transferred.append(cardsum_db_side(eg, blocks, rng, peqt=meta["peqt"]))
        timings["endgame"] = time.perf_counter() - t0
        served += 1
        kkrt_consumed = True
    if dist is not None:
        dist.close()
    return transferred


def serve_clients(
    listener,
    params: PSUParams,
    items: np.ndarray,
    rng=None,
    max_clients: Optional[int] = 1,
    queries_per_client: Optional[int] = None,
    timings: Optional[Dict[str, float]] = None,
) -> List[List[np.ndarray]]:
    """Multi-client dispatcher: build the DB ONCE (ECDH backend — the HBM
    cache stays resident), then accept successive client connections on
    ``listener`` (mpc/duplex.py:SocketListener) and serve each with
    ``serve_db_party``.  The reference's ZMQ router addresses multiple
    clients by id (common/apsu/network/zmq/zmq_channel.h:70) but its
    dispatcher quits after one query (receiver_dispatcher_osn.cpp:116);
    this accept loop is the resident-server completion of that design.

    ECDH clients share the resident cache (unlimited queries each); a KKRT
    handshake triggers a per-session rebuild inside serve_db_party (its
    correlation binds one query).  A protocol error or disconnect on one
    connection is logged and does not kill the server.  Returns the
    per-client lists of transferred payload arrays."""
    from apsu_tpu.utils.log import get

    log = get()
    rng = rng if rng is not None else CsRng()
    t0 = time.perf_counter()
    db = ReceiverDB(params, EcdhOprfServer(rng))
    db.set_data(items)
    if timings is not None:
        timings["db_build"] = time.perf_counter() - t0
    out: List[List[np.ndarray]] = []
    served = 0
    while max_clients is None or served < max_clients:
        ch = listener.accept()
        try:
            out.append(
                serve_db_party(
                    ch, params, items, rng, timings=timings, db=db,
                    max_queries=queries_per_client,
                )
            )
        except (ProtocolError, ConnectionError, EOFError) as e:
            log.warning("client %d: session aborted: %s", served, e)
            out.append([])
        served += 1
    return out


def run_db_party(
    ch: Duplex,
    params: PSUParams,
    items: np.ndarray,
    rng=None,
    timings: Optional[Dict[str, float]] = None,
    db: Optional[ReceiverDB] = None,
):
    """Single-query DB party (the reference dispatcher's behavior).  Returns
    transferred payloads [k, W] uint8 (the difference set X∖Y), or the
    (card, sum) tuple in cardsum mode."""
    out = serve_db_party(
        ch, params, items, rng=rng, timings=timings, db=db, max_queries=1
    )
    if not out:
        raise ProtocolError("client disconnected before querying")
    return out[0]
