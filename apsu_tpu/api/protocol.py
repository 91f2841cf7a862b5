"""In-process PSU protocol driver with a pluggable endgame.

Runs the full pipeline — cuckoo → slot-bound OPRF → encrypted query powers →
homomorphic matching-poly evaluation → decrypt → permuted equality test →
OT of the difference set — with both parties in one process.  The PEQT and
final OT are behind small interfaces; `DebugEndgame` computes the same
functionality in the clear (for tests/benchmarks), real MPC backends slot in
without touching this flow.

Reference flow being mirrored: sender_osn.cpp:498-600 (request_query →
decrypt_randoms_matrix → osn_peqt_sender → ALSZ chosen-OT send of permuted
items) and receiver_osn.cpp:140-381 (RunQuery → osn_peqt_receiver →
chosen-OT receive → union.csv).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Dict, Optional, Tuple

import numpy as np

from apsu_tpu.api.parties import QueryRequest, QueryResponse, Receiver, Sender
from apsu_tpu.core.params import PSUParams
from apsu_tpu.db.receiver_db import ReceiverDB
from apsu_tpu.mpc.oprf import DebugOprf


class DebugEndgame:
    """Clear-text PEQT + OT functionality (matching OSNPEQT.cpp semantics:
    receiver learns which columns matched, sender learns the permutation —
    here the permutation is identity and the 'OT' hands over items directly).
    """

    def run(
        self,
        sender_blocks: np.ndarray,    # [C, S, fpi] decrypted result felts
        receiver_blocks: np.ndarray,  # [C, S, fpi] mask felts
        sender_items: np.ndarray,     # [S, 2] original items per slot (junk ok)
        sender_filled: np.ndarray,    # [S] bool
    ) -> np.ndarray:
        matched = (sender_blocks == receiver_blocks).all(axis=2).any(axis=0)  # [S]
        take = sender_filled & ~matched
        return sender_items[take]


@dataclass
class PsuResult:
    union: np.ndarray            # [m, 2] uint64: receiver items ∪ transferred
    transferred: np.ndarray      # [k, 2] items sent over (X \ Y)
    timings: Dict[str, float] = field(default_factory=dict)


def run_psu(
    params: PSUParams,
    sender_items: np.ndarray,
    receiver_items: np.ndarray,
    oprf_key: int = 0x5EED,
    endgame=None,
    sender: Optional[Sender] = None,
    receiver: Optional[Receiver] = None,
) -> PsuResult:
    """Full in-process PSU; returns the union as 128-bit item values."""
    timings: Dict[str, float] = {}
    endgame = endgame or DebugEndgame()
    oprf = DebugOprf(oprf_key)

    t0 = time.perf_counter()
    if receiver is None:
        db = ReceiverDB(params, oprf)
        db.set_data(receiver_items)
        receiver = Receiver(params, db)
    timings["db_build"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    if sender is None:
        sender = Sender(params, oprf)
    timings["sender_setup"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    req = sender.create_query(sender_items)
    timings["create_query"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    resp = receiver.run_query(req)
    timings["run_query"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    slot_matrix = sender.extract_matrix(resp)
    timings["decrypt"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    transferred = endgame.run(
        sender.peqt_matrix(slot_matrix),
        receiver.peqt_matrix(),
        sender.cuckoo.table,
        sender.cuckoo.filled,
    )
    timings["endgame"] = time.perf_counter() - t0

    union = np.unique(np.concatenate([receiver_items, transferred]), axis=0)
    return PsuResult(union=union, transferred=transferred, timings=timings)


def run_psu_mpc(
    params: PSUParams,
    sender_items: np.ndarray,
    receiver_items: np.ndarray,
    seed: int = 7,
    peqt: str = "ddh",
) -> PsuResult:
    """Full PSU with the REAL MPC stack — interactive KKRT OPRF during DB
    build, DDH permuted equality test, chosen-message OT of the difference
    set — both parties as threads over one in-process duplex (the two-process
    network deployment runs the same api.session flow over a SocketDuplex)."""
    import threading

    from apsu_tpu.api.session import run_db_party, run_query_party
    from apsu_tpu.mpc.duplex import pipe_pair

    ch_q, ch_db = pipe_pair()
    timings: Dict[str, float] = {}
    out: Dict[str, np.ndarray] = {}
    errors = []

    def query_thread():
        try:
            from apsu_tpu.mpc.prg import CsRng

            rng = CsRng(b"run_psu_mpc/query:%08d" % (seed,))
            run_query_party(
                ch_q, sender_items, rng, params=params, timings=timings, peqt=peqt
            )
        except Exception as e:  # pragma: no cover
            errors.append(e)

    def db_thread():
        try:
            from apsu_tpu.mpc.prg import CsRng

            rng = CsRng(b"run_psu_mpc/db:%08d" % (seed,))
            out["transferred"] = run_db_party(
                ch_db, params, receiver_items, rng, timings=timings
            )
        except Exception as e:  # pragma: no cover
            errors.append(e)

    tq = threading.Thread(target=query_thread)
    tdb = threading.Thread(target=db_thread)
    tq.start(); tdb.start()
    tq.join(); tdb.join()
    if errors:
        raise errors[0]
    transferred = np.ascontiguousarray(out["transferred"]).view(np.uint64).reshape(-1, 2)
    union = np.unique(np.concatenate([receiver_items, transferred]), axis=0)
    timings["bytes_on_wire"] = ch_q.bytes_sent + ch_db.bytes_sent
    return PsuResult(union=union, transferred=transferred, timings=timings)
