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
) -> PsuResult:
    """Full PSU with the REAL MPC stack — interactive KKRT OPRF during DB
    build, DDH permuted equality test, chosen-message OT of the difference
    set — both parties as threads over one in-process duplex (the two-process
    network deployment uses SocketDuplex with the identical flow)."""
    import threading

    import jax

    from apsu_tpu.mpc.duplex import pipe_pair
    from apsu_tpu.mpc.endgame import (
        endgame_db_side,
        endgame_query_side,
        felts_to_blocks,
    )
    from apsu_tpu.mpc.kkrt import KkrtReceiver, KkrtSender

    ch_q, ch_db = pipe_pair()
    timings: Dict[str, float] = {}
    out: Dict[str, np.ndarray] = {}
    errors = []
    bpf = None  # set below

    def query_thread():
        try:
            rng = np.random.default_rng(seed + 1)
            snd = Sender(
                params,
                oprf=None,
                seed=seed + 11,
                oprf_factory=lambda table: KkrtReceiver(ch_q, table, rng),
            )
            t0 = time.perf_counter()
            req = snd.create_query(sender_items)
            timings["create_query"] = time.perf_counter() - t0
            ch_q.send(jax.device_get(req.powers_data))
            ch_q.send(np.asarray(req.power_list, dtype=np.int64))
            if req.relin_key is not None:
                ch_q.send(jax.device_get(req.relin_key))
            else:
                ch_q.send(b"none")
            results = ch_q.recv()
            eval_level = int(ch_q.recv()[0])
            t0 = time.perf_counter()
            mat = snd.extract_matrix(QueryResponse(results, eval_level))
            timings["decrypt"] = time.perf_counter() - t0
            blocks = felts_to_blocks(
                snd.peqt_matrix(mat), params.item_bit_count_per_felt
            )
            item_bytes = np.ascontiguousarray(snd.cuckoo.table).view(np.uint8).reshape(-1, 16)
            t0 = time.perf_counter()
            endgame_query_side(ch_q, blocks, item_bytes, snd.cuckoo.filled, rng)
            timings["endgame_query"] = time.perf_counter() - t0
            out["sent_bytes_q"] = ch_q.bytes_sent
        except Exception as e:  # pragma: no cover
            errors.append(e)

    def db_thread():
        try:
            rng = np.random.default_rng(seed + 2)
            oprf = KkrtSender(ch_db, params.table_params.table_size, rng)
            t0 = time.perf_counter()
            db = ReceiverDB(params, oprf)
            db.set_data(receiver_items)
            timings["db_build"] = time.perf_counter() - t0
            recv = Receiver(params, db, seed=seed + 12)
            powers_data = ch_db.recv()
            plist = tuple(int(x) for x in ch_db.recv())
            rk = ch_db.recv()
            rk = None if isinstance(rk, bytes) else rk
            t0 = time.perf_counter()
            resp = recv.run_query(
                QueryRequest(power_list=plist, powers_data=jnp_asarray(powers_data), relin_key=rk)
            )
            timings["run_query"] = time.perf_counter() - t0
            ch_db.send(jax.device_get(resp.results))
            ch_db.send(np.array([resp.eval_level], dtype=np.int64))
            blocks = felts_to_blocks(
                recv.peqt_matrix(), params.item_bit_count_per_felt
            )
            t0 = time.perf_counter()
            transferred = endgame_db_side(ch_db, blocks, rng)
            timings["endgame_db"] = time.perf_counter() - t0
            out["transferred"] = transferred
        except Exception as e:  # pragma: no cover
            errors.append(e)

    def jnp_asarray(x):
        import jax.numpy as jnp

        return jnp.asarray(x)

    tq = threading.Thread(target=query_thread)
    tdb = threading.Thread(target=db_thread)
    tq.start(); tdb.start()
    tq.join(); tdb.join()
    if errors:
        raise errors[0]
    transferred = out["transferred"]
    union = np.unique(np.concatenate([receiver_items, transferred]), axis=0)
    return PsuResult(union=union, transferred=transferred, timings=timings)
