"""Two-party PSU session: the shared wire flow for both deployment modes.

One function per party, parameterized by a Duplex — run them on the two ends
of an in-process pipe (run_psu_mpc) or a TCP socket (the CLIs).  The message
sequence mirrors the reference's protocol phases (SURVEY §3): params
handshake (rop_parms, receiver_dispatcher_osn.cpp:104-126) → interactive
KKRT OPRF during DB build → encrypted query powers (rop_query) → result
packages → DDH permuted equality test → chosen-OT transfer of X∖Y.

Payloads: the OT carries each item's 16-byte payload (its original bytes) so
the DB party reconstructs the union in the clear, like the reference's
sendMessages of original items (sender_osn.cpp:379-399).
"""

from __future__ import annotations

import time
from typing import Dict, Optional, Tuple

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
from apsu_tpu.mpc.prg import CsRng


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
) -> PSUParams:
    """The small-set party.  mode: "union" (transfer X∖Y), "card"
    (cardinality only) or "cardsum" (cardinality + sum of per-item values,
    the reference's CARD/CARDSUM compile-time flags at common/apsu/log.h:
    11-14 folded into runtime config).  Returns the params used.

    rng sources all of this party's secret material; None means an
    OS-entropy CsRng (production default)."""
    timings = timings if timings is not None else {}
    rng = rng if rng is not None else CsRng()
    # params handshake: DB side is authoritative (reference RunParams)
    ch.send(b"params?")
    params_json = ch.recv().decode()
    remote = PSUParams.load_json(params_json)
    if params is not None and params.to_dict() != remote.to_dict():
        raise ValueError("parameter mismatch with DB party")
    params = remote

    snd = Sender(
        params,
        oprf=None,
        rng=rng,
        oprf_factory=lambda table: KkrtReceiver(ch, table, rng),
    )
    t0 = time.perf_counter()
    req = snd.create_query(items)
    timings["create_query"] = time.perf_counter() - t0

    ch.send(jax.device_get(req.powers_data))
    ch.send(np.asarray(req.power_list, dtype=np.int64))
    ch.send(jax.device_get(req.relin_key) if req.relin_key is not None else b"none")

    results = ch.recv()
    eval_level = int(ch.recv()[0])
    t0 = time.perf_counter()
    mat = snd.extract_matrix(QueryResponse(results, eval_level))
    timings["decrypt"] = time.perf_counter() - t0

    blocks = felts_to_blocks(snd.peqt_matrix(mat), params.item_bit_count_per_felt)
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
    ch.send(f"{peqt}:{mode}".encode())
    t0 = time.perf_counter()
    if mode == "union":
        endgame_query_side(
            ch, blocks, payload_by_slot, snd.cuckoo.filled, rng, peqt=peqt
        )
    else:
        vals = np.zeros(params.table_params.table_size, dtype=np.uint64)
        if mode == "cardsum":
            if values is None:
                raise ValueError("cardsum mode needs per-item values")
            idx = snd.cuckoo.item_index
            vals[snd.cuckoo.filled] = values[idx[snd.cuckoo.filled]]
        cardsum_query_side(
            ch, blocks, vals, snd.cuckoo.filled, rng, peqt=peqt
        )
    timings["endgame"] = time.perf_counter() - t0
    return params


def run_db_party(
    ch: Duplex,
    params: PSUParams,
    items: np.ndarray,
    rng=None,
    timings: Optional[Dict[str, float]] = None,
    db: Optional[ReceiverDB] = None,
) -> np.ndarray:
    """The large-set party: serves one query, returns transferred payloads
    [k, 16] uint8 (the difference set X∖Y)."""
    timings = timings if timings is not None else {}
    rng = rng if rng is not None else CsRng()
    assert ch.recv() == b"params?"
    ch.send(params.to_json().encode())

    t0 = time.perf_counter()
    oprf = KkrtSender(ch, params.table_params.table_size, rng)
    if db is None:
        db = ReceiverDB(params, oprf)
        db.set_data(items)
    timings["db_build"] = time.perf_counter() - t0
    recv = Receiver(params, db, rng=rng)

    powers_data = ch.recv()
    plist = tuple(int(x) for x in ch.recv())
    rk = ch.recv()
    rk = None if isinstance(rk, bytes) else jnp.asarray(rk)
    t0 = time.perf_counter()
    resp = recv.run_query(
        QueryRequest(power_list=plist, powers_data=jnp.asarray(powers_data), relin_key=rk)
    )
    timings["run_query"] = time.perf_counter() - t0
    ch.send(jax.device_get(resp.results))
    ch.send(np.array([resp.eval_level], dtype=np.int64))

    blocks = felts_to_blocks(recv.peqt_matrix(), params.item_bit_count_per_felt)
    peqt, mode = ch.recv().decode().split(":")
    t0 = time.perf_counter()
    if mode == "union":
        result = endgame_db_side(ch, blocks, rng, peqt=peqt)
    else:
        result = cardsum_db_side(ch, blocks, rng, peqt=peqt)  # (card, sum)
    timings["endgame"] = time.perf_counter() - t0
    return result
