"""Labeled mode (reference interpolate.cpp:87 Newton label polynomials,
label_encryptor.h): the query party recovers exactly the labels of matched
items; non-matches are blinded by ρ·M(x)."""

import numpy as np
import pytest

from apsu_tpu.api.parties import Receiver, Sender
from apsu_tpu.db.receiver_db import ReceiverDB
from apsu_tpu.hash.items import Bitstring, Item, decrypt_label, encrypt_label
from apsu_tpu.mpc.oprf import DebugOprf
from apsu_tpu.mpc.prg import CsRng
from tests.test_psu_e2e import make_sets, small_params


def _labels_for(items: np.ndarray, cap_bits: int) -> np.ndarray:
    """Deterministic per-item labels fitting the felt capacity."""
    lab = np.zeros((len(items), 16), dtype=np.uint8)
    cap_bytes = cap_bits // 8
    for i, (lo, hi) in enumerate(items):
        d = (int(lo) ^ 0xA5A5A5A5A5A5A5A5).to_bytes(8, "little") + int(hi).to_bytes(
            8, "little"
        )
        lab[i, :cap_bytes] = np.frombuffer(d[:cap_bytes], dtype=np.uint8)
    return lab


def test_labeled_query_recovers_labels():
    rng = np.random.default_rng(41)
    params = small_params()
    cap = params.item_bit_count
    db_items, query = make_sets(rng, n_db=250, n_query=30, n_common=12)
    labels = _labels_for(db_items, cap)

    oprf = DebugOprf()
    db = ReceiverDB(params, oprf)
    db.set_data(db_items, labels=labels)
    assert db.label_cache is not None

    snd = Sender(params, oprf, rng=CsRng(b"labeled-test-sender-key1"))
    req = snd.create_query(query)
    recv = Receiver(params, db, rng=CsRng(b"labeled-test-receiver-k1"))
    resp = recv.run_query(req)
    assert resp.label_results is not None

    # match detection via the debug endgame view: mask vs decrypted matrix
    mat = snd.extract_matrix(resp)
    mask = recv.last_mask
    label_rows = snd.extract_labels(resp)      # [C, S, 16]

    # expected labels by slot for planted common items
    label_by_item = {
        (int(a), int(b)): bytes(l) for (a, b), l in zip(db_items.tolist(), labels)
    }
    slot_items = snd.cuckoo.table
    filled = snd.cuckoo.filled
    from apsu_tpu.api.parties import _slots_to_item_blocks

    match_blocks = _slots_to_item_blocks(params, mat)        # [C, S, fpi]
    mask_blocks = _slots_to_item_blocks(params, mask)
    matched_any = 0
    for s in range(params.table_params.table_size):
        if not filled[s]:
            continue
        key = (int(slot_items[s, 0]), int(slot_items[s, 1]))
        for c in range(match_blocks.shape[0]):
            if np.array_equal(match_blocks[c, s], mask_blocks[c, s]):
                assert key in label_by_item, "false match in labeled test"
                assert bytes(label_rows[c, s]) == label_by_item[key], (
                    f"label mismatch at slot {s}"
                )
                matched_any += 1
    assert matched_any >= 10, "planted matches not found"


def test_label_encryptor_roundtrip():
    rng = np.random.default_rng(42)
    item = rng.integers(0, 1 << 64, size=(1, 2), dtype=np.uint64)
    other = rng.integers(0, 1 << 64, size=(1, 2), dtype=np.uint64)
    label = b"secret-label-16b"
    nonce = bytes(rng.integers(0, 256, size=16, dtype=np.uint8))
    blob = encrypt_label(label, item, nonce)
    assert decrypt_label(blob, item) == label
    assert decrypt_label(blob, other) != label


def test_item_and_bitstring_types():
    a = Item.of("hello")
    b = Item.of("hello")
    c = Item.of("world")
    assert a == b and a != c
    assert a.to_array().shape == (1, 2)

    Bitstring(b"\x0f", 4)
    with pytest.raises(ValueError):
        Bitstring(b"\xff", 4)  # nonzero padding bits
    with pytest.raises(ValueError):
        Bitstring(b"\x00\x00", 4)  # wrong length


def test_oversized_label_rejected():
    rng = np.random.default_rng(43)
    params = small_params()  # 4 felts × 16 bits = 64-bit capacity
    items = rng.integers(0, 1 << 64, size=(50, 2), dtype=np.uint64)
    labels = rng.integers(0, 256, size=(50, 16), dtype=np.uint8)  # full 128 bits
    db = ReceiverDB(params, DebugOprf())
    with pytest.raises(ValueError, match="capacity"):
        db.set_data(items, labels=labels)
