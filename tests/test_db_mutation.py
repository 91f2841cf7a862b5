"""Incremental DB mutation (reference receiver_db.cpp:330-510, 746-806):
insert into / remove from a built DB, rebuilding only touched bundle
indices, and serve correct queries afterwards."""

import numpy as np
import pytest

from apsu_tpu.api.protocol import run_psu
from apsu_tpu.api.parties import Receiver
from apsu_tpu.db.receiver_db import ReceiverDB
from apsu_tpu.mpc.oprf import DebugOprf
from tests.test_psu_e2e import check_oracle, make_sets, small_params


def test_insert_remove_then_query_matches_fresh_build():
    rng = np.random.default_rng(31)
    params = small_params()
    base_items = rng.integers(0, 1 << 64, size=(220, 2), dtype=np.uint64)
    extra = rng.integers(0, 1 << 64, size=(60, 2), dtype=np.uint64)
    gone = base_items[rng.choice(220, size=40, replace=False)]

    oprf = DebugOprf(0x5EED)
    db = ReceiverDB(params, oprf)
    db.set_data(base_items)
    db.insert_or_assign(extra)
    db.remove(gone)

    final_set = {
        (int(a), int(b))
        for a, b in np.concatenate([base_items, extra]).tolist()
    } - {(int(a), int(b)) for a, b in gone.tolist()}
    final_items = np.array(sorted(final_set), dtype=np.uint64)

    # mutated DB must answer queries exactly like a fresh build of final_set
    query = np.concatenate(
        [
            rng.integers(0, 1 << 64, size=(20, 2), dtype=np.uint64),
            final_items[rng.choice(len(final_items), size=12, replace=False)],
            gone[:5],  # removed items must NOT match anymore
        ]
    )
    res = run_psu(params, query, final_items, receiver=Receiver(params, db))
    check_oracle(final_items, query, res)


def test_has_item_and_idempotent_insert():
    rng = np.random.default_rng(32)
    params = small_params()
    items = rng.integers(0, 1 << 64, size=(150, 2), dtype=np.uint64)
    other = rng.integers(0, 1 << 64, size=(10, 2), dtype=np.uint64)
    db = ReceiverDB(params, DebugOprf())
    db.set_data(items)
    assert db.has_item(items[:20]).all()
    assert not db.has_item(other).any()

    before = db.stats.n_insertions
    db.insert_or_assign(items[:20])  # all present: no-op
    assert db.stats.n_insertions == before


def test_insert_grows_cache_axis():
    """Inserting past K per bin spills into a new cache (BinBundle
    first-fit semantics, bin_bundle.cpp:477)."""
    rng = np.random.default_rng(33)
    params = small_params(
        table_size=64, max_items_per_bin=4, hash_func_count=2,
        query_powers=(1, 2, 3, 4),
    )
    items = rng.integers(0, 1 << 64, size=(80, 2), dtype=np.uint64)
    db = ReceiverDB(params, DebugOprf())
    db.set_data(items)
    c_before = db.stats.n_caches
    extra = rng.integers(0, 1 << 64, size=(120, 2), dtype=np.uint64)
    db.insert_or_assign(extra)
    assert db.stats.n_caches >= c_before
    assert db.coeff_cache.shape[1] == db.stats.n_caches
    # correctness after growth
    all_items = np.unique(np.concatenate([items, extra]), axis=0)
    query = np.concatenate(
        [
            rng.integers(0, 1 << 64, size=(15, 2), dtype=np.uint64),
            all_items[:10],
        ]
    )
    res = run_psu(params, query, all_items, receiver=Receiver(params, db))
    check_oracle(all_items, query, res)


def test_stripped_db_refuses_mutation():
    rng = np.random.default_rng(34)
    params = small_params()
    items = rng.integers(0, 1 << 64, size=(100, 2), dtype=np.uint64)
    db = ReceiverDB(params, DebugOprf())
    db.set_data(items)
    db.strip()
    with pytest.raises(ValueError, match="stripped"):
        db.insert_or_assign(items[:5])


def test_rebind_matches_fresh_build():
    """rebind(oprf) — the resident-KKRT economics path (session.py): a new
    OPRF correlation over the retained placement must produce the exact
    cache a fresh set_data would, without redoing locations/dedup/ranks."""
    rng = np.random.default_rng(34)
    params = small_params()
    items = rng.integers(0, 1 << 64, size=(200, 2), dtype=np.uint64)

    resident = ReceiverDB(params, DebugOprf(0xAAA))
    resident.set_data(items)
    assert resident.can_rebind

    new_oprf = DebugOprf(0xBBB)
    fresh = ReceiverDB(params, new_oprf, bfv=resident.bfv)
    fresh.set_data(items)
    rebound = resident.rebind(new_oprf)

    assert rebound.stats == fresh.stats
    np.testing.assert_array_equal(
        np.asarray(rebound.coeff_cache), np.asarray(fresh.coeff_cache)
    )
    # the resident DB is untouched and still rebindable
    assert resident.can_rebind

    # a query against the rebound DB is exact
    query = np.concatenate(
        [
            rng.integers(0, 1 << 64, size=(24, 2), dtype=np.uint64),
            items[rng.choice(len(items), size=8, replace=False)],
        ]
    )
    from apsu_tpu.api.parties import Sender

    res = run_psu(
        params, query, items,
        sender=Sender(params, new_oprf),
        receiver=Receiver(params, rebound),
    )
    check_oracle(items, query, res)


def test_rebind_refuses_after_mutation_or_strip():
    rng = np.random.default_rng(35)
    params = small_params()
    items = rng.integers(0, 1 << 64, size=(120, 2), dtype=np.uint64)
    db = ReceiverDB(params, DebugOprf())
    db.set_data(items)
    db.insert_or_assign(rng.integers(0, 1 << 64, size=(5, 2), dtype=np.uint64))
    assert not db.can_rebind
    with pytest.raises(ValueError):
        db.rebind(DebugOprf(1))
