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

    # strip() must also invalidate the retained placement (ADVICE r4)
    db2 = ReceiverDB(params, DebugOprf(), bfv=db.bfv)
    db2.set_data(items)
    assert db2.can_rebind
    db2.strip()
    assert not db2.can_rebind
    with pytest.raises(ValueError):
        db2.rebind(DebugOprf(2))


def test_place_data_build_partition_matches_direct():
    """The 256M-grid path — place once, materialize each cache-range
    partition from the shared placement — must produce bit-identical
    caches to a direct cache-range set_data (reference scaling axis:
    receiver_osn.cpp:188-205)."""
    rng = np.random.default_rng(37)
    params = small_params(table_size=128, hash_func_count=3,
                          max_items_per_bin=8)
    items = rng.integers(0, 1 << 64, size=(900, 2), dtype=np.uint64)

    oprf = DebugOprf(0xCC)
    placer = ReceiverDB(params, oprf)
    C_total = placer.place_data(items)
    assert C_total >= 2, "test shape must overflow into multiple caches"
    assert placer.coeff_cache is None  # placement-only: no device build

    for c0 in range(0, C_total, 2):
        c1 = min(C_total, c0 + 2)
        part = placer.build_partition((c0, c1))
        direct = ReceiverDB(params, oprf, bfv=placer.bfv,
                            cache_range=(c0, c1))
        direct.set_data(items)
        assert part.stats == direct.stats
        np.testing.assert_array_equal(
            np.asarray(part.coeff_cache), np.asarray(direct.coeff_cache)
        )
        np.testing.assert_array_equal(
            np.asarray(part.ps_const_polys if part.ps_const_polys is not None
                       else part.const_slots),
            np.asarray(direct.ps_const_polys
                       if direct.ps_const_polys is not None
                       else direct.const_slots),
        )


def test_rebind_forwards_loc_seed():
    """A rebound DB keeps the resident's LocFuncs seed: a later mutation
    on the rebound DB must compute the SAME cuckoo locations (ADVICE r4 —
    the default-seed regression would corrupt silently)."""
    rng = np.random.default_rng(36)
    params = small_params()
    items = rng.integers(0, 1 << 64, size=(150, 2), dtype=np.uint64)
    seed = b"custom-loc-seed"
    db = ReceiverDB(params, DebugOprf(0xAAA), loc_seed=seed)
    db.set_data(items)
    rebound = db.rebind(DebugOprf(0xBBB))
    assert rebound._loc_seed == seed
    item = items[7:8]
    np.testing.assert_array_equal(
        db.locs.locations(item), rebound.locs.locations(item)
    )
