"""End-to-end PSU correctness with the set-algebra oracle.

Oracle mirrors the reference's auto_test ``check_ans``
(/root/reference/tools/auto_test.py:16-39): transferred = query ∖ db,
no transferred item may be in db, union cardinality adds up.
"""

import numpy as np
import pytest

from apsu_tpu.api.protocol import run_psu
from apsu_tpu.core.params import PSUParams


def small_params(
    table_size=64,
    max_items_per_bin=8,
    hash_func_count=2,
    n=256,
    query_powers=(1, 2, 3, 4, 5, 6, 7, 8),
    ps_low_degree=0,
    coeff_bits=(40, 40, 30),
):
    return PSUParams.from_dict(
        {
            "table_params": {
                "hash_func_count": hash_func_count,
                "table_size": table_size,
                "max_items_per_bin": max_items_per_bin,
            },
            "item_params": {"felts_per_item": 4},
            "query_params": {
                "ps_low_degree": ps_low_degree,
                "query_powers": list(query_powers),
            },
            "seal_params": {
                "plain_modulus": 65537,
                "poly_modulus_degree": n,
                "coeff_modulus_bits": list(coeff_bits),
            },
        }
    )


def make_sets(rng, n_db, n_query, n_common):
    """Random 128-bit item sets with a planted intersection."""
    db = rng.integers(0, 1 << 64, size=(n_db, 2), dtype=np.uint64)
    fresh = rng.integers(0, 1 << 64, size=(n_query - n_common, 2), dtype=np.uint64)
    common = db[rng.choice(n_db, size=n_common, replace=False)]
    query = np.concatenate([fresh, common])
    rng.shuffle(query)
    return db, query


def as_set(a):
    return {(int(x), int(y)) for x, y in a}


def check_oracle(db, query, result):
    """The reference's check_ans semantics (auto_test.py:16-39)."""
    dbs, qs = as_set(db), as_set(query)
    trans = as_set(result.transferred)
    union = as_set(result.union)
    assert trans == qs - dbs, (
        f"transferred != query - db: missing {len((qs - dbs) - trans)}, "
        f"extra {len(trans - (qs - dbs))}"
    )
    assert union == dbs | qs
    assert not (trans & dbs)
    assert len(union) == len(dbs) + len(qs - dbs)


def test_psu_small_no_multiply():
    """All powers are query sources: no ct×ct needed (100K-1 shape)."""
    rng = np.random.default_rng(0)
    params = small_params()
    db, query = make_sets(rng, n_db=300, n_query=40, n_common=17)
    res = run_psu(params, query, db)
    check_oracle(db, query, res)


@pytest.mark.slow
def test_psu_with_power_dag():
    """Sparse query powers force ct×ct multiplies + relinearization."""
    rng = np.random.default_rng(1)
    params = small_params(
        table_size=128,
        hash_func_count=3,
        max_items_per_bin=16,
        query_powers=(1, 2, 5, 8, 11, 14, 15, 16),
        coeff_bits=(48, 48, 48, 28),
    )
    db, query = make_sets(rng, n_db=400, n_query=50, n_common=23)
    res = run_psu(params, query, db)
    check_oracle(db, query, res)


def test_psu_empty_intersection():
    rng = np.random.default_rng(2)
    params = small_params()
    db, query = make_sets(rng, n_db=200, n_query=30, n_common=0)
    res = run_psu(params, query, db)
    check_oracle(db, query, res)
    assert len(res.transferred) == 30


def test_psu_full_overlap():
    rng = np.random.default_rng(3)
    params = small_params()
    db, query = make_sets(rng, n_db=200, n_query=25, n_common=25)
    res = run_psu(params, query, db)
    check_oracle(db, query, res)
    assert len(res.transferred) == 0


@pytest.mark.slow
def test_psu_paterson_stockmeyer():
    """PS path: ps_low_degree=4, max bin 24 -> inner deg-4 sums × y^k outer
    products with one relinearization (16M-4096 structure, scaled down)."""
    rng = np.random.default_rng(4)
    params = small_params(
        table_size=96,
        hash_func_count=3,
        max_items_per_bin=28,
        ps_low_degree=4,
        query_powers=(1, 2, 3, 4, 5, 10, 25),  # low {1..4}, high y^1, y^2, y^5
        coeff_bits=(48, 48, 48, 48, 48, 30),
    )
    db, query = make_sets(rng, n_db=800, n_query=36, n_common=15)
    res = run_psu(params, query, db)
    check_oracle(db, query, res)


def test_psu_real_mpc_stack():
    """Full protocol with the REAL MPC primitives: interactive KKRT OPRF,
    DDH permuted equality test, chosen-OT transfer of the difference set."""
    from apsu_tpu.api.protocol import run_psu_mpc

    rng = np.random.default_rng(5)
    params = small_params()
    db, query = make_sets(rng, n_db=250, n_query=35, n_common=12)
    res = run_psu_mpc(params, query, db)
    check_oracle(db, query, res)


def test_psu_real_mpc_osn_variant():
    """Full protocol with the OSN/Benes PEQT variant (the reference's
    default endgame: sender_cli_osn)."""
    from apsu_tpu.api.protocol import run_psu_mpc

    rng = np.random.default_rng(6)
    params = small_params()
    db, query = make_sets(rng, n_db=220, n_query=30, n_common=9)
    res = run_psu_mpc(params, query, db, peqt="osn")
    check_oracle(db, query, res)


def test_psu_cardsum_mode():
    """CARD/CARDSUM: DB party learns |X∖Y| and Σ values, not the items."""
    import threading

    from apsu_tpu.api.session import run_db_party, run_query_party
    from apsu_tpu.mpc.duplex import pipe_pair

    rng = np.random.default_rng(8)
    params = small_params()
    db, query = make_sets(rng, n_db=200, n_query=30, n_common=10)
    values = np.arange(1, 31, dtype=np.uint64) * 100
    qs, dbs = as_set(query), as_set(db)
    expect_card = len(qs - dbs)
    expect_sum = sum(
        int(v) for v, it in zip(values, map(tuple, query.tolist())) if it not in dbs
    )

    ch_q, ch_db = pipe_pair()
    out = {}
    errs = []

    def q():
        try:
            run_query_party(
                ch_q, query, np.random.default_rng(1), params=params,
                mode="cardsum", values=values,
            )
        except Exception as e:
            errs.append(e)

    def d():
        try:
            out["res"] = run_db_party(ch_db, params, db, np.random.default_rng(2))
        except Exception as e:
            errs.append(e)

    t1, t2 = threading.Thread(target=q), threading.Thread(target=d)
    t1.start(); t2.start(); t1.join(); t2.join()
    if errs:
        raise errs[0]
    card, vsum = out["res"]
    assert card == expect_card, (card, expect_card)
    assert vsum == expect_sum, (vsum, expect_sum)


def test_db_checkpoint_roundtrip(tmp_path):
    """Serialized ReceiverDB checkpoint: save after build, load, serve a
    query from the loaded DB (reference receiver_db.cpp:1182-1429 flow)."""
    from apsu_tpu.api.parties import Receiver
    from apsu_tpu.db.receiver_db import ReceiverDB
    from apsu_tpu.mpc.oprf import DebugOprf

    rng = np.random.default_rng(9)
    params = small_params()
    db_items, query = make_sets(rng, n_db=260, n_query=28, n_common=13)
    oprf = DebugOprf(0x5EED)
    db = ReceiverDB(params, oprf)
    db.set_data(db_items)
    db.strip()
    db.save(str(tmp_path / "ckpt"))

    loaded = ReceiverDB.load(str(tmp_path / "ckpt"), oprf=oprf)
    assert loaded.stats.n_items == db.stats.n_items
    res = run_psu(
        params, query, db_items, receiver=Receiver(params, loaded)
    )
    check_oracle(db_items, query, res)


def test_query_validation_rejects_bad_requests():
    from apsu_tpu.api.parties import QueryRequest, Receiver, Sender
    from apsu_tpu.db.receiver_db import ReceiverDB
    from apsu_tpu.mpc.oprf import DebugOprf
    import jax.numpy as jnp

    rng = np.random.default_rng(11)
    params = small_params()
    db_items, query = make_sets(rng, n_db=150, n_query=20, n_common=5)
    oprf = DebugOprf()
    db = ReceiverDB(params, oprf)
    db.set_data(db_items)
    recv = Receiver(params, db)
    snd = Sender(params, oprf)
    req = snd.create_query(query)

    bad = QueryRequest(
        power_list=tuple(list(req.power_list)[:-1] + [99]),
        powers_data=req.powers_data,
        relin_key=req.relin_key,
    )
    with pytest.raises(ValueError, match="query powers"):
        recv.run_query(bad)

    bad2 = QueryRequest(
        power_list=req.power_list,
        powers_data=req.powers_data[:, :, :, :, : params.poly_degree // 2],
        relin_key=req.relin_key,
    )
    with pytest.raises(ValueError, match="degree mismatch"):
        recv.run_query(bad2)


def test_cuckoo_table_overflow_raises():
    from apsu_tpu.hash.cuckoo import CuckooFullError, cuckoo_insert

    rng = np.random.default_rng(12)
    items = rng.integers(0, 1 << 64, size=(65, 2), dtype=np.uint64)
    with pytest.raises(CuckooFullError):
        cuckoo_insert(items, table_size=64, func_count=2)
