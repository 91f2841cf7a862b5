"""Round-2 regression tests: PS coefficient-plane bound (dense full bins)
and the DDH PEQT row shuffle."""

import pytest
import threading

import numpy as np

from apsu_tpu.core.params import PSUParams
from apsu_tpu.engine.probe import dense_query_probe


def _ps_params_k15():
    """The dangerous PS shape: (K+1) % DEG_CHUNK == 0 AND K % ph < ℓ.

    K=15, ps_low_degree=4 (ph=5): the last PS chunk gathers planes
    3·5+1..3·5+4 = 16..19, past the K+1=16 real planes.  Without explicit
    zero padding to nh·ph+ℓ+1 planes, index clipping lands on plane 15 — the
    NONZERO monic leading coefficient of full bins — and every full-bin
    result is silently wrong (ADVICE round 1, medium)."""
    return PSUParams.from_dict(
        {
            "table_params": {
                "hash_func_count": 1,
                "table_size": 32,
                "max_items_per_bin": 15,
            },
            "item_params": {"felts_per_item": 4},
            "query_params": {
                "ps_low_degree": 4,
                "query_powers": [1, 2, 3, 4, 5, 15],
            },
            "seal_params": {
                "plain_modulus": 65537,
                "poly_modulus_degree": 128,
                "coeff_modulus_bits": [48, 48, 48, 48, 48, 30],
            },
        }
    )


@pytest.mark.slow
def test_ps_dense_full_bins_k_mod_ph_below_ell():
    params = _ps_params_k15()
    res = dense_query_probe(params, np.random.default_rng(0), n_caches=2)
    assert res.exact, f"{res.n_wrong}/{res.n_matched} matches decrypted wrong"
    assert res.n_matched > 0
    assert res.n_false == 0
    assert res.noise_budget_bits > 0


def test_ps_cache_planes_cover_gather_range():
    from apsu_tpu.db.receiver_db import ReceiverDB

    params = _ps_params_k15()
    db = ReceiverDB(params, oprf=None)
    db.set_synthetic_dense(np.random.default_rng(1))
    K = params.table_params.max_items_per_bin
    ph = params.query_params.ps_low_degree + 1
    nh = K // ph
    assert db.coeff_cache.shape[2] >= nh * ph + params.query_params.ps_low_degree + 1


@pytest.mark.slow
def test_dense_probe_non_ps():
    params = PSUParams.from_dict(
        {
            "table_params": {
                "hash_func_count": 1,
                "table_size": 32,
                "max_items_per_bin": 8,
            },
            "item_params": {"felts_per_item": 4},
            "query_params": {"ps_low_degree": 0, "query_powers": [1, 2, 5, 8]},
            "seal_params": {
                "plain_modulus": 65537,
                "poly_modulus_degree": 128,
                "coeff_modulus_bits": [40, 40, 30],
            },
        }
    )
    res = dense_query_probe(params, np.random.default_rng(2), n_caches=2)
    assert res.exact and res.n_matched > 0 and res.n_false == 0


def test_ddh_peqt_row_shuffle_hides_matching_row():
    """The DB party must see matches at σ_j-shuffled rows, not the true
    cache row (reference peqt_from_ddh.hpp:31-44 shuffles rows + columns)."""
    from apsu_tpu.mpc.duplex import pipe_pair
    from apsu_tpu.mpc.peqt import ddh_peqt_receiver, ddh_peqt_sender

    rng_a = np.random.default_rng(3)
    C, S = 4, 24
    sender_blocks = rng_a.integers(0, 256, size=(C, S, 16), dtype=np.uint8)
    receiver_blocks = rng_a.integers(0, 256, size=(C, S, 16), dtype=np.uint8)
    # plant a match at TRUE row 2 of every column
    receiver_blocks[2] = sender_blocks[2]

    ch_s, ch_r = pipe_pair()
    out = {}
    errs = []

    def s():
        try:
            out["perm"] = ddh_peqt_sender(ch_s, sender_blocks, np.random.default_rng(4))
        except Exception as e:
            errs.append(e)

    def r():
        try:
            out["eq"] = ddh_peqt_receiver(
                ch_r, receiver_blocks, np.random.default_rng(5), return_rows=True
            )
        except Exception as e:
            errs.append(e)

    t1, t2 = threading.Thread(target=s), threading.Thread(target=r)
    t1.start(); t2.start(); t1.join(); t2.join()
    if errs:
        raise errs[0]
    eq = out["eq"]
    # every column still matches (any-row semantics preserved) ...
    assert eq.any(axis=0).all()
    # ... exactly once (the planted row) ...
    assert (eq.sum(axis=0) == 1).all()
    # ... but the OBSERVED row indices are shuffled per column: with 24
    # columns and uniform σ_j, all landing on the true row 2 has
    # probability 4^-24 ≈ 3e-15
    observed_rows = eq.argmax(axis=0)
    assert len(np.unique(observed_rows)) > 1, "row shuffle missing"
