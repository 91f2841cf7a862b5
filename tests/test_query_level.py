"""Query-encryption-level overrides end to end: with a measured "query"
entry the sender encrypts its power ciphertexts (and generates its relin
key) at a REDUCED chain level, both parties derive the same level from the
shared parameter content, and the union stays exact.  Exercises the whole
path the calibration tool measures (engine/probe.py → parties → protocol).
"""

import numpy as np
import pytest

from apsu_tpu.api.protocol import run_psu
from apsu_tpu.db import measured_levels

from tests.test_psu_e2e import check_oracle, make_sets, small_params


@pytest.fixture
def ps_params_with_query_override():
    """Deep-chain PS config + an injected {query: k-1} measured entry."""
    params = small_params(
        table_size=96,
        hash_func_count=3,
        max_items_per_bin=28,
        ps_low_degree=4,
        query_powers=(1, 2, 3, 4, 5, 10, 25),
        coeff_bits=(48, 48, 48, 48, 48, 30),
    )
    key = measured_levels.params_key(params)
    saved = measured_levels.MEASURED.get(key)
    yield params, key
    if saved is None:
        measured_levels.MEASURED.pop(key, None)
    else:
        measured_levels.MEASURED[key] = saved


@pytest.mark.slow
def test_ps_union_exact_with_reduced_query_level(ps_params_with_query_override):
    params, key = ps_params_with_query_override
    from apsu_tpu.core.bfv import BfvContext

    k = len(BfvContext(params.seal_params).q_primes)
    assert k >= 3
    measured_levels.MEASURED[key] = {"query": k - 1}
    assert measured_levels.query_level(params, k) == k - 1

    rng = np.random.default_rng(9)
    db, query = make_sets(rng, n_db=800, n_query=36, n_common=15)
    res = run_psu(params, query, db)
    check_oracle(db, query, res)


def test_query_level_mismatch_rejected(ps_params_with_query_override):
    """A query encrypted at the wrong level must be rejected by the DB
    party's validation (limb-count check), not mis-served."""
    from apsu_tpu.api.parties import Receiver, Sender
    from apsu_tpu.core.bfv import BfvContext
    from apsu_tpu.db.receiver_db import ReceiverDB
    from apsu_tpu.mpc.oprf import DebugOprf

    params, key = ps_params_with_query_override
    k = len(BfvContext(params.seal_params).q_primes)
    rng = np.random.default_rng(10)
    db_items, query = make_sets(rng, n_db=300, n_query=20, n_common=5)

    # sender builds at the FULL level (no override yet)...
    snd = Sender(params, oprf=DebugOprf(7), rng=np.random.default_rng(1))
    req = snd.create_query(query)

    # ...then the DB party expects the overridden reduced level
    measured_levels.MEASURED[key] = {"query": k - 1}
    db = ReceiverDB(params, oprf=DebugOprf(7))
    db.set_data(db_items)
    recv = Receiver(params, db, rng=np.random.default_rng(2))
    with pytest.raises(ValueError, match="limbs"):
        recv.validate_query(req)
