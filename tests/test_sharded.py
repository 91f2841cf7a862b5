"""Multi-device sharded evaluation on the virtual 8-device CPU mesh:
the sharded runtime must produce bit-identical result ciphertexts to the
single-device evaluator — on BOTH query paths (plain dot product and
Paterson-Stockmeyer), powers included."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from apsu_tpu.api.parties import Receiver, Sender
from apsu_tpu.core.bfv import Ciphertext
from apsu_tpu.db.receiver_db import ReceiverDB
from apsu_tpu.engine.evaluator import compute_power_tensor, eval_matching_polys
from apsu_tpu.mpc.oprf import DebugOprf
from apsu_tpu.mpc.prg import CsRng
from apsu_tpu.parallel.mesh import make_mesh
from apsu_tpu.parallel.runtime import ShardedEvaluator, ShardedReceiver

from tests.test_psu_e2e import make_sets, small_params


def test_sharded_eval_matches_single_device():
    assert len(jax.devices()) >= 8, "needs the 8-device virtual CPU mesh"
    rng = np.random.default_rng(0)
    # 2 bundle indices × C caches; mesh over 8 devices
    params = small_params(table_size=128, hash_func_count=2, n=256)
    db_items, query = make_sets(rng, n_db=700, n_query=40, n_common=15)

    oprf = DebugOprf()
    db = ReceiverDB(params, oprf)
    db.set_data(db_items)
    snd = Sender(params, oprf)
    req = snd.create_query(query)
    recv = Receiver(params, db)

    k = recv.bfv.q.k
    cts = {
        s: Ciphertext(req.powers_data[i], is_ntt=False, level=k)
        for i, s in enumerate(req.power_list)
    }
    powers = compute_power_tensor(recv.bfv, cts, recv.plan.low, None, db.eval_lvl)
    powers = jnp.moveaxis(powers, 0, 1)

    B = params.bundle_idx_count
    C = db.coeff_cache.shape[1]
    N = params.poly_degree
    mask = rng.integers(0, recv.bfv.t, size=(B, C, N), dtype=np.uint64).astype(np.uint32)

    single = eval_matching_polys(
        recv.bfv, powers, db.coeff_cache, db.const_slots, jnp.asarray(mask), db.eval_lvl
    )

    mesh = make_mesh(8)
    sharded = ShardedEvaluator(db, mesh)
    out = sharded.eval_query(powers, jnp.asarray(mask), db.eval_lvl)

    np.testing.assert_array_equal(
        jax.device_get(out), jax.device_get(single.data)
    )


@pytest.mark.slow
def test_sharded_receiver_full_query_with_power_dag():
    """ShardedReceiver.run_query (sharded power wavefront + sharded eval)
    bit-identical to Receiver.run_query, non-PS with ct×ct powers."""
    assert len(jax.devices()) >= 8
    rng = np.random.default_rng(5)
    params = small_params(
        table_size=128,
        hash_func_count=2,
        max_items_per_bin=16,
        n=256,
        query_powers=(1, 2, 5, 8, 11, 14, 15, 16),
        coeff_bits=(48, 48, 48, 28),
    )
    db_items, query = make_sets(rng, n_db=500, n_query=40, n_common=15)
    oprf = DebugOprf()
    db = ReceiverDB(params, oprf)
    db.set_data(db_items)
    snd = Sender(params, oprf, rng=CsRng(b"sharded-nonps-sender-key"))
    req = snd.create_query(query)

    single = Receiver(params, db, rng=CsRng(b"sharded-nonps-recvr-key1"))
    base = single.run_query(req)
    mesh = make_mesh(8)
    shard = ShardedReceiver(params, db, mesh, rng=CsRng(b"sharded-nonps-recvr-key1"))
    out = shard.run_query(req)

    assert out.eval_level == base.eval_level
    np.testing.assert_array_equal(
        jax.device_get(out.results), jax.device_get(base.results)
    )


@pytest.mark.slow
def test_sharded_receiver_ps_path():
    """The PS pipeline (inner sums, BEHZ outer products, relinearize,
    mod-switch, mask) sharded over 8 devices — bit-identical to the
    single-device evaluator (VERDICT round 1, next #1)."""
    assert len(jax.devices()) >= 8
    rng = np.random.default_rng(6)
    params = small_params(
        table_size=96,
        hash_func_count=3,
        max_items_per_bin=28,
        n=256,
        ps_low_degree=4,
        query_powers=(1, 2, 3, 4, 5, 10, 25),
        coeff_bits=(48, 48, 48, 48, 48, 30),
    )
    db_items, query = make_sets(rng, n_db=800, n_query=36, n_common=15)
    oprf = DebugOprf()
    db = ReceiverDB(params, oprf)
    db.set_data(db_items)
    snd = Sender(params, oprf, rng=CsRng(b"sharded-ps-sender-key-01"))
    req = snd.create_query(query)

    single = Receiver(params, db, rng=CsRng(b"sharded-ps-receiver-key1"))
    base = single.run_query(req)
    mesh = make_mesh(8)
    shard = ShardedReceiver(params, db, mesh, rng=CsRng(b"sharded-ps-receiver-key1"))
    out = shard.run_query(req)

    assert out.eval_level == base.eval_level
    np.testing.assert_array_equal(
        jax.device_get(out.results), jax.device_get(base.results)
    )
