"""Wire-format tests: typed framing, residue bit-packing, seed-compressed
ciphertexts, and the transcript-size budget of the compressed protocol."""

import numpy as np
import pytest

from apsu_tpu.net.wire import (
    OP_PARAMS,
    OP_QUERY,
    ProtocolError,
    RemoteError,
    TypedDuplex,
    pack_residues,
    packed_nbytes,
    unpack_residues,
)


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    primes = [536813569, 268369921, 65537]
    shape = (2, 3, 2, len(primes), 64)
    arr = np.empty(shape, np.uint32)
    for j, p in enumerate(primes):
        arr[..., j, :] = rng.integers(0, p, size=shape[:-2] + (shape[-1],))
    buf = pack_residues(arr, primes)
    assert buf.nbytes == packed_nbytes(primes, shape)
    # 30+29+17 bits vs 3×32: ~21% of the naive uint32 encoding saved
    assert buf.nbytes < arr.nbytes * 0.85
    back = unpack_residues(buf, primes, shape)
    assert np.array_equal(back, arr)


def test_typed_duplex_ops_and_errors():
    from apsu_tpu.mpc.duplex import pipe_pair

    a, b = pipe_pair()
    ta, tb = TypedDuplex(a), TypedDuplex(b)
    ta.send_op(OP_PARAMS, b"hello")
    assert tb.expect(OP_PARAMS) == b"hello"

    ta.send_op(OP_QUERY, np.arange(5, dtype=np.int64))
    with pytest.raises(ProtocolError, match="expected OP_PARAMS"):
        tb.expect(OP_PARAMS)

    ta.send_error("boom upstream")
    with pytest.raises(RemoteError, match="boom upstream"):
        tb.expect(OP_PARAMS)

    # scoped view tags subprotocol traffic
    sa, sb = ta.scoped(OP_QUERY), tb.scoped(OP_QUERY)
    sa.send(np.ones(3, np.uint32))
    assert np.array_equal(sb.recv(), np.ones(3, np.uint32))


def test_seed_compressed_ciphertext_roundtrip():
    """encrypt with a_seed -> ship c0 only -> reconstruct -> decrypt."""
    from apsu_tpu.core.bfv import BfvContext
    from apsu_tpu.core.params import PSUParams

    params = PSUParams.from_dict(
        {
            "table_params": {
                "hash_func_count": 1,
                "table_size": 16,
                "max_items_per_bin": 4,
            },
            "item_params": {"felts_per_item": 4},
            "query_params": {"ps_low_degree": 0, "query_powers": [1, 2, 3, 4]},
            "seal_params": {
                "plain_modulus": 65537,
                "poly_modulus_degree": 64,
                "coeff_modulus_bits": [40, 40, 30],
            },
        }
    )
    bfv = BfvContext(params.seal_params)
    rng = np.random.default_rng(1)
    sk = bfv.gen_secret_key(rng)
    msg = rng.integers(0, bfv.t, size=(3, 64)).astype(np.uint32)
    seed = bytes(rng.bytes(32))
    ct = bfv.encrypt_symmetric(bfv.encode(msg), sk, rng, a_seed=seed)

    import jax

    c0 = np.asarray(jax.device_get(ct.data))[..., 0, :, :]
    rebuilt = bfv.ct_from_seed(c0, seed)
    assert np.array_equal(
        np.asarray(jax.device_get(rebuilt.data)), np.asarray(jax.device_get(ct.data))
    )
    out = np.asarray(jax.device_get(bfv.decode(bfv.decrypt_device(rebuilt, sk))))
    assert np.array_equal(out, msg)


def test_seed_compressed_relin_key_roundtrip():
    from apsu_tpu.core.bfv import BfvContext
    from apsu_tpu.core.params import PSUParams

    params = PSUParams.from_dict(
        {
            "table_params": {
                "hash_func_count": 1,
                "table_size": 16,
                "max_items_per_bin": 4,
            },
            "item_params": {"felts_per_item": 4},
            "query_params": {"ps_low_degree": 0, "query_powers": [1, 2]},
            "seal_params": {
                "plain_modulus": 65537,
                "poly_modulus_degree": 64,
                "coeff_modulus_bits": [40, 40, 30],
            },
        }
    )
    bfv = BfvContext(params.seal_params)
    rng = np.random.default_rng(2)
    sk = bfv.gen_secret_key(rng)
    seed = bytes(rng.bytes(32))
    rk = bfv.gen_relin_key(sk, rng, a_seed=seed)

    import jax

    k0 = np.asarray(jax.device_get(rk.ksk))[:, 0]
    rk2 = bfv.relin_key_from_seed(k0, seed)
    assert np.array_equal(
        np.asarray(jax.device_get(rk2.ksk)), np.asarray(jax.device_get(rk.ksk))
    )


def test_transcript_size_budget():
    """Compressed wire: the query upload must be well under the raw
    2-component size, and results under the raw uint32 size (VERDICT #2)."""
    from apsu_tpu.api.protocol import run_psu_mpc
    from tests.test_psu_e2e import check_oracle, make_sets, small_params

    rng = np.random.default_rng(3)
    params = small_params()
    db, query = make_sets(rng, n_db=250, n_query=35, n_common=12)
    res = run_psu_mpc(params, query, db)
    check_oracle(db, query, res)

    t = res.timings
    P = len(params.query_params.query_powers)
    B, N = params.bundle_idx_count, params.poly_degree
    from apsu_tpu.core.bfv import BfvContext

    bfv = BfvContext(params.seal_params)
    L, Lqp = bfv.q.k, bfv.qp.k if bfv.qp else 0
    raw_ct_bytes = P * B * 2 * L * N * 4
    raw_rk_bytes = L * 2 * Lqp * N * 4
    raw_query = raw_ct_bytes + raw_rk_bytes
    # seed compression halves both payloads (+ framing + seeds)
    assert t["query_upload_bytes"] < 0.6 * raw_query, (
        t["query_upload_bytes"],
        raw_query,
    )
    # results: ≤30-bit residues in uint32 lanes pack below 95% of raw
    assert t["result_bytes"] < 0.95 * t["result_raw_bytes"], (
        t["result_bytes"],
        t["result_raw_bytes"],
    )
