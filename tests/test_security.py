"""Secret-material sourcing: the AES-CTR CsRng and its use by the parties.

The reference derives all secrets from SEAL's Blake2XB PRNG / Kunlun's
AES-based PRG (crypto/prg.hpp); numpy's PCG64 is not cryptographic, so every
secret draw in apsu_tpu must route through CsRng (ADVICE round 1, high).
"""

import numpy as np

from apsu_tpu.mpc.prg import CsRng


def test_csrng_deterministic_with_fixed_key():
    a = CsRng(b"k" * 32)
    b = CsRng(b"k" * 32)
    assert a.bytes(64) == b.bytes(64)
    assert np.array_equal(
        a.integers(0, 1 << 30, size=100, dtype=np.uint64),
        b.integers(0, 1 << 30, size=100, dtype=np.uint64),
    )
    assert np.array_equal(a.permutation(1000), b.permutation(1000))


def test_csrng_default_streams_differ():
    assert CsRng().bytes(32) != CsRng().bytes(32)


def test_csrng_spawn_independent():
    a = CsRng(b"k" * 32)
    child = a.spawn()
    assert child.bytes(32) != a.bytes(32)


def test_csrng_integers_semantics():
    r = CsRng(b"x" * 32)
    v = r.integers(0, 3, size=10000)
    assert v.min() >= 0 and v.max() <= 2
    assert set(np.unique(v)) == {0, 1, 2}
    s = r.integers(-1, 2, size=5000)
    assert set(np.unique(s)) == {-1, 0, 1}
    scalar = r.integers(1 << 30)
    assert 0 <= int(scalar) < (1 << 30)
    u = r.integers(0, 65537, size=(3, 4), dtype=np.uint64)
    assert u.shape == (3, 4) and u.dtype == np.uint64


def test_csrng_permutation_and_normal():
    r = CsRng(b"y" * 32)
    p = r.permutation(257)
    assert sorted(p.tolist()) == list(range(257))
    z = r.normal(0.0, 3.2, size=20000)
    assert abs(z.mean()) < 0.15
    assert abs(z.std() - 3.2) < 0.15


def test_csrng_rejects_short_keys():
    import pytest

    with pytest.raises(ValueError):
        CsRng(b"short")


def test_default_party_secrets_are_independent():
    """Two Senders built without an explicit rng must not share secrets."""
    from apsu_tpu.api.parties import Sender
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
                "coeff_modulus_bits": [30, 30],
            },
        }
    )
    s1 = Sender(params, oprf=None)
    s2 = Sender(params, oprf=None)
    assert isinstance(s1.rng, CsRng)
    assert not np.array_equal(s1.sk.coeffs, s2.sk.coeffs)
