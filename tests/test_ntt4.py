"""Bit-identity of the four-step MXU NTT against the staged transform."""

import jax.numpy as jnp
import numpy as np
import pytest

from apsu_tpu.core.nt import gen_ntt_primes
from apsu_tpu.core.ntt import NttContext
from apsu_tpu.ops.ntt4 import Ntt4Tables, intt4, ntt4


def _rand_residues(rng, primes, shape_lead, n):
    L = len(primes)
    x = np.empty(shape_lead + (L, n), np.uint32)
    for i, p in enumerate(primes):
        x[..., i, :] = rng.integers(0, p, size=shape_lead + (n,), dtype=np.uint64)
    return x


@pytest.mark.slow
@pytest.mark.parametrize(
    "bits,n",
    [
        ([27, 26], 256),
        ([30, 29, 28], 256),
        ([27], 1024),
        ([28, 28], 512),  # odd log2: n1 != n2
    ],
)
def test_ntt4_bit_identical_to_staged(bits, n):
    primes = gen_ntt_primes(bits, 2 * n)
    ctx = NttContext(primes, n)
    tb = Ntt4Tables(primes, n)
    rng = np.random.default_rng(sum(bits) + n)
    x = jnp.asarray(_rand_residues(rng, primes, (3, 2), n))

    f4 = np.asarray(ntt4(x, tb))
    fs = np.asarray(ctx.ntt(x))
    np.testing.assert_array_equal(f4, fs)

    i4 = np.asarray(intt4(jnp.asarray(fs), tb))
    istaged = np.asarray(ctx.intt(jnp.asarray(fs)))
    np.testing.assert_array_equal(i4, istaged)

    # mix-and-match roundtrip closes exactly
    np.testing.assert_array_equal(np.asarray(intt4(jnp.asarray(f4), tb)), np.asarray(x))


@pytest.mark.slow
def test_ntt4_plain_modulus_base():
    """The 17-bit plain-modulus base (encode/decode NTT) also matches."""
    t, n = 65537, 256
    ctx = NttContext([t], n)
    tb = Ntt4Tables([t], n)
    rng = np.random.default_rng(7)
    x = jnp.asarray(_rand_residues(rng, [t], (4,), n))
    np.testing.assert_array_equal(np.asarray(ntt4(x, tb)), np.asarray(ctx.ntt(x)))
    np.testing.assert_array_equal(np.asarray(intt4(x, tb)), np.asarray(ctx.intt(x)))


def test_ntt4_pointwise_product_is_negacyclic_convolution():
    primes = gen_ntt_primes([27], 128)
    p = primes[0]
    n = 64
    ctx = NttContext(primes, n)
    tb = Ntt4Tables(primes, n)
    rng = np.random.default_rng(3)
    a = rng.integers(0, p, size=n, dtype=np.uint64)
    b = rng.integers(0, p, size=n, dtype=np.uint64)
    # negacyclic ground truth
    want = np.zeros(n, dtype=object)
    for i in range(n):
        for j in range(n):
            k = (i + j) % n
            s = -1 if i + j >= n else 1
            want[k] = (want[k] + s * int(a[i]) * int(b[j])) % p
    from apsu_tpu.core.mod32 import np_from_mont, np_to_mont

    am = jnp.asarray(np_to_mont(a.astype(np.uint32), p)[None, :][None])
    bm = jnp.asarray(np_to_mont(b.astype(np.uint32), p)[None, :][None])
    fa, fb = ntt4(am, tb), ntt4(bm, tb)
    from apsu_tpu.core.mod32 import mont_mul

    pd = np.array([p], np.uint32).reshape(1, 1)
    pni = tb.pni.reshape(1, 1)
    prod = mont_mul(fa, fb, pd, pni)
    got = np_from_mont(np.asarray(intt4(prod, tb))[0, 0], p)
    np.testing.assert_array_equal(got, want.astype(np.uint64).astype(np.uint32))
