"""Golden tests for uint32 Montgomery arithmetic and the negacyclic NTT."""

import numpy as np
import jax.numpy as jnp

from apsu_tpu.core import nt
from apsu_tpu.core.mod32 import (
    mont_mul,
    mul_wide,
    np_from_mont,
    np_to_mont,
    prime_consts,
)
from apsu_tpu.core.ntt import NttContext

RNG = np.random.default_rng(0)


def test_mul_wide_matches_uint64():
    a = RNG.integers(0, 1 << 32, size=1000, dtype=np.uint64)
    b = RNG.integers(0, 1 << 32, size=1000, dtype=np.uint64)
    hi, lo = mul_wide(jnp.asarray(a.astype(np.uint32)), jnp.asarray(b.astype(np.uint32)))
    full = a * b  # numpy uint64 wraps at 2^64 but a,b < 2^32 so exact
    np.testing.assert_array_equal(np.asarray(hi), (full >> np.uint64(32)).astype(np.uint32))
    np.testing.assert_array_equal(np.asarray(lo), (full & np.uint64(0xFFFFFFFF)).astype(np.uint32))


def test_mont_mul_random_primes():
    primes = nt.gen_ntt_primes([30, 27, 20], 2 * 1024)
    consts = prime_consts(primes)
    for i, p in enumerate(primes):
        a = RNG.integers(0, p, size=512, dtype=np.uint64).astype(np.uint32)
        b = RNG.integers(0, p, size=512, dtype=np.uint64).astype(np.uint32)
        am = np_to_mont(a, p)
        bm = np_to_mont(b, p)
        got = mont_mul(
            jnp.asarray(am),
            jnp.asarray(bm),
            jnp.uint32(consts.p[i]),
            jnp.uint32(consts.p_neg_inv[i]),
        )
        want = (a.astype(np.uint64) * b.astype(np.uint64)) % np.uint64(p)
        np.testing.assert_array_equal(np_from_mont(np.asarray(got), p), want.astype(np.uint32))


def _naive_negacyclic(a, b, p):
    """O(N^2) big-int negacyclic convolution, the ground truth."""
    n = len(a)
    out = [0] * n
    for i in range(n):
        for j in range(n):
            k = i + j
            term = int(a[i]) * int(b[j])
            if k < n:
                out[k] = (out[k] + term) % p
            else:
                out[k - n] = (out[k - n] - term) % p
    return np.array(out, dtype=np.uint64).astype(np.uint32)


def test_ntt_roundtrip_and_convolution():
    n = 64
    primes = nt.gen_ntt_primes([28, 22], 2 * n)
    ctx = NttContext(primes, n)
    a = np.stack([RNG.integers(0, p, size=n, dtype=np.uint64) for p in primes]).astype(np.uint32)
    b = np.stack([RNG.integers(0, p, size=n, dtype=np.uint64) for p in primes]).astype(np.uint32)

    am = np.stack([np_to_mont(a[l], p) for l, p in enumerate(primes)])
    bm = np.stack([np_to_mont(b[l], p) for l, p in enumerate(primes)])

    # round trip
    back = np.asarray(ctx.intt(ctx.ntt(jnp.asarray(am))))
    np.testing.assert_array_equal(back, am)

    # pointwise product in transform domain == negacyclic convolution
    fa = ctx.ntt(jnp.asarray(am))
    fb = ctx.ntt(jnp.asarray(bm))
    p_bc = jnp.asarray(ctx.consts.p).reshape(-1, 1)
    pni_bc = jnp.asarray(ctx.consts.p_neg_inv).reshape(-1, 1)
    prod = ctx.intt(mont_mul(fa, fb, p_bc, pni_bc))
    got = np.stack(
        [np_from_mont(np.asarray(prod)[l], p) for l, p in enumerate(primes)]
    )
    want = np.stack([_naive_negacyclic(a[l], b[l], p) for l, p in enumerate(primes)])
    np.testing.assert_array_equal(got, want)


def test_ntt_batched_leading_dims():
    n = 32
    primes = nt.gen_ntt_primes([25], 2 * n)
    ctx = NttContext(primes, n)
    x = RNG.integers(0, primes[0], size=(3, 2, 1, n), dtype=np.uint64).astype(np.uint32)
    xm = np_to_mont(x, primes[0])
    back = np.asarray(ctx.intt(ctx.ntt(jnp.asarray(xm))))
    np.testing.assert_array_equal(back, xm)


def test_host_mirror_matches_device():
    n = 32
    primes = nt.gen_ntt_primes([26, 21], 2 * n)
    ctx = NttContext(primes, n)
    x = np.stack([RNG.integers(0, p, size=n, dtype=np.uint64) for p in primes]).astype(np.uint32)
    xm = np.stack([np_to_mont(x[l], p) for l, p in enumerate(primes)])
    dev = np.stack(
        [np_from_mont(np.asarray(ctx.ntt(jnp.asarray(xm)))[l], p) for l, p in enumerate(primes)]
    )
    host = ctx.np_ntt(x)
    np.testing.assert_array_equal(dev, host)
