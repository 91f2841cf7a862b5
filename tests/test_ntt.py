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


def test_exact_lift_conv_no_overshoot():
    """ExactLiftConv must lift x as x + u·Q with u ∈ {−1, 0} (SEAL sm_mrq
    bound) — versus FastBConv's 0 ≤ α < k overshoot.  Covers x = 0, x = Q−1,
    near-multiples of Q/k, and randoms."""
    from apsu_tpu.core.rns import BaseConv, ExactLiftConv, RnsBase

    rng = np.random.default_rng(11)
    n = 32
    src = RnsBase(nt.gen_ntt_primes([29, 30, 28, 27], 2 * n), n)
    dst = RnsBase(
        nt.gen_ntt_primes([30, 30, 29, 30, 30], 2 * n, exclude=src.primes), n
    )  # prod(dst) > k·Q so composed values expose the overshoot
    Q, P = src.prod, dst.prod
    xs = [0, 1, Q - 1, Q // 2, Q // 3, 7 * Q // 8]
    xs += [int(v) for v in rng.integers(0, 2**63, size=10)]
    x_int = np.array([x % Q for x in xs] + [0] * (n - len(xs)), dtype=object)
    x_res = src.decompose(x_int[None, :])  # [1, k, n]

    lift = ExactLiftConv(src, dst)
    got = dst.compose(np.asarray(lift(jnp.asarray(x_res))))[0]
    overshoot_exact = 0
    for g, x in zip(got, x_int):
        u = [(int(g) - int(x) - d * Q) % P == 0 for d in (-1, 0)]
        assert any(u), f"lift of {x} returned {g}: not x or x-Q mod P"
        overshoot_exact += u[1]
    assert overshoot_exact > 0  # most lifts are exactly x

    # the uncorrected FastBConv overshoots by alpha*Q (alpha up to k-1)
    plain = dst.compose(np.asarray(BaseConv(src, dst)(jnp.asarray(x_res))))[0]
    alphas = {(int(g) - int(x)) // Q for g, x in zip(plain, x_int)}
    assert max(alphas) >= 1, "FastBConv unexpectedly exact on all inputs"
