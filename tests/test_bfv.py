"""BFV correctness: encode/encrypt round trips, homomorphic ops, noise.

Uses a small custom parameter set (N=256) so CPU runs stay fast; the op mix
mirrors what the PSU protocol needs (reference surface:
/root/reference/common/apsu/crypto_context.h:28 — BatchEncoder, symmetric
Encryptor/Decryptor, Evaluator multiply/relinearize/multiply_plain/add/
mod-switch).
"""

import numpy as np
import pytest

from apsu_tpu.core import nt
from apsu_tpu.core.bfv import BfvContext
from apsu_tpu.core.params import SealParams, rebase_coeff_modulus


def make_ctx(n=256, t_bits=17, ref_bits=(40, 40, 30)):
    t = nt.gen_batching_prime(t_bits, 2 * n)
    coeff = rebase_coeff_modulus(ref_bits, n, exclude=[t])
    sp = SealParams(
        poly_modulus_degree=n,
        plain_modulus=t,
        coeff_modulus=tuple(coeff),
        ref_coeff_modulus_bits=tuple(ref_bits),
    )
    return BfvContext(sp)


@pytest.fixture(scope="module")
def ctx():
    return make_ctx()


@pytest.fixture(scope="module")
def keys(ctx):
    rng = np.random.default_rng(7)
    sk = ctx.gen_secret_key(rng)
    rk = ctx.gen_relin_key(sk, rng)
    return sk, rk, rng


def rand_slots(ctx, rng, lo=0):
    return rng.integers(lo, ctx.t, size=ctx.n, dtype=np.uint64).astype(np.uint32)


def test_encode_decode_roundtrip(ctx):
    rng = np.random.default_rng(1)
    v = rand_slots(ctx, rng)
    poly = np.asarray(ctx.encode(v))
    back = np.asarray(ctx.decode(poly))
    np.testing.assert_array_equal(back, v)


def test_encrypt_decrypt_roundtrip(ctx, keys):
    sk, _, _ = keys
    rng = np.random.default_rng(2)
    v = rand_slots(ctx, rng)
    ct = ctx.encrypt_symmetric(np.asarray(ctx.encode(v)), sk, rng)
    assert ctx.noise_budget(ct, sk) > 40
    got = np.asarray(ctx.decode(ctx.decrypt(ct, sk)))
    np.testing.assert_array_equal(got, v)


def test_add_and_add_plain(ctx, keys):
    sk, _, _ = keys
    rng = np.random.default_rng(3)
    v1, v2, v3 = (rand_slots(ctx, rng) for _ in range(3))
    ct1 = ctx.encrypt_symmetric(np.asarray(ctx.encode(v1)), sk, rng)
    ct2 = ctx.encrypt_symmetric(np.asarray(ctx.encode(v2)), sk, rng)
    s = ctx.add(ct1, ct2)
    s = ctx.add_plain(s, np.asarray(ctx.encode(v3)))
    got = np.asarray(ctx.decode(ctx.decrypt(s, sk)))
    want = (v1.astype(np.uint64) + v2 + v3) % ctx.t
    np.testing.assert_array_equal(got, want.astype(np.uint32))


def test_mul_plain_slotwise(ctx, keys):
    sk, _, _ = keys
    rng = np.random.default_rng(4)
    v1, v2 = rand_slots(ctx, rng), rand_slots(ctx, rng)
    ct = ctx.encrypt_symmetric(np.asarray(ctx.encode(v1)), sk, rng)
    ct = ctx.to_ntt(ct)
    pt_ntt = ctx.lift_plaintext_ntt(np.asarray(ctx.encode(v2)))
    prod = ctx.mul_plain_ntt(ct, pt_ntt)
    got = np.asarray(ctx.decode(ctx.decrypt(ctx.from_ntt(prod), sk)))
    want = v1.astype(np.uint64) * v2 % ctx.t
    np.testing.assert_array_equal(got, want.astype(np.uint32))


def test_ct_ct_multiply_and_relin(ctx, keys):
    sk, rk, _ = keys
    rng = np.random.default_rng(5)
    v1, v2 = rand_slots(ctx, rng), rand_slots(ctx, rng)
    ct1 = ctx.encrypt_symmetric(np.asarray(ctx.encode(v1)), sk, rng)
    ct2 = ctx.encrypt_symmetric(np.asarray(ctx.encode(v2)), sk, rng)
    prod3 = ctx.multiply(ct1, ct2)
    want = (v1.astype(np.uint64) * v2 % ctx.t).astype(np.uint32)
    # 3-component decrypt
    got3 = np.asarray(ctx.decode(ctx.decrypt(prod3, sk)))
    np.testing.assert_array_equal(got3, want)
    # relinearized decrypt
    prod2 = ctx.relinearize(prod3, rk)
    assert prod2.size == 2
    budget = ctx.noise_budget(prod2, sk)
    assert budget > 10, f"noise budget exhausted after relin: {budget}"
    got2 = np.asarray(ctx.decode(ctx.decrypt(prod2, sk)))
    np.testing.assert_array_equal(got2, want)


def test_power_chain_square_mul_relin():
    """x, x², x³ — the PowersDag op mix (square + multiply + relinearize).

    Needs a depth-2 modulus chain (each BFV multiply costs ~log2(N·t) ≈ 27
    bits of budget), hence a deeper chain than the shared fixture.
    """
    ctx = make_ctx(n=256, ref_bits=(48, 48, 48, 28))
    rng = np.random.default_rng(6)
    sk = ctx.gen_secret_key(rng)
    rk = ctx.gen_relin_key(sk, rng)
    v = rand_slots(ctx, rng, lo=1)
    ct1 = ctx.encrypt_symmetric(np.asarray(ctx.encode(v)), sk, rng)
    ct2 = ctx.relinearize(ctx.square(ct1), rk)
    ct3 = ctx.relinearize(ctx.multiply(ct2, ct1), rk)
    got2 = np.asarray(ctx.decode(ctx.decrypt(ct2, sk)))
    got3 = np.asarray(ctx.decode(ctx.decrypt(ct3, sk)))
    v64 = v.astype(np.uint64)
    np.testing.assert_array_equal(got2, (v64 * v64 % ctx.t).astype(np.uint32))
    np.testing.assert_array_equal(got3, (v64 * v64 % ctx.t * v64 % ctx.t).astype(np.uint32))


@pytest.mark.slow
def test_multiply_sum_matches_multiply_then_add(ctx, keys):
    """Lazy BEHZ batch accumulation: Σ_m a[m]·b[m] decrypts to the slotwise
    Σ v1[m]·v2[m], and its noise is no worse than the multiply-then-add
    path (one rounding error total instead of M)."""
    import jax.numpy as jnp

    from apsu_tpu.core.bfv import Ciphertext
    from apsu_tpu.core.mod32 import add_mod

    sk, rk, _ = keys
    rng = np.random.default_rng(31)
    M = 5
    v1 = [rand_slots(ctx, rng) for _ in range(M)]
    v2 = [rand_slots(ctx, rng) for _ in range(M)]
    cts1 = [ctx.encrypt_symmetric(np.asarray(ctx.encode(v)), sk, rng) for v in v1]
    cts2 = [ctx.encrypt_symmetric(np.asarray(ctx.encode(v)), sk, rng) for v in v2]
    a = Ciphertext(jnp.stack([c.data for c in cts1]), is_ntt=False, level=cts1[0].level)
    b = Ciphertext(jnp.stack([c.data for c in cts2]), is_ntt=False, level=cts2[0].level)

    s3 = ctx.multiply_sum(a, b)
    assert s3.size == 3 and not s3.is_ntt and s3.level == a.level
    want = np.zeros(ctx.n, dtype=np.uint64)
    for x, y in zip(v1, v2):
        want = (want + x.astype(np.uint64) * y) % ctx.t
    got = np.asarray(ctx.decode(ctx.decrypt(s3, sk)))
    np.testing.assert_array_equal(got, want.astype(np.uint32))

    # eager path for comparison: M separate multiplies, component-wise sum
    q = ctx.levels[a.level]
    acc = ctx.multiply(cts1[0], cts2[0]).data
    for m in range(1, M):
        acc = add_mod(acc, ctx.multiply(cts1[m], cts2[m]).data, q.p_d)
    eager = Ciphertext(acc, is_ntt=False, level=a.level)
    np.testing.assert_array_equal(
        np.asarray(ctx.decode(ctx.decrypt(eager, sk))), want.astype(np.uint32)
    )
    # rounding error enters once instead of M times, but both are tiny
    # against the multiplicative noise growth — assert "no worse", loosely
    assert ctx.noise_budget(s3, sk) >= ctx.noise_budget(eager, sk) - 0.5

    # relinearizes like any 3-component ct (the PS pipeline's next step)
    rel = ctx.relinearize(s3, rk)
    np.testing.assert_array_equal(
        np.asarray(ctx.decode(ctx.decrypt(rel, sk))), want.astype(np.uint32)
    )

    # the fused variant (pre-transformed halves) is bit-identical
    import jax

    q = ctx.levels[a.level]
    fbq, fbb = ctx.premul_sum_rhs(b, M)
    fused = jax.jit(
        lambda faq, xa, fq, fb: ctx.multiply_sum_fused(
            faq, xa, fq, fb, a.level, M
        )
    )(q.ntt.ntt(q.to_mont(a.data)), a.data, fbq, fbb)
    np.testing.assert_array_equal(np.asarray(fused), np.asarray(s3.data))


def test_mod_switch(ctx, keys):
    sk, _, _ = keys
    rng = np.random.default_rng(8)
    v = rand_slots(ctx, rng)
    ct = ctx.encrypt_symmetric(np.asarray(ctx.encode(v)), sk, rng)
    low = ctx.mod_switch_to(ct, 1)
    assert low.level == 1 and low.data.shape[1] == 1
    got = np.asarray(ctx.decode(ctx.decrypt(low, sk)))
    np.testing.assert_array_equal(got, v)


def test_device_decrypt_matches_host(ctx, keys):
    """BEHZ {t,γ} device decryption == host big-int CRT decryption."""
    import jax

    sk, rk, _ = keys
    rng = np.random.default_rng(21)
    v = rand_slots(ctx, rng)
    ct = ctx.encrypt_symmetric(np.asarray(ctx.encode(v)), sk, rng)
    host = ctx.decrypt(ct, sk)
    dev = jax.device_get(ctx.decrypt_device(ct, sk))
    np.testing.assert_array_equal(dev, host)
    # after homomorphic ops and at a reduced level
    prod = ctx.relinearize(ctx.multiply(ct, ct), rk)
    low = ctx.mod_switch_to(prod, 2)
    np.testing.assert_array_equal(
        jax.device_get(ctx.decrypt_device(low, sk)), ctx.decrypt(low, sk)
    )


@pytest.mark.slow
def test_leveled_encrypt_and_level_restricted_relin_key():
    """Fresh-query level machinery (measured_levels "query" knob): encrypt
    directly at a reduced level L < k, generate the relin key over Q_L·P,
    and run the square→multiply→relinearize op mix entirely at/below L.
    The restricted key must serve any ct level ≤ L exactly (the CRT basis
    restricts digit-for-digit — bfv.relinearize docstring)."""
    ctx = make_ctx(n=256, ref_bits=(48, 48, 48, 48, 28))
    k = len(ctx.q_primes)
    L = k - 2
    rng = np.random.default_rng(61)
    sk = ctx.gen_secret_key(rng)
    rk = ctx.gen_relin_key(sk, rng, level=L)
    assert rk.level == L and rk.ksk.shape[0] == L and rk.ksk.shape[2] == L + 1

    v = rand_slots(ctx, rng, lo=1)
    ct1 = ctx.encrypt_symmetric(np.asarray(ctx.encode(v)), sk, rng, level=L)
    assert ct1.level == L and ct1.data.shape[-2] == L
    # decrypts exactly at the reduced level
    np.testing.assert_array_equal(
        np.asarray(ctx.decode(ctx.decrypt(ct1, sk))), v
    )
    # square + relin AT the key's level, then multiply + relin BELOW it
    ct2 = ctx.relinearize(ctx.square(ct1), rk)
    ct2d = ctx.mod_switch_to(ct2, L - 1)
    ct1d = ctx.mod_switch_to(ct1, L - 1)
    ct3 = ctx.relinearize(ctx.multiply(ct2d, ct1d), rk)
    got2 = np.asarray(ctx.decode(ctx.decrypt(ct2, sk)))
    got3 = np.asarray(ctx.decode(ctx.decrypt(ct3, sk)))
    v64 = v.astype(np.uint64)
    np.testing.assert_array_equal(got2, (v64 * v64 % ctx.t).astype(np.uint32))
    np.testing.assert_array_equal(
        got3, (v64 * v64 % ctx.t * v64 % ctx.t).astype(np.uint32)
    )


def test_leveled_seed_compression_roundtrip():
    """Seed-compressed fresh cts and relin keys reconstruct bit-identically
    at a reduced level (the wire path of a "query"-overridden config)."""
    ctx = make_ctx(n=256, ref_bits=(48, 48, 48, 28))
    L = len(ctx.q_primes) - 1
    rng = np.random.default_rng(62)
    sk = ctx.gen_secret_key(rng)
    v = rand_slots(ctx, rng)
    a_seed, rk_seed = bytes(range(32)), bytes(range(32, 64))
    ct = ctx.encrypt_symmetric(
        np.asarray(ctx.encode(v)), sk, rng, a_seed=a_seed, level=L
    )
    c0 = np.asarray(ct.data[..., 0, :, :])
    ct2 = ctx.ct_from_seed(c0, a_seed, level=L)
    np.testing.assert_array_equal(np.asarray(ct.data), np.asarray(ct2.data))

    rk = ctx.gen_relin_key(sk, rng, a_seed=rk_seed, level=L)
    rk2 = ctx.relin_key_from_seed(np.asarray(rk.ksk[:, 0]), rk_seed, level=L)
    assert rk2.level == L
    np.testing.assert_array_equal(np.asarray(rk.ksk), np.asarray(rk2.ksk))
