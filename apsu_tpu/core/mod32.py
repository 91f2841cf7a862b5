"""Device-side modular arithmetic over <2^31-bit primes in uint32 lanes.

TPU VPU/MXU have no 64-bit integer datapath, so every residue lives in a
uint32 lane and products are formed by 16-bit limb decomposition.  All device
residue tensors in apsu_tpu are kept in **Montgomery form** (R = 2^32):
``mont(x) = x·R mod p``.  ``mont_mul(mont(a), mont(b)) = mont(a·b)`` closes
over the representation, additions are unchanged, and conversion happens only
at host boundaries.

This module replaces the role of SEAL's ``util/uintarithsmallmod``
(reference dependency, /root/reference/CMakeLists.txt:120-128) with a design
chosen for the TPU's 32-bit integer VPU rather than x86-64 128-bit products.

Broadcasting convention: modulus tensors have shape ``[..., L, 1]`` so they
broadcast against residue tensors of shape ``[..., L, N]`` (L = RNS limbs,
N = polynomial degree on the 128-lane axis).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

U32 = jnp.uint32
MASK16 = np.uint32(0xFFFF)


class PrimeConst(NamedTuple):
    """Host-precomputed per-prime constants (numpy, to be lifted to device).

    All arrays have shape [L] (stack of limb primes) unless noted.
    """

    p: np.ndarray          # the primes, uint32
    p_neg_inv: np.ndarray  # -p^{-1} mod 2^32, uint32 (Montgomery factor)
    r2: np.ndarray         # R^2 mod p (to enter Montgomery form), uint32
    r1: np.ndarray         # R mod p == mont(1), uint32


def prime_consts(primes) -> PrimeConst:
    ps = [int(q) for q in primes]
    R = 1 << 32
    p = np.array(ps, dtype=np.uint32)
    p_neg_inv = np.array([(-pow(q, -1, R)) % R for q in ps], dtype=np.uint32)
    r2 = np.array([R * R % q for q in ps], dtype=np.uint32)
    r1 = np.array([R % q for q in ps], dtype=np.uint32)
    return PrimeConst(p=p, p_neg_inv=p_neg_inv, r2=r2, r1=r1)


# ---------------------------------------------------------------------------
# uint32 wide multiply (16-bit limb schoolbook), carry-safe
# ---------------------------------------------------------------------------

def mul_wide(a, b):
    """Full 32x32 -> 64-bit product as (hi, lo) uint32 pair.

    Every intermediate stays below 2^32: a1*b0 + carry16 <= (2^16-1)^2 +
    (2^16-1) < 2^32, likewise a0*b1 + w1 and a1*b1 + w2 + k.
    """
    a = a.astype(U32)
    b = b.astype(U32)
    a0 = a & MASK16
    a1 = a >> 16
    b0 = b & MASK16
    b1 = b >> 16
    t = a0 * b0
    w0 = t & MASK16
    k = t >> 16
    t = a1 * b0 + k
    w1 = t & MASK16
    w2 = t >> 16
    t = a0 * b1 + w1
    k = t >> 16
    hi = a1 * b1 + w2 + k
    lo = (t << 16) | w0
    return hi, lo


def mul_lo(a, b):
    """Low 32 bits of the product (uint32 wraparound multiply)."""
    return a.astype(U32) * b.astype(U32)


def mul_hi(a, b):
    """High 32 bits of the 64-bit product (16-bit limb schoolbook)."""
    a = a.astype(U32)
    b = b.astype(U32)
    a0 = a & MASK16
    a1 = a >> 16
    b0 = b & MASK16
    b1 = b >> 16
    t = a0 * b0
    w1 = a1 * b0 + (t >> 16)          # ≤ (2^16-1)² + 2^16-1: no overflow
    w2 = a0 * b1 + (w1 & MASK16)
    return a1 * b1 + (w1 >> 16) + (w2 >> 16)


# ---------------------------------------------------------------------------
# Montgomery arithmetic
# ---------------------------------------------------------------------------

def mont_mul(a, b, p, p_neg_inv):
    """Montgomery product a·b·R^{-1} mod p for p < 2^31.

    REDC: t = (hi(ab) + hi(m·p) + carry) with m = lo(ab)·(-p^{-1}) mod 2^32.
    Since lo(ab) + lo(m·p) ≡ 0 (mod 2^32), the carry out of the low word is
    exactly ``lo != 0``.  Result < 2p < 2^32, one conditional subtraction.
    """
    hi, lo = mul_wide(a, b)
    m = mul_lo(lo, p_neg_inv)
    mhi, _ = mul_wide(m, p)
    t = hi + mhi + (lo != 0).astype(U32)
    return jnp.where(t >= p, t - p, t)


def mont_sqr(a, p, p_neg_inv):
    return mont_mul(a, a, p, p_neg_inv)


def add_mod(a, b, p):
    s = a + b  # a,b < p < 2^31 so no uint32 overflow
    return jnp.where(s >= p, s - p, s)


def sub_mod(a, b, p):
    return jnp.where(a >= b, a - b, a + p - b)


def neg_mod(a, p):
    return jnp.where(a == 0, a, p - a)


# ---------------------------------------------------------------------------
# Shoup multiplication by a precomputed constant (Harvey, "Faster arithmetic
# for number-theoretic transforms", J. Symb. Comput. 2014)
#
# For a FIXED multiplier c < p with precomputed c' = floor(c·2^32/p), any
# uint32 x (no bound below 2^32) satisfies
#
#     q = hi(x·c');   t = (x·c − q·p) mod 2^32  ∈ [0, 2p)
#
# i.e. one mul_hi + two wraparound multiplies + one subtraction, versus
# mont_mul's two full wide multiplies + REDC — ~2× fewer VPU ops.  The
# result is x·c mod p up to one conditional subtraction.  Requires p < 2^31
# (all bases here use p < 2^30).  Unlike mont_mul there is NO Montgomery
# R-factor: shoup_mul(x, c) literally computes x·c mod p, so a Montgomery-
# form x stays in Montgomery form when multiplied by a plain constant c.
# ---------------------------------------------------------------------------

def shoup_pair(c: np.ndarray, p: np.ndarray):
    """Host precompute: c' = floor(c·2^32 / p) for constant(s) c < p."""
    c64 = np.asarray(c, np.uint64)
    p64 = np.asarray(p, np.uint64)
    return ((c64 << np.uint64(32)) // p64).astype(np.uint32)


def shoup_mul_lazy(x, c, c_sh, p):
    """x·c mod p in [0, 2p): Harvey's lazy product (x any uint32, c < p)."""
    q = mul_hi(x, c_sh)
    return mul_lo(x, c) - mul_lo(q, p)  # exact value in [0, 2p), no wrap


def shoup_mul(x, c, c_sh, p):
    """Canonical x·c mod p (one conditional subtraction after the lazy mul)."""
    t = shoup_mul_lazy(x, c, c_sh, p)
    return jnp.where(t >= p, t - p, t)


def to_mont(x, p, p_neg_inv, r2):
    """Enter Montgomery form: x·R mod p (device-side, via mont_mul with R²)."""
    return mont_mul(x, r2, p, p_neg_inv)


def from_mont(x, p, p_neg_inv):
    """Leave Montgomery form: x·R^{-1} mod p == mont_mul(x, 1)."""
    one = jnp.ones((), dtype=U32)
    return mont_mul(x, one, p, p_neg_inv)


# ---------------------------------------------------------------------------
# Host-side (numpy uint64) mirrors for table building and golden tests
# ---------------------------------------------------------------------------

def np_to_mont(x: np.ndarray, p: int) -> np.ndarray:
    return ((x.astype(np.uint64) << np.uint64(32)) % np.uint64(p)).astype(np.uint32)


def np_from_mont(x: np.ndarray, p: int) -> np.ndarray:
    rinv = pow(1 << 32, -1, int(p))
    return (
        (x.astype(np.uint64) * np.uint64(rinv)) % np.uint64(p)
    ).astype(np.uint32)


def np_mulmod(a: np.ndarray, b: np.ndarray, p: int) -> np.ndarray:
    return (
        (a.astype(np.uint64) * b.astype(np.uint64)) % np.uint64(p)
    ).astype(np.uint32)
