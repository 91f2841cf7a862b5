"""Batched monic-polynomial-from-roots over Z_t — device kernel.

The reference computes one polynomial per bin on the host thread pool
(``polyn_with_roots``, /root/reference/common/apsu/util/interpolate.cpp:63-80,
driven from bin_bundle.cpp:975-1026).  Here the whole DB partition is one
tensor: roots ``[..., K, N]`` (K = max bin load, N = lanes/slots) with a
per-lane valid count, and the product ∏(x − r_k) is built by a fori_loop of
masked monomial-multiply steps, each an elementwise Montgomery op over the
full lane axis — bins become lanes, bundles become batch dims.

Padding semantics: lanes with fewer than K roots keep their polynomial
unchanged for the padded steps, so an empty bin yields M(x) = 1 (never zero —
no false matches), matching the reference's empty-bin behavior.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from apsu_tpu.core.mod32 import add_mod, mont_mul, prime_consts, sub_mod


def polyn_with_roots(roots, counts, t: int):
    """roots: [..., K, N] uint32 felts mod t; counts: [..., N] int32 valid
    roots per lane.  Returns coefficients [..., K+1, N] mod t (plain form),
    little-endian degree order (coeffs[..., j, :] is the x^j coefficient).
    """
    c = prime_consts([t])
    p = np.uint32(c.p[0])
    pni = np.uint32(c.p_neg_inv[0])
    r2 = np.uint32(c.r2[0])
    K = roots.shape[-2]
    lead = roots.shape[:-2]
    n = roots.shape[-1]

    roots = jnp.asarray(roots, jnp.uint32)
    counts = jnp.asarray(counts, jnp.int32)

    # coeffs in plain form; roots converted to Montgomery once so the
    # per-step multiply is a single mont_mul (plain × mont = plain)
    roots_m = mont_mul(roots, r2, p, pni)

    init = jnp.zeros(lead + (K + 1, n), dtype=jnp.uint32)
    init = init.at[..., 0, :].set(1)

    def body(k, coeffs):
        r = jax.lax.dynamic_index_in_dim(roots_m, k, axis=-2, keepdims=False)
        # (x - r)·C(x): shift C up one degree, subtract r·C
        shifted = jnp.roll(coeffs, 1, axis=-2).at[..., 0, :].set(0)
        rc = mont_mul(coeffs, r[..., None, :], p, pni)
        new = sub_mod(shifted, rc, p)
        valid = (k < counts)[..., None, :]
        return jnp.where(valid, new, coeffs)

    return jax.lax.fori_loop(0, K, body, init)


def newton_interpolate(roots, values, counts, t: int):
    """Batched Newton interpolation over Z_t — the label polynomials.

    roots: [..., K, N] uint32 distinct x-values per lane (DISTINCT within a
    lane's valid prefix — the DB build rejects per-lane felt collisions);
    values: [..., K, N] uint32 y-values mod t; counts: [..., N] valid points
    per lane.  Returns coefficients [..., K, N] mod t, little-endian degree
    order, of the unique degree<count polynomial L with L(roots_i) = values_i
    (empty lanes give L = 0).

    Replaces the reference's per-bin host ``newton_interpolate_polyn``
    (/root/reference/common/apsu/util/interpolate.cpp:87, driven from
    bin_bundle.cpp:975-1026) with one device pass: divided differences via
    K-1 full-lane steps (each with one Fermat inverse x^{t-2}), then the
    Newton-to-monomial expansion as masked monomial multiplies.
    """
    c = prime_consts([t])
    p = np.uint32(c.p[0])
    pni = np.uint32(c.p_neg_inv[0])
    r2 = np.uint32(c.r2[0])
    K = roots.shape[-2]
    lead = roots.shape[:-2]
    n = roots.shape[-1]

    roots = jnp.asarray(roots, jnp.uint32)
    values = jnp.asarray(values, jnp.uint32)
    counts = jnp.asarray(counts, jnp.int32)
    roots_m = mont_mul(roots, r2, p, pni)  # Montgomery form

    def inv_mont(x_m):
        """x^{t-2} in Montgomery form (Fermat inverse; inv(0) = 0)."""
        e = t - 2
        one_m = jnp.full_like(x_m, np.uint32((1 << 32) % t))
        acc = one_m
        base = x_m
        while e:
            if e & 1:
                acc = mont_mul(acc, base, p, pni)
            e >>= 1
            if e:
                base = mont_mul(base, base, p, pni)
        return acc

    # 1. divided differences (plain-form coefficients c_i)
    idx = jnp.arange(K, dtype=jnp.int32)[..., :, None]  # [K, 1]

    def dd_body(j, cfs):
        diff = sub_mod(cfs, jnp.roll(cfs, 1, axis=-2), p)         # c_i - c_{i-1}
        denom_m = sub_mod(roots_m, jnp.roll(roots_m, j, axis=-2), p)  # x_i - x_{i-j}
        new = mont_mul(diff, inv_mont(denom_m), p, pni)            # plain × mont
        upd = (idx >= j) & (idx < counts[..., None, :])
        return jnp.where(upd, new, cfs)

    cfs = jax.lax.fori_loop(1, K, dd_body, values)

    # 2. Newton -> monomial: poly = poly·(x − x_i) + c_i, i = count−1 .. 0
    init = jnp.zeros(lead + (K, n), dtype=jnp.uint32)

    def nm_body(step, poly):
        i = K - 1 - step
        r = jax.lax.dynamic_index_in_dim(roots_m, i, axis=-2, keepdims=False)
        ci = jax.lax.dynamic_index_in_dim(cfs, i, axis=-2, keepdims=False)
        shifted = jnp.roll(poly, 1, axis=-2).at[..., 0, :].set(0)
        new = sub_mod(shifted, mont_mul(poly, r[..., None, :], p, pni), p)
        new = new.at[..., 0, :].set(add_mod(new[..., 0, :], ci, p))
        valid = (i < counts)[..., None, :]
        return jnp.where(valid, new, poly)

    return jax.lax.fori_loop(0, K, nm_body, init)
