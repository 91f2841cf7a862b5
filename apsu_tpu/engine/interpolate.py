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

from apsu_tpu.core.mod32 import mont_mul, prime_consts, sub_mod


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
