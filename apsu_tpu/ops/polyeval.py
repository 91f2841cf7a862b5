"""Pallas TPU kernel for the batched matching-polynomial dot product.

The hot op of the PSU online phase: out[b,c] = Σ_j powers[b,j] ⊙ cache[b,c,j]
(Montgomery multiply-accumulate per limb/lane).  The XLA fori_loop version
re-materializes every degree slice through HBM; this kernel streams each
cache element through VMEM exactly once with the standard reduction-grid
pattern (out block constant along the innermost grid axis, initialized at
j==0), double-buffered by the Pallas pipeline.

Layout: powers [B, Dp, 2, L, N], cache [B, C, Dp, L, N], Dp a multiple of
the degree chunk; out [B, C, 2, L, N].  Plane 0 of both is the zero-padding
convention for the constant coefficient (contributes nothing).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from apsu_tpu.core.mod32 import add_mod, mont_mul

DEG_CHUNK = 8


def _mul_wide_narrow(a, b):
    """(hi, lo) of a·b for a, b < 2^28: high halves are < 2^12 so the two
    cross terms sum without overflow — 4 multiplies, ~6 cheap ops."""
    m16 = jnp.uint32(0xFFFF)
    a0 = a & m16
    a1 = a >> 16
    b0 = b & m16
    b1 = b >> 16
    t = a0 * b0
    mid = a1 * b0 + a0 * b1          # < 2^29: no overflow
    lo = t + (mid << 16)
    carry = (lo < t).astype(jnp.uint32)
    hi = a1 * b1 + (mid >> 16) + carry
    return hi, lo


def _kernel(p_ref, pni_ref, pw_ref, pt_ref, out_ref, *, chunk):
    """Lazy-reduction dot product: the chunk's products accumulate as raw
    64-bit (hi, lo) pairs — Σ_{u<8} p² < 2^59 fits — and a single Montgomery
    REDC folds the chunk into the running mod-p accumulator.  ~4.6 int32
    multiplies per term instead of 9.

    The cache axis is BLOCKED into the grid step (out/pt blocks carry a
    cb-wide cache slice): one power chunk fetched from HBM serves every
    cache row of the block instead of being re-read per row — at C=6 that
    removes ~6/7 of the kernel's dominant HBM stream (the power tensor is
    C× re-read; the cache streams once either way).  Per-element op order
    is unchanged, so outputs stay bit-identical to the cb=1 kernel."""
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    p = p_ref[...]      # [L, 1]
    pni = pni_ref[...]  # [L, 1]
    acc = out_ref[...]  # [1, cb, 2, L, N]
    pw = pw_ref[...]    # [1, chunk, 2, L, N]
    pt = pt_ref[...]    # [1, cb, chunk, L, N]

    # carry-free 14-bit-split accumulation (r5, same trick as the PS v3
    # kernel): operands < 2^28, so the three partial products are < 2^29
    # each and chunk=8 of them sum in plain u32 with no carry tracking
    # (8·2·16383² < 2^32) — ~10 VPU ops/term vs ~18 for the former
    # 16-bit schoolbook + carry-chained 64-bit pair.  The fold
    # reconstructs the exact chunk sum V = s00 + s01·2^14 + s11·2^28 and
    # REDCs it at the same chunk boundary — bit-identical outputs.
    m14 = jnp.uint32(0x3FFF)
    s00 = jnp.zeros(acc.shape[1:], jnp.uint32)  # [cb, 2, L, N]
    s01 = jnp.zeros(acc.shape[1:], jnp.uint32)
    s11 = jnp.zeros(acc.shape[1:], jnp.uint32)
    for u in range(chunk):
        a = pw[0, u][None]                    # [1, 2, L, N]
        b = pt[0, :, u][:, None, :, :]        # [cb, 1, L, N]
        a0, a1 = a & m14, a >> 14
        b0, b1 = b & m14, b >> 14
        s00 = s00 + a0 * b0
        s01 = s01 + (a0 * b1 + a1 * b0)
        s11 = s11 + a1 * b1
    lo14 = s01 << 14
    lo1 = s00 + lo14
    c1 = (lo1 < lo14).astype(jnp.uint32)
    lo28 = s11 << 28
    s_lo = lo1 + lo28
    c2 = (s_lo < lo28).astype(jnp.uint32)
    s_hi = (s01 >> 18) + (s11 >> 4) + c1 + c2
    # REDC of the 64-bit chunk sum: t = (S + m·p)/2^32, m = S_lo·(-p^-1)
    m = s_lo * pni
    mhi, _ = _mul_wide_hi_generic(m, p)
    t = s_hi + mhi + (s_lo != 0).astype(jnp.uint32)
    t = _sub_if_ge(t, p)
    t = _sub_if_ge(t, p)  # s_hi < 2^27 + mhi < p: t < p + 2^27 + p ⇒ ≤ 2 subs
    out_ref[...] = add_mod(acc, t[None], p)


def _mul_wide_hi_generic(a, b):
    """hi 32 bits of a·b for arbitrary uint32 a and b < 2^31."""
    m16 = jnp.uint32(0xFFFF)
    a0 = a & m16
    a1 = a >> 16
    b0 = b & m16
    b1 = b >> 16
    t = a0 * b0
    w1 = a1 * b0 + (t >> 16)         # ≤ (2^16-1)^2 + 2^16 - 1: no overflow
    w2 = a0 * b1 + (w1 & m16)
    return a1 * b1 + (w1 >> 16) + (w2 >> 16), t  # hi, (unused partial)


def _sub_if_ge(x, p):
    return jnp.where(x >= p, x - p, x)


SEG_CHUNK = 8  # k-segments per grid step (out block SEG_CHUNK·[2,L,N] resident)


def plane_count(K: int, ps_low_degree: int) -> int:
    """Coefficient-plane count for a DB cache at max bin degree K.

    Non-PS: K+1 rounded up to the Pallas degree chunk.  PS: at least
    (nh+1)·ph planes so every gather index nh·ph + i (i ≤ ℓ) lands on a
    real (zero) plane.  Deliberately NOT rounded to SEG_CHUNK segments:
    that costs ~10% extra permanent HBM on the DB cache (0.6 GB at the
    16M shape) to save the opt-in segmented kernel a transient pad —
    the wrong trade on a 16 GB chip (the round-2 OOM was exactly this).
    """
    if ps_low_degree > 0:
        ph = ps_low_degree + 1
        nh = K // ph
        min_planes = max(K + 1, (nh + 1) * ph)
    else:
        min_planes = K + 1
    return -(-min_planes // DEG_CHUNK) * DEG_CHUNK


def _ps_inner_kernel(p_ref, pni_ref, pw_ref, pt_ref, out_ref, hi_ref, lo_ref,
                     *, ph):
    """Segmented dot for the Paterson-Stockmeyer inner sums: each grid step
    handles SEG_CHUNK k-segments of one row at one plane offset i, so the
    power block pw[i] is fetched once per k-chunk rather than once per
    segment, and the step count stays low (a first (r, k, i) single-segment
    grid was measured SLOWER than the XLA loop at the 16M shape — nh+1×
    power re-reads plus ~30k grid-step overheads).

    Accumulation is LAZY: per plane each segment's product joins a raw
    64-bit (hi, lo) scratch pair, and a single Montgomery REDC folds the
    pair into the canonical out block every DEG_CHUNK planes (Σ_{u<8} p²
    < 2^59 for eval primes < 2^28, same bound as the non-PS kernel) —
    ~11 cheap int32 ops per term instead of a ~45-op mont_mul.  The value
    mod p equals the sequential Montgomery multiply-add of the XLA
    fori_loop fallback (modular reduction commutes with exact sums), and
    the fold yields canonical residues, so outputs stay bit-identical.

    Plane i of segment k multiplies x^i (pw plane i-1); the i == 0 step
    only zeroes the accumulators (the constant column is added in the coeff
    domain by the evaluator).
    """
    i = pl.program_id(2)
    p = p_ref[...]      # [L, 1]
    pni = pni_ref[...]  # [L, 1]

    @pl.when(i == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)
        hi_ref[...] = jnp.zeros_like(hi_ref)
        lo_ref[...] = jnp.zeros_like(lo_ref)

    @pl.when(i > 0)
    def _():
        pw = pw_ref[0, 0]                    # [2, L, N]
        for u in range(SEG_CHUNK):
            hi, lo = _mul_wide_narrow(pw, pt_ref[0, u, 0][None, :, :])
            new_lo = lo_ref[u] + lo
            hi_ref[u] = hi_ref[u] + hi + (new_lo < lo).astype(jnp.uint32)
            lo_ref[u] = new_lo

    # fold the lazy pair into the canonical accumulator every DEG_CHUNK
    # planes (≤ 8 products per fold keeps s_hi < 2^27) and at the last plane
    @pl.when((i % DEG_CHUNK == 0) & (i > 0) | (i == ph - 1))
    def _():
        s_hi = hi_ref[...]
        s_lo = lo_ref[...]
        m = s_lo * pni[None, None]
        mhi, _ = _mul_wide_hi_generic(m, p[None, None])
        t = s_hi + mhi + (s_lo != 0).astype(jnp.uint32)
        t = _sub_if_ge(t, p)
        t = _sub_if_ge(t, p)
        out_ref[0] = add_mod(out_ref[0], t, p)
        hi_ref[...] = jnp.zeros_like(hi_ref)
        lo_ref[...] = jnp.zeros_like(lo_ref)


def eval_ps_inner_pallas(
    low_powers, cache5, p_np: np.ndarray, pni_np: np.ndarray,
    caches_per_bundle: int, interpret: bool = False,
):
    """PS inner sums: out[r, k] = Σ_{i=1..ph-1} low_powers[r//C, i-1] ⊙
    cache5[r, k, i]  (NTT-domain Montgomery residues, eval primes < 2^28).

    low_powers [B, ph-1, 2, L, N]; cache5 [R, nh1, ph, L, N] with
    R = B·caches_per_bundle; returns [R, nh1, 2, L, N].  The segment axis
    is padded to a SEG_CHUNK multiple internally (zero segments).
    """
    B, ell, _, L, N = low_powers.shape
    R, nh1, ph = cache5.shape[:3]
    assert ell == ph - 1 and R == B * caches_per_bundle
    C = caches_per_bundle
    p = jnp.asarray(p_np.reshape(L, 1))
    pni = jnp.asarray(pni_np.reshape(L, 1))

    nh_pad = -(-nh1 // SEG_CHUNK) * SEG_CHUNK
    if nh_pad != nh1:
        cache5 = jnp.pad(
            cache5, ((0, 0), (0, nh_pad - nh1), (0, 0), (0, 0), (0, 0))
        )
    nk = nh_pad // SEG_CHUNK

    kernel = functools.partial(_ps_inner_kernel, ph=ph)
    grid = (R, nk, ph)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((L, 1), lambda r, k, i: (0, 0)),
            pl.BlockSpec((L, 1), lambda r, k, i: (0, 0)),
            pl.BlockSpec(
                (1, 1, 2, L, N),
                lambda r, k, i: (r // C, jnp.maximum(i - 1, 0), 0, 0, 0),
            ),
            pl.BlockSpec(
                (1, SEG_CHUNK, 1, L, N),
                lambda r, k, i: (r, k, i, 0, 0),
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, SEG_CHUNK, 2, L, N), lambda r, k, i: (r, k, 0, 0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((R, nh_pad, 2, L, N), jnp.uint32),
        scratch_shapes=[
            pltpu.VMEM((SEG_CHUNK, 2, L, N), jnp.uint32),
            pltpu.VMEM((SEG_CHUNK, 2, L, N), jnp.uint32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(p, pni, low_powers, cache5)
    return out[:, :nh1]


def _pick_cache_block(C: int, L: int, N: int) -> int:
    """Largest divisor of C whose grid-step blocks fit the VMEM budget.

    Per cache row a step holds pt [DEG_CHUNK, L, N] + out [2, L, N] (the
    Pallas pipeline double-buffers the streamed pt); the shared pw block is
    [DEG_CHUNK, 2, L, N].  Budget ~48 MB leaves headroom under the chip's
    128 MB VMEM for the pipeline's second buffers and temporaries."""
    budget = 48 << 20
    pw_bytes = DEG_CHUNK * 2 * L * N * 4
    per_c = (2 * DEG_CHUNK + 2 * 2) * L * N * 4  # pt double-buffered + out
    cap = max(1, (budget - pw_bytes) // per_c)
    for cb in range(min(C, cap), 0, -1):
        if C % cb == 0:
            return cb
    return 1


def _ps_inner2_kernel(p_ref, pni_ref, pw_ref, pt_ref, out_ref, hi_ref, lo_ref,
                      *, ph, nseg):
    """Row-resident segmented dot for the PS inner sums: grid (r, i) with
    the ENTIRE segment axis of one row in VMEM — the accumulator and lazy
    (hi, lo) scratch live across the whole i sweep and are written back
    once per row, the cache streams through exactly once, and each power
    plane is fetched once per row (the v1 kernel re-fetched it per
    SEG_CHUNK k-block and ran 4x more, 4x smaller grid steps).

    Same lazy 64-bit accumulation + fold-every-DEG_CHUNK as v1 (Σ_{u<8} p²
    < 2^59 for eval primes < 2^28); bit-identical canonical outputs."""
    i = pl.program_id(1)
    p = p_ref[...]      # [L, 1]
    pni = pni_ref[...]  # [L, 1]

    @pl.when(i == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)
        hi_ref[...] = jnp.zeros_like(hi_ref)
        lo_ref[...] = jnp.zeros_like(lo_ref)

    @pl.when(i > 0)
    def _():
        pw = pw_ref[0, 0]                        # [2, L, N]
        hi, lo = _mul_wide_narrow(
            pw[None], pt_ref[0, :, 0][:, None, :, :]
        )                                        # [nseg, 2, L, N]
        new_lo = lo_ref[...] + lo
        hi_ref[...] = hi_ref[...] + hi + (new_lo < lo).astype(jnp.uint32)
        lo_ref[...] = new_lo

    @pl.when((i % DEG_CHUNK == 0) & (i > 0) | (i == ph - 1))
    def _():
        s_hi = hi_ref[...]
        s_lo = lo_ref[...]
        m = s_lo * pni[None, None]
        mhi, _ = _mul_wide_hi_generic(m, p[None, None])
        t = s_hi + mhi + (s_lo != 0).astype(jnp.uint32)
        t = _sub_if_ge(t, p)
        t = _sub_if_ge(t, p)
        out_ref[0] = add_mod(out_ref[0], t, p)
        hi_ref[...] = jnp.zeros_like(hi_ref)
        lo_ref[...] = jnp.zeros_like(lo_ref)


def eval_ps_inner_pallas2(
    low_powers, cache5, p_np: np.ndarray, pni_np: np.ndarray,
    caches_per_bundle: int, interpret: bool = False,
):
    """PS inner sums, v2 row-resident kernel (see _ps_inner2_kernel):
    out[r, k] = Σ_{i=1..ph-1} low_powers[r//C, i-1] ⊙ cache5[r, k, i].

    low_powers [B, ph-1, 2, L, N]; cache5 [R, nseg, ph, L, N] with
    R = B·caches_per_bundle; returns [R, nseg, 2, L, N]."""
    B, ell, _, L, N = low_powers.shape
    R, nseg, ph = cache5.shape[:3]
    assert ell == ph - 1 and R == B * caches_per_bundle
    C = caches_per_bundle
    p = jnp.asarray(p_np.reshape(L, 1))
    pni = jnp.asarray(pni_np.reshape(L, 1))

    kernel = functools.partial(_ps_inner2_kernel, ph=ph, nseg=nseg)
    return pl.pallas_call(
        kernel,
        grid=(R, ph),
        in_specs=[
            pl.BlockSpec((L, 1), lambda r, i: (0, 0)),
            pl.BlockSpec((L, 1), lambda r, i: (0, 0)),
            pl.BlockSpec(
                (1, 1, 2, L, N),
                lambda r, i: (r // C, jnp.maximum(i - 1, 0), 0, 0, 0),
            ),
            pl.BlockSpec(
                (1, nseg, 1, L, N),
                lambda r, i: (r, 0, i, 0, 0),
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, nseg, 2, L, N), lambda r, i: (r, 0, 0, 0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((R, nseg, 2, L, N), jnp.uint32),
        scratch_shapes=[
            pltpu.VMEM((nseg, 2, L, N), jnp.uint32),
            pltpu.VMEM((nseg, 2, L, N), jnp.uint32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(p, pni, low_powers, cache5)


def _ps_inner3_kernel(p_ref, pni_ref, pw_ref, pt_ref, out_ref, s00_ref,
                      s01_ref, s11_ref, *, ph, nseg):
    """Row-resident PS inner sums, v3: 14-bit operand splits drop the
    carry tracking entirely.

    Both operands are < 2^28 (eval-level primes), so with a = a1·2^14 + a0
    the three partial products a0·b0, a0·b1 + a1·b0, a1·b1 are each
    < 2^29, and DEG_CHUNK = 8 of them sum in plain u32 with NO overflow
    (8·2·16383² = 4 294 443 008 < 2^32).  Per term that is 2 splits +
    4 muls + 4 adds ≈ 10 VPU ops against v2's ~18 (16-bit schoolbook with
    per-term carry chains) — the fold reconstructs the exact 64-bit chunk
    sum V = s00 + s01·2^14 + s11·2^28 and REDCs it at the SAME plane
    indices as v1/v2, so outputs stay bit-identical (modular reduction
    commutes with exact sums).  pw is pre-split once per plane step and
    reused across all nseg segments."""
    i = pl.program_id(1)
    p = p_ref[...]      # [L, 1]
    pni = pni_ref[...]  # [L, 1]

    @pl.when(i == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)
        s00_ref[...] = jnp.zeros_like(s00_ref)
        s01_ref[...] = jnp.zeros_like(s01_ref)
        s11_ref[...] = jnp.zeros_like(s11_ref)

    @pl.when(i > 0)
    def _():
        m14 = jnp.uint32(0x3FFF)
        pw = pw_ref[0, 0]                        # [2, L, N]
        pw0 = (pw & m14)[None]
        pw1 = (pw >> 14)[None]
        pt = pt_ref[0, :, 0][:, None, :, :]      # [nseg, 1, L, N]
        pt0 = pt & m14
        pt1 = pt >> 14
        s00_ref[...] = s00_ref[...] + pw0 * pt0
        s01_ref[...] = s01_ref[...] + pw0 * pt1 + pw1 * pt0
        s11_ref[...] = s11_ref[...] + pw1 * pt1

    @pl.when((i % DEG_CHUNK == 0) & (i > 0) | (i == ph - 1))
    def _():
        # exact chunk sum V = s00 + s01·2^14 + s11·2^28 as (hi, lo),
        # then the same REDC as v1/v2
        s00 = s00_ref[...]
        s01 = s01_ref[...]
        s11 = s11_ref[...]
        lo14 = s01 << 14
        lo1 = s00 + lo14
        c1 = (lo1 < lo14).astype(jnp.uint32)
        lo28 = s11 << 28
        lo = lo1 + lo28
        c2 = (lo < lo28).astype(jnp.uint32)
        hi = (s01 >> 18) + (s11 >> 4) + c1 + c2
        m = lo * pni[None, None]
        mhi, _ = _mul_wide_hi_generic(m, p[None, None])
        t = hi + mhi + (lo != 0).astype(jnp.uint32)
        t = _sub_if_ge(t, p)
        t = _sub_if_ge(t, p)
        out_ref[0] = add_mod(out_ref[0], t, p)
        s00_ref[...] = jnp.zeros_like(s00_ref)
        s01_ref[...] = jnp.zeros_like(s01_ref)
        s11_ref[...] = jnp.zeros_like(s11_ref)


def eval_ps_inner_pallas3(
    low_powers, cache5, p_np: np.ndarray, pni_np: np.ndarray,
    caches_per_bundle: int, interpret: bool = False,
):
    """PS inner sums, v3 carry-free kernel (see _ps_inner3_kernel):
    out[r, k] = Σ_{i=1..ph-1} low_powers[r//C, i-1] ⊙ cache5[r, k, i].

    low_powers [B, ph-1, 2, L, N]; cache5 [R, nseg, ph, L, N] with
    R = B·caches_per_bundle; returns [R, nseg, 2, L, N].  Bit-identical
    to v1/v2/the XLA fori_loop."""
    B, ell, _, L, N = low_powers.shape
    R, nseg, ph = cache5.shape[:3]
    assert ell == ph - 1 and R == B * caches_per_bundle
    C = caches_per_bundle
    p = jnp.asarray(p_np.reshape(L, 1))
    pni = jnp.asarray(pni_np.reshape(L, 1))

    kernel = functools.partial(_ps_inner3_kernel, ph=ph, nseg=nseg)
    return pl.pallas_call(
        kernel,
        grid=(R, ph),
        in_specs=[
            pl.BlockSpec((L, 1), lambda r, i: (0, 0)),
            pl.BlockSpec((L, 1), lambda r, i: (0, 0)),
            pl.BlockSpec(
                (1, 1, 2, L, N),
                lambda r, i: (r // C, jnp.maximum(i - 1, 0), 0, 0, 0),
            ),
            pl.BlockSpec(
                (1, nseg, 1, L, N),
                lambda r, i: (r, 0, i, 0, 0),
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, nseg, 2, L, N), lambda r, i: (r, 0, 0, 0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((R, nseg, 2, L, N), jnp.uint32),
        scratch_shapes=[
            pltpu.VMEM((nseg, 2, L, N), jnp.uint32),
            pltpu.VMEM((nseg, 2, L, N), jnp.uint32),
            pltpu.VMEM((nseg, 2, L, N), jnp.uint32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(p, pni, low_powers, cache5)


def eval_dot_pallas(
    powers, cache, p_np: np.ndarray, pni_np: np.ndarray, interpret: bool = False
):
    """powers [B, Dp, 2, L, N] NTT mont; cache [B, C, Dp, L, N] NTT mont;
    returns [B, C, 2, L, N].  Dp must be a multiple of DEG_CHUNK.

    interpret=True runs the kernel through the Pallas interpreter (any
    backend) — the in-suite coverage path for the production TPU kernel."""
    B, Dp, _, L, N = powers.shape
    C = cache.shape[1]
    assert Dp % DEG_CHUNK == 0, "degree axis must be chunk-padded"
    nj = Dp // DEG_CHUNK
    p = jnp.asarray(p_np.reshape(L, 1))
    pni = jnp.asarray(pni_np.reshape(L, 1))
    cb = _pick_cache_block(C, L, N)

    kernel = functools.partial(_kernel, chunk=DEG_CHUNK)
    grid = (B, C // cb, nj)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((L, 1), lambda b, c, j: (0, 0)),
            pl.BlockSpec((L, 1), lambda b, c, j: (0, 0)),
            pl.BlockSpec(
                (1, DEG_CHUNK, 2, L, N),
                lambda b, c, j: (b, j, 0, 0, 0),
            ),
            pl.BlockSpec(
                (1, cb, DEG_CHUNK, L, N),
                lambda b, c, j: (b, c, j, 0, 0),
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, cb, 2, L, N), lambda b, c, j: (b, c, 0, 0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((B, C, 2, L, N), jnp.uint32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(p, pni, powers, cache)
