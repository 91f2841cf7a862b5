"""Pallas TPU kernel for the negacyclic NTT/INTT — all stages fused in VMEM.

The XLA implementation (core/ntt.py) lowers each of the log2(N) butterfly
stages to reshape + elementwise ops, so the tensor makes log2(N) round
trips through HBM.  This kernel keeps one batch element's full [L, N]
residue plane resident in VMEM for the whole transform: per stage, the
butterfly partner is a ``pltpu.roll`` by the stage stride along the lane
axis and the twiddle is a per-position table precomputed on host.

Butterflies use Harvey's lazy Shoup multiplication (same formulation as the
staged XLA path in core/ntt.py): per-position PLAIN twiddle tables plus
their precomputed ``floor(w·2^32/p)`` Shoup companions, values kept in
[0, 4p) across forward stages ([0, 2p) inverse) and canonicalized once at
the end — bit-identical canonical outputs, ~2x fewer VPU ops per butterfly
than the Montgomery form.

HBM traffic: 1 read + 1 write of the tensor instead of log2(N) round trips.

Block layout (Mosaic requires the last two block dims to equal the array
dims or be tile-divisible): grid over the flattened leading batch only;
every limb-indexed operand ships as one full-array block ([L, N] twiddle
slices, [L, 1] per-limb constants that broadcast along lanes in-kernel).

Used by core/ntt.py's NttContext when running on TPU; the stage tables add
2·[L, log2 N, N] uint32 per (primes, N) context (plain + Shoup).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from apsu_tpu.core.mod32 import shoup_mul_lazy


def stage_twiddles(
    w_pl: np.ndarray, w_sh: np.ndarray, n: int, inverse: bool
) -> tuple[np.ndarray, np.ndarray]:
    """Per-position stage twiddle tables ([L, log2 N, N] plain,
    [L, log2 N, N] Shoup companions) from the bit-reversed root tables
    (plain residues + shoup_pair precomputes).

    Forward stage s uses W[m + block] at every position of pair-block
    ``block`` (m = 2^s, block = pos >> (log2 N - s)); the inverse runs the
    stages in reversed order with the inverse table.
    """
    L = w_pl.shape[0]
    logn = n.bit_length() - 1
    out_pl = np.empty((L, logn, n), dtype=np.uint32)
    out_sh = np.empty((L, logn, n), dtype=np.uint32)
    pos = np.arange(n)
    for s in range(logn):
        m = 1 << s
        block = pos >> (logn - s)  # n/(2t) blocks of size 2t, t = n>>(s+1)
        out_pl[:, s, :] = w_pl[:, m + block]
        out_sh[:, s, :] = w_sh[:, m + block]
    return out_pl, out_sh


def _ntt_kernel(tw_ref, tws_ref, p_ref, x_ref, o_ref, *, logn, inverse,
                ninv_ref=None, unroll=False):
    n = 1 << logn
    p = p_ref[...]      # [L, 1] broadcasts along lanes
    two_p = p + p
    x = x_ref[0]        # [L, N]
    pos = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)

    def stage(i, x, static=False):
        s = i if not inverse else logn - 1 - i
        if static:
            # python-int stage: static roll amounts and slice offsets lower
            # to single relayout ops (a dynamic roll amount goes through a
            # generic multi-op path)
            t = 1 << (logn - 1 - s)
            tw = tw_ref[:, s, :]
            tws = tws_ref[:, s, :]
        else:
            t = jnp.int32(1) << (logn - 1 - s)
            tw = tw_ref[:, s, :]    # [L, N] dynamic stage slice, plain
            tws = tws_ref[:, s, :]  # [L, N] Shoup companions
        xb = pltpu.roll(x, n - t, axis=1)  # partner for a-positions: x[j + t]
        xa = pltpu.roll(x, t, axis=1)      # partner for b-positions: x[j - t]
        is_a = ((pos >> (logn - 1 - s)) & 1) == 0
        if not inverse:
            # lazy CT: u' = red2p(u); a: u' + w·v ; b: u' + 2p − w·v
            v = shoup_mul_lazy(jnp.where(is_a, xb, x), tw, tws, p)  # [0, 2p)
            u = jnp.where(is_a, x, xa)
            u = jnp.where(u >= two_p, u - two_p, u)
            return jnp.where(is_a, u + v, (u + two_p) - v)  # [0, 4p)
        # lazy GS: a: red2p(u + v) ; b: w·(u + 2p − v)
        u = jnp.where(is_a, x, xa)
        v = jnp.where(is_a, xb, x)
        a = u + v
        a = jnp.where(a >= two_p, a - two_p, a)
        b = shoup_mul_lazy((u + two_p) - v, tw, tws, p)
        return jnp.where(is_a, a, b)  # [0, 2p)

    if unroll:
        # fully unrolled static stages (small L: the per-stage temporaries
        # fit the Mosaic stack — at L=10 an unrolled Montgomery variant blew
        # the 16 MB scoped-vmem limit, hence the gate in ntt_pallas())
        for i in range(logn):
            x = stage(i, x, static=True)
    else:
        x = jax.lax.fori_loop(0, logn, stage, x)
    if inverse:
        x = shoup_mul_lazy(x, ninv_ref[..., 0, :], ninv_ref[..., 1, :], p)
    else:
        x = jnp.where(x >= two_p, x - two_p, x)
    o_ref[0] = jnp.where(x >= p, x - p, x)


def ntt_pallas(
    x, tw_np: np.ndarray, p_np: np.ndarray,
    inverse: bool = False, ninv_np: np.ndarray | None = None,
    interpret: bool = False,
):
    """x: [..., L, N] Montgomery residues; tw_np: ([L, log2 N, N] plain,
    [L, log2 N, N] Shoup) stage tables (stage_twiddles); returns the
    transform with the same shape.  ninv_np: [L, 2] plain/Shoup N^{-1}."""
    L, N = x.shape[-2], x.shape[-1]
    logn = N.bit_length() - 1
    lead = x.shape[:-2]
    B = int(np.prod(lead)) if lead else 1
    xf = x.reshape(B, L, N)

    # sublane fill: a [L, N] block with L < 8 leaves every (8, 128) vreg
    # tile L/8 occupied — at the eval level (L=4) that is 2x wasted VPU
    # work.  Fuse G batch elements into the sublane axis ([G·L, N] blocks)
    # with G-tiled twiddle/constant tables; per-limb math is unchanged, so
    # outputs are bit-identical.  Only when G divides B (a pad would copy
    # the whole tensor).  G is capped at filling ONE vreg row: larger
    # fills (e.g. G·L = 24 at the query level, G·L = 36 on Bsk) measured
    # SLOWER end-to-end (warm query 362 ms vs 281 ms,
    # tools/profile_query.py) — bigger per-step blocks cost more VMEM/
    # pipeline overlap than the saved sublanes are worth.
    G = max(1, 8 // L)
    while G > 1 and B % G:
        G -= 1
    if G > 1:
        B //= G
        xf = xf.reshape(B, G * L, N)
        p_np = np.tile(p_np.reshape(L), G)
        tw_np = (np.tile(tw_np[0], (G, 1, 1)), np.tile(tw_np[1], (G, 1, 1)))
        if ninv_np is not None:
            ninv_np = np.tile(ninv_np.reshape(L, 2), (G, 1))
        L = G * L

    p = jnp.asarray(p_np.reshape(L, 1))
    tw = jnp.asarray(tw_np[0])
    tws = jnp.asarray(tw_np[1])
    full2 = lambda b: (0, 0)
    args = [tw, tws, p, xf]
    in_specs = [
        pl.BlockSpec((L, logn, N), lambda b: (0, 0, 0)),
        pl.BlockSpec((L, logn, N), lambda b: (0, 0, 0)),
        pl.BlockSpec((L, 1), full2),
        pl.BlockSpec((1, L, N), lambda b: (b, 0, 0)),
    ]
    # static-stage unrolling: cheap rolls, but per-stage temporaries live on
    # the Mosaic stack — gate on the residue-plane size
    unroll = L * N * 4 <= 8 * 8192 * 4
    if inverse:
        ninv = jnp.asarray(ninv_np.reshape(L, 2, 1))
        args.append(ninv)
        in_specs.append(pl.BlockSpec((L, 2, 1), lambda b: (0, 0, 0)))

        def kernel(tw_r, tws_r, p_r, x_r, ninv_r, o_r):
            _ntt_kernel(
                tw_r, tws_r, p_r, x_r, o_r, logn=logn, inverse=True,
                ninv_ref=ninv_r, unroll=unroll,
            )
    else:
        kernel = functools.partial(
            _ntt_kernel, logn=logn, inverse=False, unroll=unroll
        )

    out = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, L, N), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, L, N), jnp.uint32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            # the unrolled-stage path keeps per-stage twiddle slices and roll
            # temporaries on the Mosaic stack; with the Shoup companion table
            # doubling the per-stage operands, L=7/N=8192 needs ~20.5 MB of
            # scoped VMEM — above the 16 MB default but far under the chip's
            # 128 MB VMEM (measured OOM on v5e at the 16M-4096 relin shape)
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*args)
    return out.reshape(x.shape)
