"""Pallas TPU kernel for the negacyclic NTT/INTT — all stages fused in VMEM.

The XLA implementation (core/ntt.py) lowers each of the log2(N) butterfly
stages to reshape + elementwise ops, so the tensor makes log2(N) round
trips through HBM (measured 25 ms for [64, 7, 8192] on v5e — 1.2 GB/s
effective).  This kernel keeps one batch element's full [L, N] residue
plane resident in VMEM for the whole transform: per stage, the butterfly
partner is a ``pltpu.roll`` by the stage stride along the lane axis and the
twiddle is a per-position table precomputed on host, giving exactly the
same Montgomery mul/add/sub sequence per element as the XLA stages
(bit-identical results).

HBM traffic: 1 read + 1 write of the tensor instead of log2(N) round trips
— the NTT is bandwidth-bound, so this is the speed-of-light shape for it.

Block layout (Mosaic requires the last two block dims to equal the array
dims or be tile-divisible): grid over the flattened leading batch only;
every limb-indexed operand ships as one full-array block ([L, N] twiddle
slices, [L, 1] per-limb constants that broadcast along lanes in-kernel).

Used by core/ntt.py's NttContext when running on TPU; the stage tables add
[L, log2 N, N] uint32 per (primes, N) context.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from apsu_tpu.core.mod32 import add_mod, mont_mul, sub_mod


def stage_twiddles(w: np.ndarray, n: int, inverse: bool) -> np.ndarray:
    """Per-position stage twiddle tables [L, log2 N, N] from the bit-reversed
    root table w [L, N] (Montgomery form).

    Forward stage s uses W[m + block] at every position of pair-block
    ``block`` (m = 2^s, block = pos >> (log2 N - s)); the inverse runs the
    stages in reversed order with the inverse table.
    """
    L = w.shape[0]
    logn = n.bit_length() - 1
    out = np.empty((L, logn, n), dtype=np.uint32)
    pos = np.arange(n)
    for s in range(logn):
        m = 1 << s
        block = pos >> (logn - s)  # n/(2t) blocks of size 2t, t = n>>(s+1)
        out[:, s, :] = w[:, m + block]
    return out


def _ntt_kernel(tw_ref, p_ref, pni_ref, x_ref, o_ref, *, logn, inverse,
                ninv_ref=None):
    n = 1 << logn
    p = p_ref[...]      # [L, 1] broadcasts along lanes
    pni = pni_ref[...]  # [L, 1]
    x = x_ref[0]        # [L, N]
    pos = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)

    # Stages run inside a fori_loop with a TRACED stage index: a fully
    # unrolled Python loop kept every stage's temporaries live on the Mosaic
    # stack and blew the 16 MB scoped-vmem limit at L=10 limbs (26.5 MB).
    # t = 2^(logn-1-s) becomes a dynamic shift/roll amount; the twiddle row
    # is a dynamic slice of the stage table.
    def stage(i, x):
        s = i if not inverse else logn - 1 - i
        t = jnp.int32(1) << (logn - 1 - s)
        tw = tw_ref[:, s, :]  # [L, N] dynamic stage slice
        xb = pltpu.roll(x, n - t, axis=1)  # partner for a-positions: x[j + t]
        xa = pltpu.roll(x, t, axis=1)      # partner for b-positions: x[j - t]
        is_a = ((pos >> (logn - 1 - s)) & 1) == 0
        if not inverse:
            # a: u + w·v ; b: u - w·v  (u = partner at a-pos offset)
            v = mont_mul(jnp.where(is_a, xb, x), tw, p, pni)
            return jnp.where(is_a, add_mod(x, v, p), sub_mod(xa, v, p))
        # inverse stage: a: u + v ; b: (u - v)·w
        u = jnp.where(is_a, x, xa)
        v = jnp.where(is_a, xb, x)
        s_ = sub_mod(u, v, p)
        return jnp.where(is_a, add_mod(u, v, p), mont_mul(s_, tw, p, pni))

    x = jax.lax.fori_loop(0, logn, stage, x)
    if inverse:
        x = mont_mul(x, ninv_ref[...], p, pni)
    o_ref[0] = x


def ntt_pallas(
    x, tw_np: np.ndarray, p_np: np.ndarray, pni_np: np.ndarray,
    inverse: bool = False, ninv_np: np.ndarray | None = None,
    interpret: bool = False,
):
    """x: [..., L, N] Montgomery residues; tw_np: [L, log2 N, N] stage
    tables (stage_twiddles); returns the transform with the same shape."""
    L, N = x.shape[-2], x.shape[-1]
    logn = N.bit_length() - 1
    lead = x.shape[:-2]
    B = int(np.prod(lead)) if lead else 1
    xf = x.reshape(B, L, N)

    p = jnp.asarray(p_np.reshape(L, 1))
    pni = jnp.asarray(pni_np.reshape(L, 1))
    tw = jnp.asarray(tw_np)
    full2 = lambda b: (0, 0)
    args = [tw, p, pni, xf]
    in_specs = [
        pl.BlockSpec((L, logn, N), lambda b: (0, 0, 0)),
        pl.BlockSpec((L, 1), full2),
        pl.BlockSpec((L, 1), full2),
        pl.BlockSpec((1, L, N), lambda b: (b, 0, 0)),
    ]
    if inverse:
        ninv = jnp.asarray(ninv_np.reshape(L, 1))
        args.append(ninv)
        in_specs.append(pl.BlockSpec((L, 1), full2))

        def kernel(tw_r, p_r, pni_r, x_r, ninv_r, o_r):
            _ntt_kernel(
                tw_r, p_r, pni_r, x_r, o_r, logn=logn, inverse=True,
                ninv_ref=ninv_r,
            )
    else:
        kernel = functools.partial(_ntt_kernel, logn=logn, inverse=False)

    out = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, L, N), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, L, N), jnp.uint32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(*args)
    return out.reshape(x.shape)
