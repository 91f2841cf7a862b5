"""Pallas TPU NTT/INTT with compact pair-form butterflies — the fast path.

Both existing backends pay a structural tax at N=8192:

* the staged XLA path (core/ntt.py) IS pair-form (one Shoup multiply per
  butterfly PAIR), but each of the log2(N) stages round-trips the tensor
  through HBM;
* the fused Pallas kernel (ops/ntt_pallas.py) stays in VMEM but uses a
  per-POSITION select formulation — every element pays a full Shoup
  multiply (2× the pair-form muls) plus two lane-crossing `pltpu.roll`
  relayouts per stage.

This kernel combines both wins: the whole transform runs in VMEM AND every
stage is pair-form.  The trick is layout: one residue plane [L, N] is
viewed as [L, A, 128] (A = N/128, lanes last).

* **Phase A** (stages with pair stride t ≥ 128): pairs differ along the A
  axis — the compact u/v split is a reshape of the sublane-side axis,
  which Mosaic lowers as pure indexing.
* **Phase B** (t ≤ 64): the tensor is transposed once to [L, 128, A]
  (the 128 flat-contiguous positions move to the sublane-side axis), so
  the remaining seven strides are sublane-axis reshapes too; transposed
  back after.  Lane-axis reshapes (unsupported Mosaic shape casts) never
  occur; the price is A(=64 at N=8192)-lane occupancy during phase B.

Per-element cost ≈ 6 stages × ~10 ops + 7 × ~20 (half-lane) vs 13 × ~22
for the select kernel — with zero HBM round trips and no roll relayouts.
Outputs are bit-identical to ``NttContext.ntt/intt`` (same Harvey
lazy-Shoup butterflies, same exact values mod p, one canonicalization at
the end).  Replaces the role of SEAL's ``util/ntt`` on the hot path
(reference surface: /root/reference/CMakeLists.txt:120-128 — the per-limb
inner transform of ComputePowers/relinearization/BEHZ,
receiver_osn.cpp:446-488).

Requires N ≥ 2048 (so A ≥ 16).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from apsu_tpu.core.mod32 import shoup_mul_lazy
from apsu_tpu.ops.ntt_pallas import stage_twiddles

N_PHASE_B = 7  # stages with t = 64, 32, 16, 8, 4, 2, 1


def pair_tables(w_pl: np.ndarray, w_sh: np.ndarray, n: int, inverse: bool):
    """(twA [L, logA, N], twAs, twB [L, 7, 128, A], twBs): per-position
    stage tables — phase A in the original layout, phase B re-laid-out
    into the transposed view (twB[l, k, b, a] = stage table of
    s = logA+k at flat position a·128 + b)."""
    tw, tws = stage_twiddles(w_pl, w_sh, n, inverse)  # [L, logn, N]
    logn = n.bit_length() - 1
    logA = logn - 7
    A = n >> 7
    L = tw.shape[0]

    def split(t):
        ta = np.ascontiguousarray(t[:, :logA])
        tb = t[:, logA:].reshape(L, N_PHASE_B, A, 128)
        tb = np.ascontiguousarray(tb.transpose(0, 1, 3, 2))
        return ta, tb

    twA, twB = split(tw)
    twAs, twBs = split(tws)
    return twA, twAs, twB, twBs


def _red2p(x, two_p):
    return jnp.where(x >= two_p, x - two_p, x)


def _kernel(twA_ref, twAs_ref, twB_ref, twBs_ref, p_ref, x_ref, o_ref, *,
            logn, inverse, ninv_ref=None):
    n = 1 << logn
    A = n >> 7
    logA = logn - 7
    L = p_ref.shape[0]
    p2 = p_ref[...]            # [L, 1]

    def pb(nd):
        return p2.reshape((L,) + (1,) * (nd - 1))

    def butterfly(u, v, tw, tws):
        two_p = pb(u.ndim) + pb(u.ndim)
        if not inverse:
            # lazy CT: u' = red2p(u); (u'+wv, u'+2p-wv), values in [0, 4p)
            u = _red2p(u, two_p)
            wv = shoup_mul_lazy(v, tw, tws, pb(u.ndim))
            return u + wv, (u + two_p) - wv
        # lazy GS: (red2p(u+v), w·(u + 2p − v)), values in [0, 2p)
        a = _red2p(u + v, two_p)
        b = shoup_mul_lazy((u + two_p) - v, tw, tws, pb(u.ndim))
        return a, b

    def phase_a(x, s):
        # x [L, A, 128]; pair stride along A
        m = 1 << s
        ta = A >> (s + 1)
        xs = x.reshape(L, m, 2, ta, 128)
        tw = twA_ref[:, s].reshape(L, m, 2, ta, 128)[:, :, 1]
        tws = twAs_ref[:, s].reshape(L, m, 2, ta, 128)[:, :, 1]
        a, b = butterfly(xs[:, :, 0], xs[:, :, 1], tw, tws)
        return jnp.stack([a, b], axis=2).reshape(L, A, 128)

    def phase_b(y, k):
        # y [L, 128, A]; pair stride t = 64 >> k along the 128 axis
        t = 64 >> k
        q = 128 // (2 * t)
        ys = y.reshape(L, q, 2, t, A)
        tw = twB_ref[:, k].reshape(L, q, 2, t, A)[:, :, 1]
        tws = twBs_ref[:, k].reshape(L, q, 2, t, A)[:, :, 1]
        a, b = butterfly(ys[:, :, 0], ys[:, :, 1], tw, tws)
        return jnp.stack([a, b], axis=2).reshape(L, 128, A)

    x = x_ref[0].reshape(L, A, 128)
    if not inverse:
        for s in range(logA):
            x = phase_a(x, s)
        y = jnp.swapaxes(x, 1, 2)          # [L, 128, A]
        for k in range(N_PHASE_B):
            y = phase_b(y, k)
        x = jnp.swapaxes(y, 1, 2).reshape(L, n)
        two_p = p2 + p2
        x = jnp.where(x >= two_p, x - two_p, x)
    else:
        y = jnp.swapaxes(x, 1, 2)
        for k in reversed(range(N_PHASE_B)):
            y = phase_b(y, k)
        x = jnp.swapaxes(y, 1, 2)
        for s in reversed(range(logA)):
            x = phase_a(x, s)
        x = x.reshape(L, n)
        x = shoup_mul_lazy(x, ninv_ref[..., 0, :], ninv_ref[..., 1, :], p2)
    o_ref[0] = jnp.where(x >= p2, x - p2, x)


def ntt_pair(
    x, tables, p_np: np.ndarray,
    inverse: bool = False, ninv_np: np.ndarray | None = None,
    interpret: bool = False,
):
    """x: [..., L, N] Montgomery residues; tables: pair_tables(...) output
    for the matching direction; returns the transform, bit-identical to
    ``NttContext.ntt/intt``.  ninv_np: [L, 2] plain/Shoup N^{-1}."""
    L, N = x.shape[-2], x.shape[-1]
    logn = N.bit_length() - 1
    assert N >= 2048, "pair kernel needs A >= 16"
    lead = x.shape[:-2]
    B = int(np.prod(lead)) if lead else 1
    xf = x.reshape(B, L, N)
    twA, twAs, twB, twBs = tables

    p = jnp.asarray(p_np.reshape(L, 1))
    args = [jnp.asarray(twA), jnp.asarray(twAs), jnp.asarray(twB),
            jnp.asarray(twBs), p, xf]
    in_specs = [
        pl.BlockSpec(twA.shape, lambda b: (0, 0, 0)),
        pl.BlockSpec(twAs.shape, lambda b: (0, 0, 0)),
        pl.BlockSpec(twB.shape, lambda b: (0, 0, 0, 0)),
        pl.BlockSpec(twBs.shape, lambda b: (0, 0, 0, 0)),
        pl.BlockSpec((L, 1), lambda b: (0, 0)),
        pl.BlockSpec((1, L, N), lambda b: (b, 0, 0)),
    ]
    if inverse:
        ninv = jnp.asarray(ninv_np.reshape(L, 2, 1))
        args.append(ninv)
        in_specs.append(pl.BlockSpec((L, 2, 1), lambda b: (0, 0, 0)))

        def kernel(twA_r, twAs_r, twB_r, twBs_r, p_r, x_r, ninv_r, o_r):
            _kernel(twA_r, twAs_r, twB_r, twBs_r, p_r, x_r, o_r,
                    logn=logn, inverse=True, ninv_ref=ninv_r)
    else:
        kernel = functools.partial(_kernel, logn=logn, inverse=False)

    out = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, L, N), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, L, N), jnp.uint32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*args)
    return out.reshape(x.shape)
