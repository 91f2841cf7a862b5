"""Four-step negacyclic NTT with int8-decomposed MXU matmuls.

The staged/Pallas NTTs (core/ntt.py, ops/ntt_pallas.py) execute log2(N)
butterfly stages on the VPU; at N=8192 that is compute-bound ~100x above
the HBM streaming floor.  This module reformulates the same transform as
two small DFT matmuls so the bulk arithmetic rides the MXU instead.

MEASURED VERDICT (chip, [64, 6, 8192]): 4.2 ms vs the staged XLA path's
1.9 ms — the matmuls themselves are nearly free, but the mod-p digit
recombination costs 7 Montgomery multiplies PER OUTPUT ELEMENT, while the
butterfly NTT's total is log2(N)/2 ≈ 6.5 per output: for ≤30-bit primes
the four-step mod-p formulation cannot beat butterflies on this VPU, and
the measured VPU integer floor (~0.35 T uint32-op/s) binds both.  Kept as
an opt-in (APSU_NTT4=1) record of the negative result:

    x[k1·n2+k2] --twist psi^k--> B[k1,k2]
    G = W1 @ B        (DFT_n1 over rows,   W1[j1,k1] = w^(n2·k1·rev1(j1)))
    H = G ⊙ T         (T[j1,k2] = w^(k2·rev1(j1)))
    out2d = H @ W2^T  (DFT_n2 over cols,   W2[j2,k2] = w^(n1·k2·rev2(j2)))

with the output bit-reversal of the reference transform BAKED into the
constant matrices via rev1/rev2 (for N = n1·n2, rev_N(j1·n2+j2) =
rev_n1(j1) + n1·rev_n2(j2)), so the result array is bit-identical to
``NttContext.ntt`` — same permutation, same Montgomery form, same
canonical residues.  The inverse mirrors it (column DFT first, then row
DFT, then psi^{-k}·N^{-1} untwist).

The mod-p matmuls decompose both operands into four recentered byte
digits (d-128 ∈ [-128,127], the MXU's native s8·s8→s32 mode): the exact
integer product is

    Σ_k W[o,k]·X[k,c] = Σ_{u,v} 256^{u+v} · S_uv[o,c]
    S_uv = s8matmul(Wv', Xu') + 128·colsum(Xu') + 128·rowsum(Wv') + K·2^14

with every S_uv < K·255² < 2^23, so the 7 digit-weight groups (u+v) are
summed exactly in s32 (< 2^25) and recombined mod p with one Montgomery
multiply by 256^g·R each.  Replaces the role of SEAL's util/ntt on the
hot path (reference surface: /root/reference/CMakeLists.txt:120-128).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from apsu_tpu.core import nt
from apsu_tpu.core.mod32 import add_mod, mont_mul

I32 = jnp.int32
U32 = jnp.uint32


def _split(n: int):
    """n = n1·n2 with n1 >= n2, both powers of two (n1 carries the larger
    matmul contraction)."""
    logn = n.bit_length() - 1
    n2 = 1 << (logn // 2)
    return n // n2, n2


def _digits_recentered(w: np.ndarray) -> np.ndarray:
    """uint32 [..] -> recentered byte digits int8 [4, ..]."""
    d = np.stack([((w >> (8 * u)) & 0xFF).astype(np.int32) - 128 for u in range(4)])
    return d.astype(np.int8)


# digit-pair multiplicity per weight group g = u + v
_CNT_G = np.array([1, 2, 3, 4, 3, 2, 1], np.int32)


def _block_tables(w: np.ndarray):
    """W [L, O, K] uint32 -> (blk [L, 7·O, 4·K] s8, rs [7, L, O] i32).

    blk[l, g·O+o, u·K+k] = digit_{g-u}(W[l,o,k]) - 128 for 0 ≤ g-u < 4,
    zero otherwise; rs[g] = Σ_{v: (g-v,v) valid… } — the per-group sum of
    recentered W-digit row sums Σ_{u+v=g} rowsum(Wd_v), used by the
    correction term."""
    d = _digits_recentered(w)                    # [4, L, O, K] s8
    L, O, K = w.shape
    blk = np.zeros((L, 7 * O, 4 * K), np.int8)
    rs = np.zeros((7, L, O), np.int64)
    drs = d.astype(np.int64).sum(axis=-1)        # [4, L, O]
    for g in range(7):
        for u in range(4):
            v = g - u
            if 0 <= v < 4:
                blk[:, g * O : (g + 1) * O, u * K : (u + 1) * K] = d[v]
                rs[g] += drs[v]
    return blk, rs.astype(np.int32)


class Ntt4Tables:
    """Per-(primes, N) constant tables for the four-step transform.

    All host numpy — baked into the HLO as literals at trace time (the
    axon backend compiles closures over eager device arrays ~100x slower).
    """

    def __init__(self, primes: Sequence[int], n: int):
        self.primes = [int(p) for p in primes]
        self.n = n
        self.L = L = len(self.primes)
        n1, n2 = _split(n)
        self.n1, self.n2 = n1, n2
        r1 = nt.bit_reverse_perm(n1)
        r2 = nt.bit_reverse_perm(n2)

        w1 = np.zeros((L, n1, n1), np.uint32)      # plain omega1 powers
        w2 = np.zeros((L, n2, n2), np.uint32)
        w1i = np.zeros((L, n1, n1), np.uint32)
        w2i = np.zeros((L, n2, n2), np.uint32)
        tw_mid = np.zeros((L, n1, n2), np.uint32)  # mont
        tw_mid_i = np.zeros((L, n1, n2), np.uint32)
        twist = np.zeros((L, n), np.uint32)        # mont psi^k
        untwist = np.zeros((L, n), np.uint32)      # mont psi^{-k}/N
        p_arr = np.zeros((L,), np.uint32)
        pni = np.zeros((L,), np.uint32)
        cg = np.zeros((7, L), np.uint32)           # mont 256^g

        R = 1 << 32
        for l, p in enumerate(self.primes):
            psi = nt.root_of_unity(2 * n, p)
            w = psi * psi % p

            def pows(base: int, cnt: int) -> np.ndarray:
                out = np.empty(cnt, np.uint64)
                cur = 1
                for i in range(cnt):
                    out[i] = cur
                    cur = cur * base % p
                return out

            pw = pows(w, n)                       # w^e for e < n
            pwi = pows(pow(w, -1, p), n)
            # W1[j1, k1] = w1g^(k1·rev1(j1)), w1g = w^n2 (order n1)
            e1 = (np.arange(n1)[None, :] * r1[:, None]) % n1   # [j1, k1]
            w1[l] = pw[e1 * n2]
            w1i[l] = pwi[e1.T * n2]   # W1i[k1, j1] = w1g^{-k1·rev1(j1)}
            e2 = (np.arange(n2)[None, :] * r2[:, None]) % n2   # [j2, k2]
            w2[l] = pw[e2 * n1]
            w2i[l] = pwi[e2.T * n1]   # W2i[k2, j2] = w2g^{-k2·rev2(j2)}
            # mid twiddles: T[j1, k2] = w^(k2·rev1(j1)) (mont)
            em = np.outer(r1, np.arange(n2)) % n
            tw_mid[l] = (pw[em] << np.uint64(32)) % np.uint64(p)
            tw_mid_i[l] = (pwi[em] << np.uint64(32)) % np.uint64(p)
            psp = pows(psi, n)
            pspi = pows(pow(psi, -1, p), n)
            ninv = pow(n, -1, p)
            twist[l] = (psp << np.uint64(32)) % np.uint64(p)
            untwist[l] = (
                pspi * np.uint64(ninv) % np.uint64(p) << np.uint64(32)
            ) % np.uint64(p)
            p_arr[l] = p
            pni[l] = (-pow(p, -1, R)) % R
            for g in range(7):
                cg[g, l] = pow(256, g, p) * R % p

        # byte-decomposed matmul constants: the digit convolution
        # G_g = Σ_{u+v=g} Wd_v @ Xd_u is encoded as ONE block matmul per
        # transform step — W'[g·O+o, u·K+k] = Wd_{g-u}[o,k] (recentered s8,
        # zero block where g-u ∉ [0,4)) so the einsum output rows ARE the 7
        # digit-weight groups.  Versus the 4-matmul/16-split formulation
        # this trades ~1.75× more (nearly free) MXU MACs for eliminating
        # every int32 partial-plane materialization — measured 3.5 ms →
        # MXU-bound sub-ms at the [64, 6, 8192] bench shape.
        self.w1_blk, self.w1_rs = _block_tables(w1)   # [L, 7·O, 4·K] s8
        self.w2_blk, self.w2_rs = _block_tables(w2)
        self.w1i_blk, self.w1i_rs = _block_tables(w1i)
        self.w2i_blk, self.w2i_rs = _block_tables(w2i)
        self.tw_mid = tw_mid
        self.tw_mid_i = tw_mid_i
        self.twist = twist.reshape(L, n1, n2)
        self.untwist = untwist.reshape(L, n1, n2)
        self.p = p_arr
        self.pni = pni
        self.cg = cg


def _modmat_rows(wblk, w_rs, x, tb, contract_rows: bool):
    """Exact mod-p matmul with byte-decomposed operands.

    contract_rows: out[b,l,o,c] = Σ_k W[l,o,k]·x[b,l,k,c]
    else (cols):   out[b,l,r,o] = Σ_c W[l,o,c]·x[b,l,r,c]
    x: uint32 canonical residues; W given as the digit-convolution block
    operand wblk [L, 7·O, 4·K] (see ``_block_tables``) with per-group row
    sums w_rs [7, L, O].  Returns uint32 mod p.

    ONE s8 matmul produces all 7 digit-weight groups directly
    (G_g = Σ_{u+v=g} Wd_v @ Xd_u via the block structure of wblk); the
    recentering corrections are rank-1 broadcasts per group, and the only
    int32 tensor ever materialized is the [.., 7·O, C] group stack.
    """
    O = wblk.shape[-2] // 7
    K = wblk.shape[-1] // 4
    p = tb.p.reshape(tb.L, 1, 1)
    pni = tb.pni.reshape(tb.L, 1, 1)
    xi = x.astype(I32)
    ax = -2 if contract_rows else -1
    xd = jnp.concatenate(
        [(((xi >> (8 * u)) & 0xFF) - 128).astype(jnp.int8) for u in range(4)],
        axis=ax,
    )  # digits stacked on the contraction axis
    if contract_rows:
        B_, L_, _, C_ = xd.shape
        csum_u = jnp.sum(xd.astype(I32).reshape(B_, L_, 4, K, C_), axis=-2)
        # [B, L, 4, C]
        grp = jnp.einsum(
            "lgk,blkc->blgc", jnp.asarray(wblk), xd,
            preferred_element_type=I32,
        ).reshape(B_, L_, 7, O, C_)
    else:
        B_, L_, R_, _ = xd.shape
        csum_u = jnp.sum(xd.astype(I32).reshape(B_, L_, R_, 4, K), axis=-1)
        # [B, L, R, 4]
        grp = jnp.einsum(
            "lgc,blrc->blrg", jnp.asarray(wblk), xd,
            preferred_element_type=I32,
        ).reshape(B_, L_, R_, 7, O)
    out = None
    for g in range(7):
        u_lo, u_hi = max(0, g - 3), min(3, g)
        if contract_rows:
            csum_g = jnp.sum(csum_u[:, :, u_lo : u_hi + 1], axis=2)  # [B,L,C]
            s = (
                grp[:, :, g]
                + 128 * csum_g[:, :, None, :]
                + 128 * jnp.asarray(w_rs[g])[None, :, :, None]
                + np.int32(int(_CNT_G[g]) * K * 16384)
            )
        else:
            csum_g = jnp.sum(csum_u[..., u_lo : u_hi + 1], axis=-1)  # [B,L,R]
            s = (
                grp[..., g, :]
                + 128 * csum_g[..., None]
                + 128 * jnp.asarray(w_rs[g])[None, :, None, :]
                + np.int32(int(_CNT_G[g]) * K * 16384)
            )
        term = mont_mul(s.astype(U32), tb.cg[g].reshape(tb.L, 1, 1), p, pni)
        out = term if out is None else add_mod(out, term, p)
    return out


def ntt4(x, tb: Ntt4Tables):
    """Forward negacyclic NTT, bit-identical to ``NttContext.ntt``.
    x: [..., L, N] uint32 Montgomery form."""
    lead = x.shape[:-2]
    L, n = x.shape[-2:]
    n1, n2 = tb.n1, tb.n2
    p = tb.p.reshape(L, 1, 1)
    pni = tb.pni.reshape(L, 1, 1)
    xb = x.reshape((-1, L, n1, n2))
    b = mont_mul(xb, tb.twist[None], p, pni)
    g = _modmat_rows(tb.w1_blk, tb.w1_rs, b, tb, contract_rows=True)
    h = mont_mul(g, tb.tw_mid[None], p, pni)
    out = _modmat_rows(tb.w2_blk, tb.w2_rs, h, tb, contract_rows=False)
    return out.reshape(lead + (L, n))


def intt4(x, tb: Ntt4Tables):
    """Inverse transform, bit-identical to ``NttContext.intt``."""
    lead = x.shape[:-2]
    L, n = x.shape[-2:]
    n1, n2 = tb.n1, tb.n2
    p = tb.p.reshape(L, 1, 1)
    pni = tb.pni.reshape(L, 1, 1)
    yb = x.reshape((-1, L, n1, n2))
    pcol = _modmat_rows(tb.w2i_blk, tb.w2i_rs, yb, tb, contract_rows=False)
    q = mont_mul(pcol, tb.tw_mid_i[None], p, pni)
    bb = _modmat_rows(tb.w1i_blk, tb.w1i_rs, q, tb, contract_rows=True)
    out = mont_mul(bb, tb.untwist[None], p, pni)
    return out.reshape(lead + (L, n))
