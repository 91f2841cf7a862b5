"""Four-step negacyclic NTT with int8-decomposed MXU matmuls.

The staged/Pallas NTTs (core/ntt.py, ops/ntt_pallas.py) execute log2(N)
butterfly stages on the VPU; at N=8192 that is compute-bound ~100x above
the HBM streaming floor.  This module reformulates the same transform as
two small DFT matmuls so the arithmetic rides the MXU instead:

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

        # byte-decomposed matmul constants (+ recentered row sums)
        self.w1_b = _digits_recentered(w1)          # [4, L, n1, n1] s8
        self.w2_b = _digits_recentered(w2)
        self.w1i_b = _digits_recentered(w1i)        # [4, L, n1, n1]
        self.w2i_b = _digits_recentered(w2i)
        self.w1_rs = self.w1_b.astype(np.int32).sum(axis=-1)   # [4, L, O]
        self.w2_rs = self.w2_b.astype(np.int32).sum(axis=-1)
        self.w1i_rs = self.w1i_b.astype(np.int32).sum(axis=-1)
        self.w2i_rs = self.w2i_b.astype(np.int32).sum(axis=-1)
        self.tw_mid = tw_mid
        self.tw_mid_i = tw_mid_i
        self.twist = twist.reshape(L, n1, n2)
        self.untwist = untwist.reshape(L, n1, n2)
        self.p = p_arr
        self.pni = pni
        self.cg = cg


def _modmat_rows(wb, w_rs, x, tb, contract_rows: bool):
    """Exact mod-p matmul with byte-decomposed operands.

    contract_rows: out[b,l,o,c] = Σ_k W[l,o,k]·x[b,l,k,c]
    else (cols):   out[b,l,r,o] = Σ_c W[l,o,c]·x[b,l,r,c]
    x: uint32 canonical residues; W given as recentered s8 digits wb
    [4, L, O, K] with row sums w_rs [4, L, O].  Returns uint32 mod p.

    The four W digit planes are stacked into one [L, 4·O, K] operand so
    each x digit needs ONE matmul (4 total instead of 16) — the larger
    output dimension keeps the MXU tiles full; the per-(u,v) partials are
    split back out of the stacked rows for the digit-weight grouping.
    """
    O, K = wb.shape[-2], wb.shape[-1]
    p = tb.p.reshape(tb.L, 1, 1)
    pni = tb.pni.reshape(tb.L, 1, 1)
    wstack = jnp.asarray(
        np.ascontiguousarray(np.moveaxis(wb, 0, 1)).reshape(tb.L, 4 * O, K)
    )  # [L, 4v·O, K]
    xi = x.astype(I32)
    groups = [None] * 7
    for u in range(4):
        xu = (((xi >> (8 * u)) & 0xFF) - 128).astype(jnp.int8)
        if contract_rows:
            csum = jnp.sum(xu.astype(I32), axis=-2)        # [B, L, C]
            s8a = jnp.einsum(
                "lok,blkc->bloc", wstack, xu, preferred_element_type=I32
            )  # [B, L, 4v·O, C]
            s8a = s8a.reshape(s8a.shape[:2] + (4, O) + s8a.shape[3:])
        else:
            csum = jnp.sum(xu.astype(I32), axis=-1)        # [B, L, R]
            s8a = jnp.einsum(
                "loc,blrc->blro", wstack, xu, preferred_element_type=I32
            )  # [B, L, R, 4v·O]
            s8a = s8a.reshape(s8a.shape[:3] + (4, O))
        for v in range(4):
            if contract_rows:
                s8 = s8a[:, :, v]
                corr = (
                    128 * csum[:, :, None, :]
                    + 128 * jnp.asarray(w_rs[v])[None, :, :, None]
                )
            else:
                s8 = s8a[..., v, :]
                corr = (
                    128 * csum[:, :, :, None]
                    + 128 * jnp.asarray(w_rs[v])[None, :, None, :]
                )
            s = s8 + corr + np.int32(K * 16384)
            g = u + v
            groups[g] = s if groups[g] is None else groups[g] + s
    out = None
    for g in range(7):
        term = mont_mul(
            groups[g].astype(U32), tb.cg[g].reshape(tb.L, 1, 1), p, pni
        )
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
    g = _modmat_rows(tb.w1_b, tb.w1_rs, b, tb, contract_rows=True)
    h = mont_mul(g, tb.tw_mid[None], p, pni)
    out = _modmat_rows(tb.w2_b, tb.w2_rs, h, tb, contract_rows=False)
    return out.reshape(lead + (L, n))


def intt4(x, tb: Ntt4Tables):
    """Inverse transform, bit-identical to ``NttContext.intt``."""
    lead = x.shape[:-2]
    L, n = x.shape[-2:]
    n1, n2 = tb.n1, tb.n2
    p = tb.p.reshape(L, 1, 1)
    pni = tb.pni.reshape(L, 1, 1)
    yb = x.reshape((-1, L, n1, n2))
    pcol = _modmat_rows(tb.w2i_b, tb.w2i_rs, yb, tb, contract_rows=False)
    q = mont_mul(pcol, tb.tw_mid_i[None], p, pni)
    bb = _modmat_rows(tb.w1i_b, tb.w1i_rs, q, tb, contract_rows=True)
    out = mont_mul(bb, tb.untwist[None], p, pni)
    return out.reshape(lead + (L, n))
