"""RNS bases and base-conversion kernels for the BFV multiply pipeline.

Replaces SEAL's ``util/rns.cpp`` RNSTool (reference dependency surface,
/root/reference/CMakeLists.txt:120-128) with a TPU-first design:

* every limb prime is < 2^31 so residues live in uint32 lanes (mod32.py);
* ``FastBConv`` (Bajard-Eynard-Hasan-Zucca 2016) is an un-corrected CRT
  recombination — it may overshoot by α·Q with α < k.  Where the overshoot
  only shifts an already-scaled value by ≤ k (the t/Q fast floor, the
  {t, γ} decrypt conversion) we use it as-is;
* ``ExactLiftConv`` is the m_tilde-corrected lift (the role of SEAL's
  sm_mrq step): multiply by m_tilde = 2^16 in base q before converting,
  recover α exactly from the residue modulo m_tilde, and subtract α·Q.
  BEHZ multiply *operand* lifts use this — the uncorrected overshoot there
  costs ~2·log2(k+1) invariant-noise bits per ct×ct level, which measurably
  overflowed the tight communication-optimized chains at full bin load
  (1M-4096-com, 256K-4096-com, 1M-11041/5535, 256M-*: caught by
  tools/param_sweep.py on the chip — 100% of dense matches decrypted wrong);
* the conversion back from the auxiliary base after scaling uses the exact
  Shenoy–Kumaresan method through the m_sk channel (last limb of Bsk), since
  overshoot there would alias modulo Q as full-size garbage.

Device layout: residue tensors ``[..., k, N]`` (k limbs, N coefficients),
PLAIN (non-Montgomery) form at the boundaries of every function here; the
Montgomery factors are folded into the precomputed constants.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import numpy as np

from apsu_tpu.core.mod32 import (
    add_mod,
    mont_mul,
    shoup_mul,
    shoup_pair,
    sub_mod,
)
from apsu_tpu.core.ntt import NttContext


def _mont(x: int, p: int) -> int:
    return (x << 32) % p


def _shoup_cols(consts: list[int], primes: list[int]):
    """Per-limb constant columns (c, c') as [k, 1] numpy pairs for
    shoup_mul — the drop-in replacement for a mont-form constant column.
    Constant multiplies by Shoup pairs cost ~half a mont_mul's VPU ops and
    return the same canonical residues (see mod32.shoup_mul)."""
    c = np.array([v % p for v, p in zip(consts, primes)], dtype=np.uint32)
    sh = shoup_pair(c, np.array(primes, dtype=np.uint32))
    k = len(primes)
    return c.reshape(k, 1), sh.reshape(k, 1)


class RnsBase:
    """A prime basis {p_1..p_k} with CRT constants and an NTT context."""

    def __init__(self, primes: Sequence[int], n: int):
        self.primes = [int(p) for p in primes]
        self.k = len(self.primes)
        self.n = n
        self._ntt: NttContext | None = None  # lazy: table build is O(k·N) host work
        self.prod = 1
        for p in self.primes:
            self.prod *= p
        # punctured products and their inverses
        self.phat = [self.prod // p for p in self.primes]
        self.phat_inv = [pow(ph % p, -1, p) for ph, p in zip(self.phat, self.primes)]
        # device constants
        from apsu_tpu.core.mod32 import prime_consts

        c = prime_consts(self.primes)
        # NOTE: constants stay as host numpy arrays; they are baked into the
        # HLO as literals at trace time.  Eagerly-created device arrays
        # captured by jit compile pathologically slowly on the axon backend.
        self.p_d = c.p.reshape(self.k, 1)
        self.pni_d = c.p_neg_inv.reshape(self.k, 1)
        self.r2_d = c.r2.reshape(self.k, 1)
        self.phat_inv_mont_d = np.array(
            [_mont(inv, p) for inv, p in zip(self.phat_inv, self.primes)],
            dtype=np.uint32,
        ).reshape(self.k, 1)
        R = 1 << 32
        self.r1_sh = _shoup_cols([R % p for p in self.primes], self.primes)
        self.rinv_sh = _shoup_cols(
            [pow(R, -1, p) for p in self.primes], self.primes
        )
        self.phat_inv_sh = _shoup_cols(self.phat_inv, self.primes)

    @property
    def ntt(self) -> NttContext:
        if self._ntt is None:
            self._ntt = NttContext(self.primes, self.n)
        return self._ntt

    # -- residue decomposition of big ints (host) ---------------------------
    def decompose(self, x: np.ndarray) -> np.ndarray:
        """Big-int (object) array [..., N] -> residues [..., k, N] uint32."""
        out = np.empty(x.shape[:-1] + (self.k, x.shape[-1]), dtype=np.uint32)
        for i, p in enumerate(self.primes):
            out[..., i, :] = np.vectorize(lambda v, p=p: int(v) % p, otypes=[np.uint64])(
                x
            ).astype(np.uint32)
        return out

    def compose(self, x: np.ndarray) -> np.ndarray:
        """Residues [..., k, N] -> big-int object array [..., N] in [0, prod)."""
        out = np.zeros(x.shape[:-2] + (x.shape[-1],), dtype=object)
        for i, p in enumerate(self.primes):
            coef = self.phat[i] * self.phat_inv[i] % self.prod
            out = out + x[..., i, :].astype(object) * coef
        return out % self.prod

    def to_mont(self, x):
        """x·R mod p — Shoup by the constant R mod p (canonical result,
        identical to mont_mul(x, R²) at ~half the VPU ops)."""
        return shoup_mul(x, *self.r1_sh, self.p_d)

    def from_mont(self, x):
        """x·R^{-1} mod p — Shoup by the constant R^{-1} mod p."""
        return shoup_mul(x, *self.rinv_sh, self.p_d)


class BaseConv:
    """FastBConv from base ``src`` to base ``dst`` (both RnsBase).

    out_j = Σ_i [x_i · p̂_i^{-1}]_{p_i} · [p̂_i]_{d_j}  (mod d_j)

    Represents x + α·(src.prod) for some 0 ≤ α < src.k.
    """

    def __init__(self, src: RnsBase, dst: RnsBase):
        self.src = src
        self.dst = dst
        m = np.zeros((src.k, dst.k), dtype=np.uint32)
        for i, ph in enumerate(src.phat):
            for j, d in enumerate(dst.primes):
                m[i, j] = ph % d
        self.phat_mod_dst = m  # [ks, kd] host numpy (traced as literal)
        self.phat_mod_dst_sh = shoup_pair(
            m, np.array(dst.primes, np.uint32)[None, :]
        )

    def __call__(self, x):
        """x: [..., ks, N] plain residues -> [..., kd, N] plain residues."""
        src, dst = self.src, self.dst
        y = shoup_mul(x, *src.phat_inv_sh, src.p_d)  # [..., ks, N]
        out = jnp.zeros(x.shape[:-2] + (dst.k, x.shape[-1]), dtype=jnp.uint32)
        for i in range(src.k):
            term = shoup_mul(
                y[..., i : i + 1, :],
                self.phat_mod_dst[i].reshape(dst.k, 1),
                self.phat_mod_dst_sh[i].reshape(dst.k, 1),
                dst.p_d,
            )
            out = add_mod(out, term, dst.p_d)
        return out


class ExactLiftConv:
    """m_tilde-corrected base conversion — the role of SEAL's sm_mrq step
    (seal/util/rns.cpp RNSTool, reference dependency surface): lifts
    x ∈ [0, Q) into dst as x + u·Q with u ∈ {−1, 0}, versus FastBConv's
    0 ≤ α < k overshoot.  Operand magnitude stays < Q, so the BEHZ tensor
    fits 2·N·Q² and per-multiply noise matches SEAL's analysis.

    With m̃ = 2^16:  c_i = [m̃·x·p̂_i^{-1}]_{p_i}  make the conv integer
    y = Σ_i c_i·p̂_i = m̃·x + (α−β)·Q  where 0 ≤ α < k is the FastBConv
    overshoot and β = ⌊m̃·x/Q⌋ < m̃.  The centered correction
    r = [−y·Q^{-1}]_{m̃} ∈ [−m̃/2, m̃/2) makes α−β+r ∈ {−m̃, 0}, so each
    dst residue (y + r·Q)·m̃^{-1} represents x or x−Q.

    The m̃ channel needs no NTT and no Montgomery machinery: products of
    16-bit values are exact in uint32 and reduction mod 2^16 is a mask.
    """

    def __init__(self, src: RnsBase, dst: RnsBase):
        mt = 1 << 16
        self.src = src
        self.dst = dst
        Q = src.prod
        # fold the m_tilde prescale into the phat_inv multiply:
        # c_i = [x · (m̃·p̂_i^{-1} mod p_i)]_{p_i}
        self.mt_phat_inv_sh = _shoup_cols(
            [mt * inv % p for inv, p in zip(src.phat_inv, src.primes)],
            src.primes,
        )
        m = np.zeros((src.k, dst.k), dtype=np.uint32)
        for i, ph in enumerate(src.phat):
            for j, d in enumerate(dst.primes):
                m[i, j] = ph % d
        self.phat_mod_dst = m
        self.phat_mod_dst_sh = shoup_pair(
            m, np.array(dst.primes, np.uint32)[None, :]
        )
        self.phat_mod_mt = np.array(
            [ph % mt for ph in src.phat], dtype=np.uint32
        )  # [ks]
        self.q_inv_mt = np.uint32(pow(Q % mt, -1, mt))
        self.mtinv_sh = _shoup_cols(
            [pow(mt, -1, d) for d in dst.primes], dst.primes
        )
        self.q_mtinv_sh = _shoup_cols(
            [Q % d * pow(mt, -1, d) % d for d in dst.primes], dst.primes
        )

    def __call__(self, x):
        """x: [..., ks, N] plain residues mod src -> [..., kd, N] plain
        residues of x + u·Q, u ∈ {−1, 0}."""
        src, dst = self.src, self.dst
        c = shoup_mul(x, *self.mt_phat_inv_sh, src.p_d)
        out = jnp.zeros(x.shape[:-2] + (dst.k, x.shape[-1]), dtype=jnp.uint32)
        c16 = jnp.zeros(x.shape[:-2] + (1, x.shape[-1]), dtype=jnp.uint32)
        mask16 = jnp.uint32(0xFFFF)
        for i in range(src.k):
            term = shoup_mul(
                c[..., i : i + 1, :],
                self.phat_mod_dst[i].reshape(dst.k, 1),
                self.phat_mod_dst_sh[i].reshape(dst.k, 1),
                dst.p_d,
            )
            out = add_mod(out, term, dst.p_d)
            c16 = c16 + (c[..., i : i + 1, :] & mask16) * jnp.uint32(
                self.phat_mod_mt[i]
            )
        # r = [−y·Q^{-1}]_{m̃}, centered into [−m̃/2, m̃/2)
        s = ((c16 & mask16) * self.q_inv_mt) & mask16  # [y·Q^{-1}]_{m̃}
        r = (jnp.uint32(1 << 16) - s) & mask16  # [−y·Q^{-1}]_{m̃} in [0, m̃)
        neg = r >= jnp.uint32(1 << 15)
        r_abs = jnp.where(neg, jnp.uint32(1 << 16) - r, r)  # [..., 1, N]
        a1 = shoup_mul(out, *self.mtinv_sh, dst.p_d)
        corr = shoup_mul(r_abs, *self.q_mtinv_sh, dst.p_d)
        return jnp.where(
            neg,
            sub_mod(a1, corr, dst.p_d),
            add_mod(a1, corr, dst.p_d),
        )


class ShenoyKumaresanConv:
    """Exact conversion from Bsk = B ∪ {m_sk} back to q.

    B = first m-1 limbs of bsk, m_sk = last limb.  Given y < prod(B)/2·λ
    (λ small) represented in Bsk, recovers y mod q exactly:

      ŷ_q   = FastBConv(y_B, B → q)        (= y + α·prod(B) mod q)
      ŷ_sk  = FastBConv(y_B, B → m_sk)
      α     = [(ŷ_sk − y_sk) · prod(B)^{-1}]_{m_sk}   (centered)
      out_q = ŷ_q − α·[prod(B)]_q
    """

    def __init__(self, bsk: RnsBase, q: RnsBase, n: int):
        self.bsk = bsk
        self.q = q
        b_primes = bsk.primes[:-1]
        self.m_sk = bsk.primes[-1]
        self.B = RnsBase(b_primes, n)
        self.conv_b_to_q = BaseConv(self.B, q)
        self.conv_b_to_sk = BaseConv(self.B, RnsBase([self.m_sk], n))
        msk = self.m_sk
        self.prodB_inv_sk_sh = _shoup_cols(
            [pow(self.B.prod % msk, -1, msk)], [msk]
        )
        self.msk_d = np.array([msk], dtype=np.uint32).reshape(1, 1)
        self.prodB_mod_q_sh = _shoup_cols(
            [self.B.prod % p for p in q.primes], q.primes
        )
        self.msk_half = (self.m_sk + 1) // 2

    def __call__(self, y):
        """y: [..., kb+1, N] plain residues in Bsk -> [..., kq, N] mod q."""
        y_b = y[..., :-1, :]
        y_sk = y[..., -1:, :]
        yhat_q = self.conv_b_to_q(y_b)                      # [..., kq, N]
        yhat_sk = self.conv_b_to_sk(y_b)                    # [..., 1, N]
        diff = sub_mod(yhat_sk, y_sk, self.msk_d)
        alpha = shoup_mul(diff, *self.prodB_inv_sk_sh, self.msk_d)
        # alpha is centered: values >= msk/2 represent alpha - m_sk (negative)
        neg = alpha >= jnp.uint32(self.msk_half)
        alpha_abs = jnp.where(neg, self.msk_d - alpha, alpha)  # [..., 1, N]
        # out = yhat_q -/+ alpha_abs * prodB mod q  (alpha < m_sk may exceed
        # q_j, which is fine — shoup_mul admits any uint32 variable operand)
        q = self.q
        term = shoup_mul(alpha_abs, *self.prodB_mod_q_sh, q.p_d)  # plain
        out_minus = sub_mod(yhat_q, term, q.p_d)
        out_plus = add_mod(yhat_q, term, q.p_d)
        return jnp.where(neg, out_plus, out_minus)


class ExactDiv:
    """Exact floor division of an RNS integer by one of its own moduli — the
    mod-down primitive for key-switching (÷ special prime) and mod-switch
    (÷ dropped data prime).

    Given x mod (q ∪ {d}) with residue x_d of the divisor limb:
      floor(x/d) mod q_j = (x_j − [x_d]_{q_j}) · d^{-1} mod q_j
    (exact because x − x_d ≡ 0 mod d). Optional +d/2 pre-add gives
    round-to-nearest.
    """

    def __init__(self, q: RnsBase, d: int, round_nearest: bool = True):
        self.q = q
        self.d = int(d)
        self.round_nearest = round_nearest
        self.d_inv_sh = _shoup_cols(
            [pow(self.d % p, -1, p) for p in q.primes], q.primes
        )
        half = self.d >> 1
        self.half_mod_q = np.array(
            [half % p for p in q.primes], dtype=np.uint32
        ).reshape(q.k, 1)
        self.half = np.uint32(half)
        self.d_d = np.uint32(self.d)
        self.one_sh = _shoup_cols([1] * q.k, q.primes)

    def __call__(self, x_q, x_d):
        """x_q: [..., kq, N] residues mod q; x_d: [..., 1, N] residue mod d."""
        q = self.q
        if self.round_nearest:
            x_q = add_mod(x_q, self.half_mod_q, q.p_d)
            s = x_d + self.half  # < 2^31 + 2^30, no overflow
            x_d = jnp.where(s >= self.d_d, s - self.d_d, s)
        # reduce x_d (integer < d < 2^31) modulo each q_j: Shoup by the
        # constant 1 reduces ANY uint32 mod p in one lazy product
        xd_q = shoup_mul(x_d, *self.one_sh, q.p_d)
        num = sub_mod(x_q, xd_q, q.p_d)
        return shoup_mul(num, *self.d_inv_sh, q.p_d)
