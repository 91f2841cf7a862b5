"""BFV on TPU: batch encoding, symmetric encryption, homomorphic ops.

A from-scratch RNS-BFV built for the uint32 TPU datapath (replaces the
reference's use of Microsoft SEAL — see /root/reference/common/apsu/
crypto_context.h:28 for the surface the protocol needs: BatchEncoder,
symmetric-key Encryptor, Decryptor, Evaluator with multiply/square/
relinearize/multiply_plain/add/mod-switch/NTT transforms).

Design notes
------------
* Ciphertext component tensors are ``[n_components, L, N]`` uint32.  In
  coefficient domain they hold PLAIN residues; in NTT domain they hold
  Montgomery-form residues (so ⊙ is a single mont_mul).  ``Ciphertext.is_ntt``
  tracks which.
* ct×ct multiply is BEHZ-style RNS: FastBConv into an auxiliary NTT-friendly
  base Bsk (overshoot α·Q folds into negligible noise — see rns.py), tensor
  in NTT domain over q ∪ Bsk, scale by t/q with a fast floor, exact
  Shenoy–Kumaresan conversion back to q.
* Relinearization is RNS-gadget key switching with per-limb digits and a
  single ≤30-bit special prime P (SEAL convention).  Both multiply and
  relinearization are LEVELED: full-level keys restrict exactly to any level
  prefix, and each level gets its own right-sized auxiliary base.
* Decryption is device-resident (BEHZ {t, γ} scale-and-round,
  ``decrypt_device``); a host big-int CRT path (``decrypt``) remains as the
  golden reference for tests.

Security parameters (σ=3.2 ternary secret) follow the reference's SEAL
``tc128`` configuration (crypto_context.h:33-34).
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass, replace
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from apsu_tpu.core import nt
from apsu_tpu.core.mod32 import (
    add_mod,
    mont_mul,
    neg_mod,
    shoup_mul,
    shoup_pair,
    sub_mod,
)
from apsu_tpu.core.params import SealParams
from apsu_tpu.core.rns import (
    BaseConv,
    ExactDiv,
    ExactLiftConv,
    RnsBase,
    ShenoyKumaresanConv,
)

NOISE_STDDEV = 3.2  # SEAL default error stddev


def _msum_tensor(base: RnsBase, fa, fb, m_terms: int):
    """Σ_m tensor(fa[m], fb[m]) in one RNS base's NTT-Montgomery domain,
    INTT'd back to plain coeff residues [..., 3, Lb, N].  fa, fb:
    [..., M, 2, Lb, N] NTT mont.  Shared by multiply_sum and the fused
    PS variant (bit-identity between the two paths)."""
    c0 = mont_mul(fa[..., 0, :, :], fb[..., 0, :, :], base.p_d, base.pni_d)
    c2 = mont_mul(fa[..., 1, :, :], fb[..., 1, :, :], base.p_d, base.pni_d)
    c1 = add_mod(
        mont_mul(fa[..., 0, :, :], fb[..., 1, :, :], base.p_d, base.pni_d),
        mont_mul(fa[..., 1, :, :], fb[..., 0, :, :], base.p_d, base.pni_d),
        base.p_d,
    )
    f = jnp.stack([c0, c1, c2], axis=-3)  # [..., M, 3, Lb, N]

    def red(m, acc):
        return add_mod(
            acc,
            jax.lax.dynamic_index_in_dim(f, m, axis=-4, keepdims=False),
            base.p_d,
        )

    s = jax.lax.fori_loop(1, m_terms, red, f[..., 0, :, :, :])
    return base.from_mont(base.ntt.intt(s))


def _mont(x: int, p: int) -> int:
    return (x << 32) % p


def _shoup_cols(consts, primes):
    """Per-limb constant columns (c, c') as [k, 1] pairs for shoup_mul."""
    c = np.array([v % p for v, p in zip(consts, primes)], dtype=np.uint32)
    sh = shoup_pair(c, np.array(primes, dtype=np.uint32))
    k = len(primes)
    return c.reshape(k, 1), sh.reshape(k, 1)


def uniform_from_seed(seed: bytes, base: RnsBase, shape_lead=()) -> np.ndarray:
    """Deterministic uniform residues [..., k, N] from a public 32-byte seed
    (AES-256-CTR expansion, identical on both parties).

    This is the seed-compression channel of SEAL's Serializable symmetric
    ciphertexts (/root/reference/common/apsu/seal_object.h:1-226): the
    uniform ``a`` component of a fresh symmetric ct — and the ``a_i`` rows of
    relinearization keys — travel as the PRG seed instead of full residue
    tensors, halving those payloads."""
    from apsu_tpu.mpc.prg import prg_bytes

    shape = tuple(shape_lead) + (base.k, base.n)
    total = int(np.prod(shape))
    u = prg_bytes(seed, 8 * total).view(np.uint64).reshape(shape)
    out = np.empty(shape, np.uint32)
    for i, p in enumerate(base.primes):
        out[..., i, :] = (u[..., i, :] % np.uint64(p)).astype(np.uint32)
    return out


@dataclass
class Ciphertext:
    data: jnp.ndarray  # [..., k, L, N] uint32 (k components, optional batch)
    is_ntt: bool       # True: NTT domain, Montgomery form; False: coeff, plain
    level: int         # number of active data limbs (prefix of q chain)

    @property
    def size(self) -> int:
        return self.data.shape[-3]


class SecretKey:
    """Ternary secret with device-side NTT caches per base."""

    def __init__(self, coeffs: np.ndarray, ctx: "BfvContext"):
        self.coeffs = coeffs  # int8 in {-1,0,1}, [N]
        self._ntt_cache = {}
        self._ctx = ctx

    def ntt_mont(self, base: RnsBase) -> jnp.ndarray:
        key = id(base)
        if key not in self._ntt_cache:
            res = np.zeros((base.k, base.n), dtype=np.uint32)
            s64 = self.coeffs.astype(np.int64)
            for i, p in enumerate(base.primes):
                res[i] = np.where(s64 >= 0, s64, s64 + p).astype(np.uint32)
            f = self._ctx._jitted(
                ("sk_ntt", tuple(base.primes)),
                lambda x: base.ntt.ntt(base.to_mont(x)),
            )
            self._ntt_cache[key] = f(jnp.asarray(res))
        return self._ntt_cache[key]


class RelinKey:
    """RNS-gadget key-switching keys for s² → s (one digit per data limb)."""

    def __init__(self, ksk: jnp.ndarray, level: int):
        # ksk: [n_digits, 2, L_qp, N] NTT-domain Montgomery form
        self.ksk = ksk
        self.level = level


class BfvContext:
    def __init__(self, sp: SealParams):
        self.sp = sp
        self.n = sp.poly_modulus_degree
        self.t = sp.plain_modulus
        self.q_primes = list(sp.data_modulus)
        self.special = sp.special_modulus
        n = self.n

        self.q = RnsBase(self.q_primes, n)
        self.Q = self.q.prod
        self.delta = self.Q // self.t
        self.t_base = RnsBase([self.t], n)

        # per-level bases for mod-switch (level L = first L primes)
        self.levels: List[RnsBase] = [None] * (len(self.q_primes) + 1)
        self.levels[len(self.q_primes)] = self.q
        for lvl in range(1, len(self.q_primes)):
            self.levels[lvl] = RnsBase(self.q_primes[:lvl], n)

        # key base (q + special prime) and relin machinery
        if self.special is not None:
            self.qp = RnsBase(self.q_primes + [self.special], n)
            self.div_p = ExactDiv(self.q, self.special, round_nearest=True)
        else:
            self.qp = None
            self.div_p = None

        # Bsk: enough ≤30-bit NTT primes to hold floor(t·|tensor|/Q) exactly,
        # |tensor| < 2·N·Q² (operands lifted exactly via ExactLiftConv)
        k = self.q.k
        self._mul_ctx_cache = {}
        mc = self._mul_ctx(k)
        self.bsk = mc["bsk"]
        self.conv_q_to_bsk = mc["conv"]
        self.sk_conv = mc["sk_conv"]

        # mod-switch dividers: drop limb j+1 -> level j
        self.div_drop: List[Optional[ExactDiv]] = [None] * (len(self.q_primes) + 1)
        for lvl in range(1, len(self.q_primes)):
            self.div_drop[lvl + 1] = ExactDiv(
                self.levels[lvl], self.q_primes[lvl], round_nearest=True
            )

        # cache of jitted device kernels (eager dispatch over the TPU tunnel
        # costs ~10 ms per op — everything device-side must run under jit)
        self._jit_cache = {}

    @property
    def _bsk_bits(self) -> int:
        """Bsk prime width, captured ONCE per context (ADVICE r3: a
        mid-process APSU_BSK_BITS change must not return stale _mul_ctx
        entries keyed without the width).  Validated: widths ≥ 31 exceed
        mod32's < 2^31 prime support and widths outside [20, 30] are
        untested against the lazy Shoup/Montgomery bounds."""
        if not hasattr(self, "_bsk_bits_val"):
            width = int(os.environ.get("APSU_BSK_BITS", "28"))
            assert 20 <= width <= 30, (
                f"APSU_BSK_BITS={width} outside the supported prime width "
                f"range [20, 30] (mod32 needs primes < 2^31; narrower than "
                f"20 is untested against the lazy-reduction bounds)"
            )
            self._bsk_bits_val = width
        return self._bsk_bits_val

    def _jitted(self, key, fn):
        if key not in self._jit_cache:
            self._jit_cache[key] = jax.jit(fn)
        return self._jit_cache[key]

    def _mul_ctx(self, level: int, extra_bits: int = 0):
        """Per-level BEHZ multiply machinery (Bsk base sized to Q_level).

        ``extra_bits`` widens the auxiliary base for tensor-domain
        accumulation (``multiply_sum``): summing M products before the
        scale-down grows |tensor| by M, i.e. ceil(log2 M) bits."""
        key = level if extra_bits == 0 else (level, extra_bits)
        if key not in self._mul_ctx_cache:
            base = self.levels[level]
            n = self.n
            # operands are lifted EXACTLY (ExactLiftConv, no α·Q overshoot),
            # so the tensor is < 2·N·Q² and the scaled value < 2·N·t·Q + k
            need_bits = (
                base.prod.bit_length()
                + math.ceil(math.log2(n))
                + self.t.bit_length()
                + 4
                + extra_bits
            )
            # Bsk prime width (APSU_BSK_BITS).  Default 28: every Bsk
            # transform rides the fused four-step MXU Pallas kernel
            # (<2^28 precondition) instead of the staged XLA butterflies.
            # History: 28 measured WORSE in round 3 (the single-row ntt4p
            # grid lost at the ~9.4k-plane fa_b shape); the round-4
            # rb-batched grid reversed that — tools/wavefront_ab.py on
            # chip 2026-08-20: warm query 175.5 ms @28 vs 181.6 @30, and
            # the all-Pallas program compiles 4-10x faster (82 s vs
            # 13-30 min for the powers program: the staged-XLA stage
            # unrolling was the compile hog).  Correctness is width-independent
            # (BEHZ computes the exact floor(t·x/Q) for ANY aux base whose
            # capacity covers the tensor bound, which the loop below
            # verifies against the actual generated primes).
            width = self._bsk_bits  # validated, captured once per context
            nb = max(level, math.ceil(need_bits / width)) + 1  # +1 = m_sk
            exclude = self.q_primes + [self.t] + (
                [self.special] if self.special else []
            )
            while True:
                primes = nt.gen_ntt_primes([width] * nb, 2 * n, exclude=exclude)
                b_prod = math.prod(primes[:-1])
                if b_prod.bit_length() > need_bits:  # prod(B) covers the bound
                    break
                nb += 1
            bsk = RnsBase(primes, n)
            self._mul_ctx_cache[key] = {
                "bsk": bsk,
                "conv": BaseConv(base, bsk),
                "lift": ExactLiftConv(base, bsk),
                "sk_conv": ShenoyKumaresanConv(bsk, base, n),
                "t_sh_q": _shoup_cols([self.t] * base.k, base.primes),
                "t_sh_bsk": _shoup_cols([self.t] * bsk.k, bsk.primes),
                "qinv_sh_bsk": _shoup_cols(
                    [pow(base.prod % p, -1, p) for p in bsk.primes],
                    bsk.primes,
                ),
            }
        return self._mul_ctx_cache[key]

    def _qp_level(self, level: int):
        """Key base Q_level · P for leveled key switching (lazy)."""
        if level == self.q.k:
            return self.qp
        key = ("qp", level)
        if key not in self._mul_ctx_cache:
            self._mul_ctx_cache[key] = RnsBase(
                self.q_primes[:level] + [self.special], self.n
            )
        return self._mul_ctx_cache[key]

    def _div_p_level(self, level: int):
        if level == self.q.k:
            return self.div_p
        key = ("div_p", level)
        if key not in self._mul_ctx_cache:
            self._mul_ctx_cache[key] = ExactDiv(
                self.levels[level], self.special, round_nearest=True
            )
        return self._mul_ctx_cache[key]

    # ------------------------------------------------------------------
    # batch encoding (CRT slot packing mod t)
    # ------------------------------------------------------------------
    def encode(self, values) -> jnp.ndarray:
        """Slot values [..., N] uint32 < t  ->  plaintext poly [..., N] plain."""

        def impl(x):
            pm = self.t_base.to_mont(x[..., None, :])
            return self.t_base.from_mont(self.t_base.ntt.intt(pm))[..., 0, :]

        return self._jitted("encode", impl)(jnp.asarray(values, jnp.uint32))

    def decode(self, poly) -> jnp.ndarray:
        def impl(x):
            vm = self.t_base.ntt.ntt(self.t_base.to_mont(x[..., None, :]))
            return self.t_base.from_mont(vm)[..., 0, :]

        return self._jitted("decode", impl)(jnp.asarray(poly, jnp.uint32))

    # ------------------------------------------------------------------
    # key generation (device-assisted)
    # ------------------------------------------------------------------
    def gen_secret_key(self, rng: np.random.Generator) -> SecretKey:
        s = rng.integers(-1, 2, size=self.n).astype(np.int8)
        return SecretKey(s, self)

    def _sample_error(self, rng: np.random.Generator, base: RnsBase, shape_lead=()):
        e = np.rint(rng.normal(0.0, NOISE_STDDEV, size=shape_lead + (self.n,))).astype(
            np.int64
        )
        out = np.zeros(shape_lead + (base.k, self.n), dtype=np.uint32)
        for i, p in enumerate(base.primes):
            out[..., i, :] = np.mod(e, p).astype(np.uint32)
        return jnp.asarray(out)

    def _sample_uniform(self, rng: np.random.Generator, base: RnsBase, shape_lead=()):
        out = np.zeros(shape_lead + (base.k, self.n), dtype=np.uint32)
        for i, p in enumerate(base.primes):
            out[..., i, :] = rng.integers(0, p, size=shape_lead + (self.n,), dtype=np.uint64)
        return jnp.asarray(out)

    def gen_relin_key(
        self,
        sk: SecretKey,
        rng: np.random.Generator,
        a_seed: Optional[bytes] = None,
        level: Optional[int] = None,
    ) -> RelinKey:
        """ksk_i = (-(a_i·s + e_i) + P·g_i·s², a_i) mod Q_l·P, NTT/Montgomery.

        g_i = q̂_i·[q̂_i^{-1}]_{q_i} (integer CRT basis element of Q_level).
        a_seed: expand the public a_i rows from this seed so the key travels
        seed-compressed (relin_key_from_seed reconstructs peer-side).
        level: generate over a REDUCED chain prefix Q_level·P — the key then
        serves any relinearization at ct level ≤ level (the CRT basis
        restricts exactly, see relinearize), with (k-level) fewer digit rows
        AND limb columns on the wire.
        """
        if self.qp is None:
            raise ValueError("no special prime: relinearization unavailable")
        lvl = level if level is not None else self.q.k
        base = self.levels[lvl]
        qp = self._qp_level(lvl)
        P = self.special
        pg_monts = []
        for i in range(lvl):
            g = base.phat[i] * base.phat_inv[i]  # integer < Q_l
            pg_monts.append(
                np.array([_mont(P * g % p, p) for p in qp.primes], dtype=np.uint32)
            )
        pg_mont = np.stack(pg_monts)[:, :, None]  # [kdig, kqp, 1] host numpy
        if a_seed is not None:
            a = jnp.asarray(uniform_from_seed(a_seed, qp, (lvl,)))
        else:
            a = self._sample_uniform(rng, qp, shape_lead=(lvl,))  # plain coeff
        e = self._sample_error(rng, qp, shape_lead=(lvl,))

        def impl(s_ntt, a, e):
            s2_ntt = mont_mul(s_ntt, s_ntt, qp.p_d, qp.pni_d)
            a_ntt = qp.ntt.ntt(qp.to_mont(a))
            as_ntt = mont_mul(a_ntt, s_ntt, qp.p_d, qp.pni_d)
            e_ntt = qp.ntt.ntt(qp.to_mont(e))
            k0 = add_mod(
                neg_mod(add_mod(as_ntt, e_ntt, qp.p_d), qp.p_d),
                mont_mul(s2_ntt, pg_mont, qp.p_d, qp.pni_d),
                qp.p_d,
            )
            return jnp.stack([k0, a_ntt], axis=1)  # [kdig, 2, kqp, N]

        ksk = self._jitted(("gen_relin_key", lvl), impl)(sk.ntt_mont(qp), a, e)
        return RelinKey(ksk, level=lvl)

    def relin_key_from_seed(
        self, k0, a_seed: bytes, level: Optional[int] = None
    ) -> RelinKey:
        """Rebuild a seed-compressed relin key: k0 = ksk[:, 0] rows
        [kdig, Lqp, N] NTT/mont + the public seed of the a_i rows."""
        lvl = level if level is not None else self.q.k
        qp = self._qp_level(lvl)
        a = uniform_from_seed(a_seed, qp, (lvl,))
        f = self._jitted(
            ("rk_expand", lvl),
            lambda k0, a: jnp.stack([k0, qp.ntt.ntt(qp.to_mont(a))], axis=1),
        )
        return RelinKey(f(jnp.asarray(k0), jnp.asarray(a)), level=lvl)

    # ------------------------------------------------------------------
    # encrypt / decrypt
    # ------------------------------------------------------------------
    def encrypt_symmetric(
        self,
        pt_poly,
        sk: SecretKey,
        rng: np.random.Generator,
        a_seed: Optional[bytes] = None,
        level: Optional[int] = None,
    ) -> Ciphertext:
        """pt_poly: [..., N] plaintext polynomial(s) mod t. Fresh symmetric ct.

        Batched: leading dims of pt_poly produce a batch of ciphertexts with
        data shape [..., 2, L, N].  a_seed: derive the uniform a component
        from this public seed (seed-compressed symmetric ciphertext — the
        wire then carries c0 + seed; ct_from_seed reconstructs peer-side).
        level: encrypt directly at a REDUCED chain level (fewer limbs):
        smaller upload and cheaper downstream ops at the same security
        (smaller modulus, same N) — the per-parameter-set choice is
        measured, not assumed (db/measured_levels.py "query" knob).
        """
        lvl = level if level is not None else self.q.k
        q = self.levels[lvl]
        pt = jnp.asarray(pt_poly, jnp.uint32)
        lead = pt.shape[:-1]
        if a_seed is not None:
            a = jnp.asarray(uniform_from_seed(a_seed, q, lead))
        else:
            a = self._sample_uniform(rng, q, shape_lead=lead)
        e = self._sample_error(rng, q, shape_lead=lead)

        def impl(pt, a, e, s_ntt):
            a_ntt = q.ntt.ntt(q.to_mont(a))
            as_coeff = q.from_mont(
                q.ntt.intt(mont_mul(a_ntt, s_ntt, q.p_d, q.pni_d))
            )
            dm = self._scale_impl(pt, lvl)  # round(Q_l·m/t) mod q_i (plain)
            c0 = add_mod(neg_mod(add_mod(as_coeff, e, q.p_d), q.p_d), dm, q.p_d)
            return jnp.stack([c0, a], axis=-3)

        data = self._jitted(("encrypt", lvl), impl)(pt, a, e, sk.ntt_mont(q))
        return Ciphertext(data, is_ntt=False, level=lvl)

    def ct_from_seed(
        self, c0: np.ndarray, a_seed: bytes, level: Optional[int] = None
    ) -> Ciphertext:
        """Reconstruct seed-compressed fresh symmetric ciphertexts:
        c0 [..., L, N] plain coeff residues + the public a seed."""
        lvl = level if level is not None else self.q.k
        a = uniform_from_seed(a_seed, self.levels[lvl], tuple(c0.shape[:-2]))
        data = np.stack([np.asarray(c0), a], axis=-3)  # [..., 2, L, N]
        return Ciphertext(jnp.asarray(data), is_ntt=False, level=lvl)

    def decrypt_device(self, ct: Ciphertext, sk: SecretKey) -> jnp.ndarray:
        """Fully device-resident decryption via the BEHZ {t, γ} scale-and-
        round (the reference's SEAL decrypt path): m = round(t·x/Q) mod t
        computed from RNS residues with a small auxiliary modulus γ — no
        host big-int CRT.  Returns plaintext polys [..., N] on device."""
        x = self._dot_with_secret(ct, sk)  # [..., L, N] plain coeff
        lvl = ct.level
        base = self.levels[lvl]
        t = self.t
        gamma = self._gamma
        key = ("behz_decrypt", lvl)

        def impl(x):
            Ql = base.prod
            # y_j = [x_j · γ·t·(Q/q_j)^{-1}]_{q_j}
            A_sh = _shoup_cols(
                [
                    gamma * t % p * base.phat_inv[j] % p
                    for j, p in enumerate(base.primes)
                ],
                base.primes,
            )
            y = shoup_mul(x, *A_sh, base.p_d)  # plain, [..., L, N]

            # FastBConv of γ·t·x mod Q into {t, γ} (+ αQ overshoot, absorbed
            # by the γ-centering below)
            def conv_to(m):
                mm = np.uint32(m)
                acc = jnp.zeros(x.shape[:-2] + (x.shape[-1],), jnp.uint32)
                for j, p in enumerate(base.primes):
                    cj = np.uint32(base.phat[j] % m)
                    cj_sh = np.uint32(shoup_pair(cj, mm))
                    acc_j = shoup_mul(y[..., j, :], cj, cj_sh, mm)
                    acc = add_mod(acc, acc_j, mm)
                return acc, mm

            r_t, t_d = conv_to(t)
            r_g, g_d = conv_to(gamma)

            def smul(x, c, m):
                return shoup_mul(
                    x, np.uint32(c), np.uint32(shoup_pair(c, m)), np.uint32(m)
                )

            v_t = smul(r_t, (-pow(Ql % t, -1, t)) % t, t)
            v_g = smul(r_g, (-pow(Ql % gamma, -1, gamma)) % gamma, gamma)

            # center v_γ and fold: m = (v_t − ρ)·γ^{-1} mod t
            half_g = np.uint32(gamma >> 1)
            neg = v_g > half_g
            rho_pos = v_g              # ρ when positive (< γ/2)
            rho_neg = g_d - v_g        # |ρ| when negative
            # reduce |ρ| (< γ < 2^31) mod t: Shoup by the constant 1
            red = lambda v: smul(v, 1, t)
            diff = jnp.where(
                neg,
                add_mod(v_t, red(rho_neg), t_d),
                sub_mod(v_t, red(rho_pos), t_d),
            )
            return smul(diff, pow(gamma % t, -1, t), t)

        return self._jitted(key, impl)(x)

    @property
    def _gamma(self) -> int:
        """Auxiliary decryption modulus γ: coprime to t and every q_j,
        ~2^29 (need γ ≫ 2·k to absorb conversion overshoot)."""
        if not hasattr(self, "_gamma_val"):
            g = (1 << 29) - 1
            while True:
                if nt.is_prime(g) and g != self.t and g not in self.q_primes:
                    break
                g -= 2
            self._gamma_val = g
        return self._gamma_val

    def decrypt(self, ct: Ciphertext, sk: SecretKey) -> np.ndarray:
        """Returns the plaintext polynomial(s) mod t (host numpy, [..., N])."""
        x = jax.device_get(self._dot_with_secret(ct, sk))  # [..., L, N] plain coeff
        base = self.levels[ct.level]
        big = base.compose(x)  # object ints in [0, prod), [..., N]
        Ql = base.prod
        half, t = Ql // 2, self.t
        flat = big.reshape(-1)
        out = np.empty(flat.shape, dtype=np.uint64)
        for i in range(flat.shape[0]):
            out[i] = ((int(flat[i]) * t + half) // Ql) % t
        return out.reshape(big.shape).astype(np.uint32)

    def _dot_with_secret(self, ct: Ciphertext, sk: SecretKey):
        base = self.levels[ct.level]
        size = ct.size

        def impl(data, s_ntt):
            if not ct.is_ntt:
                data = base.ntt.ntt(base.to_mont(data))
            acc = data[..., 0, :, :]
            spow = s_ntt
            for i in range(1, size):
                acc = add_mod(
                    acc,
                    mont_mul(data[..., i, :, :], spow, base.p_d, base.pni_d),
                    base.p_d,
                )
                if i + 1 < size:
                    spow = mont_mul(spow, s_ntt, base.p_d, base.pni_d)
            return base.from_mont(base.ntt.intt(acc))

        return self._jitted(("dot_secret", size, ct.level, ct.is_ntt), impl)(
            ct.data, sk.ntt_mont(base)
        )

    def noise_budget(self, ct: Ciphertext, sk: SecretKey) -> float:
        """Bits of invariant-noise budget remaining (SEAL semantics)."""
        x = jax.device_get(self._dot_with_secret(ct, sk))
        base = self.levels[ct.level]
        big = base.compose(x)
        Ql = base.prod
        max_frac = 0
        for v in big.reshape(-1):
            tx = int(v) * self.t
            frac = tx - (tx + Ql // 2) // Ql * Ql  # centered remainder of tx mod Ql
            max_frac = max(max_frac, abs(frac))
        if max_frac == 0:
            return float(Ql.bit_length())
        return max(0.0, math.log2(Ql) - 1.0 - math.log2(max_frac))

    # ------------------------------------------------------------------
    # homomorphic ops
    # ------------------------------------------------------------------
    def _base(self, ct: Ciphertext) -> RnsBase:
        return self.levels[ct.level]

    def to_ntt(self, ct: Ciphertext) -> Ciphertext:
        if ct.is_ntt:
            return ct
        base = self._base(ct)
        f = self._jitted(("to_ntt", ct.level), lambda x: base.ntt.ntt(base.to_mont(x)))
        return replace(ct, data=f(ct.data), is_ntt=True)

    def from_ntt(self, ct: Ciphertext) -> Ciphertext:
        if not ct.is_ntt:
            return ct
        base = self._base(ct)
        f = self._jitted(
            ("from_ntt", ct.level), lambda x: base.from_mont(base.ntt.intt(x))
        )
        return replace(ct, data=f(ct.data), is_ntt=False)

    def add(self, a: Ciphertext, b: Ciphertext) -> Ciphertext:
        assert a.is_ntt == b.is_ntt and a.level == b.level
        base = self._base(a)
        f = self._jitted(("add", a.level), lambda x, y: add_mod(x, y, base.p_d))
        return replace(a, data=f(a.data, b.data))

    def scale_plain(self, pt, level: int):
        """round(Q_l·m/t) mod q_j for plaintext m [..., N] — SEAL's
        add-plain-with-scaling variant, done RNS-style.

        Scaling by ⌊Q/t⌋ would add (Q mod t)·m/Q ≈ 2^-16 invariant noise per
        coefficient — catastrophic for tight parameter sets.  Exact rounding
        is free in RNS because Q ≡ 0 (mod q_j):
            round(Q·m/t) = (Q·m + h − rem)/t,  rem = (r·m + h) mod t,
            ≡ (h − rem)·t^{-1}  (mod q_j),     r = Q mod t, h = t>>1.
        Returns plain residues [..., L, N].
        """
        base = self.levels[level]
        t = self.t
        r = base.prod % t
        h = t >> 1
        return self._jitted(("scale_plain", level), lambda m: self._scale_impl(m, level))(
            jnp.asarray(pt, jnp.uint32)
        )

    def _scale_impl(self, m, level: int):
        """Traced body of scale_plain (callable inside other jitted kernels)."""
        base = self.levels[level]
        t = self.t
        r = base.prod % t
        h = t >> 1
        tc = self.t_base
        m1 = m[..., None, :]  # [..., 1, N] for mod-t broadcasting
        r_c, r_sh = _shoup_cols([r], [t])
        rm = shoup_mul(m1, np.uint32(r_c[0, 0]), np.uint32(r_sh[0, 0]), tc.p_d)
        rem = add_mod(rm, np.uint32(h), tc.p_d)      # [..., 1, N] < t
        hq = np.array([h % p for p in base.primes], dtype=np.uint32).reshape(base.k, 1)
        tinv_sh = _shoup_cols(
            [pow(t % p, -1, p) for p in base.primes], base.primes
        )
        diff = sub_mod(
            jnp.broadcast_to(hq, rem.shape[:-2] + (base.k, self.n)), rem, base.p_d
        )  # rem < t < q_j: valid residue mod q_j
        return shoup_mul(diff, *tinv_sh, base.p_d)

    def add_plain(self, ct: Ciphertext, pt_poly) -> Ciphertext:
        """Add Δ·pt to c0 (pt_poly: [..., N] plaintext polynomial mod t)."""
        base = self._base(ct)

        def impl(data, pt):
            dm = self._scale_impl(pt, ct.level)  # round(Q_l·m/t), plain
            if ct.is_ntt:
                dm = base.ntt.ntt(base.to_mont(dm))
            c0 = add_mod(data[..., 0, :, :], dm, base.p_d)
            return data.at[..., 0, :, :].set(c0)

        f = self._jitted(("add_plain", ct.level, ct.is_ntt), impl)
        return replace(ct, data=f(ct.data, jnp.asarray(pt_poly, jnp.uint32)))

    def Q_at(self, level: int) -> int:
        return self.levels[level].prod

    def mul_plain_ntt(self, ct: Ciphertext, pt_ntt_mont) -> Ciphertext:
        """ct (NTT) ⊙ plaintext already lifted+NTT'd+Montgomery ([L, N])."""
        assert ct.is_ntt
        base = self._base(ct)
        f = self._jitted(
            ("mul_plain", ct.level), lambda x, y: mont_mul(x, y, base.p_d, base.pni_d)
        )
        return replace(ct, data=f(ct.data, pt_ntt_mont))

    def lift_plaintext_ntt(self, pt_poly, level: Optional[int] = None) -> jnp.ndarray:
        """Plaintext poly mod t [..., N] -> NTT-domain Montgomery [..., L, N] mod q."""
        base = self.levels[level or self.q.k]

        def impl(pt):
            x = pt[..., None, :]
            x = jnp.broadcast_to(x, x.shape[:-2] + (base.k, self.n))
            return base.ntt.ntt(base.to_mont(x))

        return self._jitted(("lift_pt", level), impl)(jnp.asarray(pt_poly, jnp.uint32))

    def multiply(self, a: Ciphertext, b: Ciphertext) -> Ciphertext:
        """BEHZ ct×ct multiply -> 3-component ciphertext (no relin)."""
        assert a.level == b.level, "multiply needs matching levels"
        lvl = a.level
        a = self.from_ntt(a)
        b = self.from_ntt(b)
        mc = self._mul_ctx(lvl)
        q, bsk = self.levels[lvl], mc["bsk"]
        conv_q_to_bsk = mc["conv"]
        lift_q_to_bsk = mc["lift"]
        t_sh_q, t_sh_bsk = mc["t_sh_q"], mc["t_sh_bsk"]
        qinv_sh_bsk = mc["qinv_sh_bsk"]
        sk_conv = mc["sk_conv"]

        def impl(xa, xb):
            def tensor(base: RnsBase, xa, xb):
                fa = base.ntt.ntt(base.to_mont(xa))
                fb = base.ntt.ntt(base.to_mont(xb))
                c0 = mont_mul(
                    fa[..., 0, :, :], fb[..., 0, :, :], base.p_d, base.pni_d
                )
                c2 = mont_mul(
                    fa[..., 1, :, :], fb[..., 1, :, :], base.p_d, base.pni_d
                )
                c1 = add_mod(
                    mont_mul(fa[..., 0, :, :], fb[..., 1, :, :], base.p_d, base.pni_d),
                    mont_mul(fa[..., 1, :, :], fb[..., 0, :, :], base.p_d, base.pni_d),
                    base.p_d,
                )
                f = jnp.stack([c0, c1, c2], axis=-3)
                return base.from_mont(base.ntt.intt(f))

            x_q = tensor(q, xa, xb)                      # [..., 3, Lq, N]
            a_bsk = lift_q_to_bsk(xa)
            b_bsk = lift_q_to_bsk(xb)
            x_b = tensor(bsk, a_bsk, b_bsk)              # [..., 3, Lb, N]

            # fast floor of t·x / Q_lvl, computed in Bsk
            xt_q = shoup_mul(x_q, *t_sh_q, q.p_d)
            xt_b = shoup_mul(x_b, *t_sh_bsk, bsk.p_d)
            conv = conv_q_to_bsk(xt_q)
            y_b = shoup_mul(sub_mod(xt_b, conv, bsk.p_d), *qinv_sh_bsk, bsk.p_d)
            return sk_conv(y_b)                          # [..., 3, Lq, N] plain

        y_q = self._jitted(("multiply", lvl), impl)(a.data, b.data)
        return Ciphertext(y_q, is_ntt=False, level=lvl)

    def square(self, a: Ciphertext) -> Ciphertext:
        return self.multiply(a, a)

    def operand_forms(self, data, level: int):
        """Trace-level: the two NTT-Montgomery forms a BEHZ multiply needs
        of one coeff-domain ciphertext — (f_q, f_bsk).  The power wavefront
        transforms each DISTINCT operand once per DAG level and reuses the
        forms across every product that consumes it (a power like x^1 feeds
        many products; the naive per-product path re-transformed both
        operands every time)."""
        mc = self._mul_ctx(level)
        q, bsk = self.levels[level], mc["bsk"]
        return (
            q.ntt.ntt(q.to_mont(data)),
            bsk.ntt.ntt(bsk.to_mont(mc["lift"](data))),
        )

    def tensor_scaledown_fused(self, fa_q, fa_b, fb_q, fb_b, level: int):
        """Trace-level BEHZ ct×ct from pre-transformed operands (see
        ``operand_forms``): tensor in both bases, INTT, t/Q fast floor,
        Shenoy–Kumaresan back-conversion.  Returns 3-component plain coeff
        residues [..., 3, Lq, N], bit-identical to ``multiply`` (the same
        elementwise sequence on the same transformed values)."""
        mc = self._mul_ctx(level)
        q, bsk = self.levels[level], mc["bsk"]

        def tensor(base: RnsBase, fa, fb):
            c0 = mont_mul(fa[..., 0, :, :], fb[..., 0, :, :], base.p_d, base.pni_d)
            c2 = mont_mul(fa[..., 1, :, :], fb[..., 1, :, :], base.p_d, base.pni_d)
            c1 = add_mod(
                mont_mul(fa[..., 0, :, :], fb[..., 1, :, :], base.p_d, base.pni_d),
                mont_mul(fa[..., 1, :, :], fb[..., 0, :, :], base.p_d, base.pni_d),
                base.p_d,
            )
            f = jnp.stack([c0, c1, c2], axis=-3)
            return base.from_mont(base.ntt.intt(f))

        x_q = tensor(q, fa_q, fb_q)
        x_b = tensor(bsk, fa_b, fb_b)
        xt_q = shoup_mul(x_q, *mc["t_sh_q"], q.p_d)
        xt_b = shoup_mul(x_b, *mc["t_sh_bsk"], bsk.p_d)
        conv = mc["conv"](xt_q)
        y_b = shoup_mul(sub_mod(xt_b, conv, bsk.p_d), *mc["qinv_sh_bsk"], bsk.p_d)
        return mc["sk_conv"](y_b)

    def multiply_sum(self, a: Ciphertext, b: Ciphertext) -> Ciphertext:
        """Σ_m a[m]·b[m] over the batch axis at position -4 — lazy BEHZ:
        the M tensor products accumulate in the NTT domain of q ∪ Bsk, so
        the expensive scale-down (INTT, t/Q fast floor, Shenoy–Kumaresan
        conversion) runs ONCE for the whole sum instead of once per term.
        The auxiliary base carries ceil(log2 M) extra bits of capacity for
        the grown tensor; rounding error enters once rather than M times,
        so noise is strictly below the multiply-then-add path.  (The
        reference's eval_patstock pays the full SEAL multiply per
        Paterson-Stockmeyer outer term, bin_bundle.cpp:192-360.)

        a, b: [..., M, 2, L, N] coeff-domain ciphertext batches at one
        level; returns the 3-component sum [..., 3, L, N] at that level.
        """
        assert a.level == b.level, "multiply_sum needs matching levels"
        lvl = a.level
        a = self.from_ntt(a)
        b = self.from_ntt(b)
        M = int(a.data.shape[-4])
        extra = max(1, (M - 1).bit_length())
        mc = self._mul_ctx(lvl, extra)
        q, bsk = self.levels[lvl], mc["bsk"]
        conv_q_to_bsk = mc["conv"]
        lift_q_to_bsk = mc["lift"]
        t_sh_q, t_sh_bsk = mc["t_sh_q"], mc["t_sh_bsk"]
        qinv_sh_bsk = mc["qinv_sh_bsk"]
        sk_conv = mc["sk_conv"]

        def impl(xa, xb):
            fa_q = q.ntt.ntt(q.to_mont(xa))
            fb_q = q.ntt.ntt(q.to_mont(xb))
            fa_b = bsk.ntt.ntt(bsk.to_mont(lift_q_to_bsk(xa)))
            fb_b = bsk.ntt.ntt(bsk.to_mont(lift_q_to_bsk(xb)))
            x_q = _msum_tensor(q, fa_q, fb_q, M)
            x_b = _msum_tensor(bsk, fa_b, fb_b, M)
            # fast floor of t·x / Q_lvl, computed in Bsk (x = the summed
            # tensor; |x| < 2·M·N·Q² fits the widened base)
            xt_q = shoup_mul(x_q, *t_sh_q, q.p_d)
            xt_b = shoup_mul(x_b, *t_sh_bsk, bsk.p_d)
            conv = conv_q_to_bsk(xt_q)
            y_b = shoup_mul(sub_mod(xt_b, conv, bsk.p_d), *qinv_sh_bsk, bsk.p_d)
            return sk_conv(y_b)  # [..., 3, Lq, N] plain

        y_q = self._jitted(("multiply_sum", lvl, M), impl)(a.data, b.data)
        return Ciphertext(y_q, is_ntt=False, level=lvl)

    def premul_sum_rhs(self, b: Ciphertext, m_terms: int):
        """Pre-transform a multiply_sum rhs once: returns (fb_q, fb_bsk),
        the NTT-Montgomery forms of b in q and in the (level, ⌈log2 M⌉)-
        widened Bsk base.  In the PS pipeline the high powers y^1..y^nh are
        per-bundle constants, so their transforms amortize over every
        (bundle, cache) row chunk instead of being recomputed per chunk.
        """
        lvl = b.level
        extra = max(1, (m_terms - 1).bit_length())
        mc = self._mul_ctx(lvl, extra)
        q, bsk, lift = self.levels[lvl], mc["bsk"], mc["lift"]
        b = self.from_ntt(b)

        def impl(xb):
            return (
                q.ntt.ntt(q.to_mont(xb)),
                bsk.ntt.ntt(bsk.to_mont(lift(xb))),
            )

        return self._jitted(("premul_sum_rhs", lvl, extra), impl)(b.data)

    def multiply_sum_fused(self, fa_q, xa_coeff, fb_q, fb_bsk, level, m_terms):
        """multiply_sum with pre-transformed operand halves (trace-level
        building block — call under jit; returns [..., 3, Lq, N] plain
        coeff residues, bit-identical to ``multiply_sum``):

        * ``fa_q`` [..., M, 2, Lq, N]: lhs in NTT-Montgomery q form.  The
          PS evaluator already holds this (the inner-sum accumulator), so
          the q-side forward NTT of the lhs disappears;
        * ``xa_coeff``: same lhs as plain coeff residues (needed for the
          FastBConv lift into Bsk, which is a per-coefficient operation);
        * ``fb_q``/``fb_bsk``: rhs from ``premul_sum_rhs``.
        """
        extra = max(1, (m_terms - 1).bit_length())
        mc = self._mul_ctx(level, extra)
        q, bsk = self.levels[level], mc["bsk"]
        conv_q_to_bsk = mc["conv"]
        fa_b = bsk.ntt.ntt(bsk.to_mont(mc["lift"](xa_coeff)))
        x_q = _msum_tensor(q, fa_q, fb_q, m_terms)
        x_b = _msum_tensor(bsk, fa_b, fb_bsk, m_terms)
        xt_q = shoup_mul(x_q, *mc["t_sh_q"], q.p_d)
        xt_b = shoup_mul(x_b, *mc["t_sh_bsk"], bsk.p_d)
        conv = conv_q_to_bsk(xt_q)
        y_b = shoup_mul(sub_mod(xt_b, conv, bsk.p_d), *mc["qinv_sh_bsk"], bsk.p_d)
        return mc["sk_conv"](y_b)

    def relinearize(self, ct: Ciphertext, rk: RelinKey) -> Ciphertext:
        """3-component -> 2-component via RNS-gadget key switching."""
        assert ct.size == 3 and not ct.is_ntt
        lvl = ct.level
        klvl = rk.level  # the key's generation level (digit/limb extent)
        assert lvl <= klvl, "relin key generated below the ciphertext level"
        q = self.levels[lvl]
        qp = self._qp_level(lvl)
        # leveled key switching: keys restrict exactly to any prefix level
        # (the CRT basis element of digit i is ≡ δ_ij mod q_j and its P·g_i
        # term vanishes mod P, so the restricted rows coincide with a key
        # generated natively at lvl) — slice digit rows 0..lvl-1 and limb
        # columns {0..lvl-1, special}; the special column sits at index klvl
        # in a key generated over Q_klvl·P
        limb_cols = list(range(lvl)) + [klvl]

        def impl(data, ksk_full):
            ksk = ksk_full[:lvl][:, :, limb_cols, :]
            c2 = data[..., 2, :, :]  # [..., Lq, N] plain
            # all k digit lifts ride ONE batched forward NTT (digit axis
            # stacked in front) instead of k sequential transforms; the
            # digit-sum order is irrelevant bitwise (modular adds are exact)
            digits = jnp.stack(
                [c2[..., i : i + 1, :] for i in range(q.k)]
            )  # [k, ..., 1, N] each an integer < q_i
            d_mont = qp.to_mont(digits)  # Shoup by R mod p: [k, ..., Lqp, N]
            d_ntt = qp.ntt.ntt(d_mont)
            ksk_b = ksk.reshape(
                (q.k,) + (1,) * (c2.ndim - 2) + ksk.shape[1:]
            )  # [k, 1..., 2, Lqp, N] broadcast over the batch dims
            terms = mont_mul(
                d_ntt[..., None, :, :], ksk_b, qp.p_d, qp.pni_d
            )  # [k, ..., 2, Lqp, N]
            u = terms[0]
            for i in range(1, q.k):
                u = add_mod(u, terms[i], qp.p_d)
            u = qp.from_mont(qp.ntt.intt(u))  # [..., 2, Lqp, N] plain coeff
            div = self._div_p_level(lvl)
            u_q = div(u[..., : q.k, :], u[..., q.k :, :])  # ÷ P
            return add_mod(data[..., :2, :, :], u_q, q.p_d)

        new = self._jitted(("relinearize", lvl, klvl), impl)(ct.data, rk.ksk)
        return Ciphertext(new, is_ntt=False, level=lvl)

    def mod_switch_to(self, ct: Ciphertext, target_level: int) -> Ciphertext:
        ct = self.from_ntt(ct)

        def impl(data, start=ct.level):
            lvl = start
            while lvl > target_level:
                div = self.div_drop[lvl]
                data = div(data[..., : lvl - 1, :], data[..., lvl - 1 :, :])
                lvl -= 1
            return data

        if ct.level == target_level:
            return ct
        f = self._jitted(("mod_switch", ct.level, target_level), impl)
        return Ciphertext(f(ct.data), is_ntt=False, level=target_level)
