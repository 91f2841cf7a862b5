"""Fused four-step MXU NTT: int8 digit matmuls + VMEM recombination.

``ops/ntt4.py`` proved the negative result for the XLA-level four-step
formulation: the matmuls are nearly free but XLA materializes the 7x int32
digit-group stack (and every intermediate) in HBM, leaving it HBM-bound at
4-6 ms per [64, L, 8192] — 3x SLOWER than the butterfly kernels.  This
module moves the whole transform into ONE Pallas kernel so the group stack
never leaves VMEM, and changes the digit decomposition to cut the VPU
recombination cost:

* **7-bit unsigned digits** (values < 2^28 = 4 x 7 bits, each digit in
  [0, 127] fits s8 natively) — the recentering corrections of the 8-bit
  scheme (column sums, row sums, +K·2^14 biases) vanish entirely.
* **Exact-sum recombination**: the 7 digit-weight groups are base-2^7
  digits of the exact integer product Σ_k W[o,k]·x[k] < n1·p² < 2^63.
  They fold into one (hi, lo) 64-bit pair (pairwise 7-bit packing keeps
  every intermediate in u32), then ONE Montgomery fold by 2^32 and a
  4-bit Barrett finish produce the canonical residue — ~50 u32 ops per
  output element versus 7 Montgomery multiplies (~170 ops) in ntt4.py.
* **Transposed pipeline**: planes live as [n2=64, n1=128] (lanes = 128)
  so both matmul contractions stack digits on 128-aligned axes, group
  slices are lane-tile aligned, and all elementwise twiddle multiplies
  run at full lane occupancy.  One transpose in, one out (as in
  ops/ntt_pair.py).

Twiddle matmul operands carry the MONTGOMERY form of the DFT matrices, so
mont-form inputs stay mont-form through both steps; the elementwise
twist / mid / untwist multiplies use plain+Shoup constant tables (2 muls
per element instead of a full Montgomery multiply).

Bit-identical to ``NttContext.ntt/intt`` (same bit-reversed ordering via
the rev1/rev2-baked exponent tables of ops/ntt4.py, same canonical
outputs).  Requires every prime < 2^28 (all shipped parameter chains are
re-based to <= 28-bit limbs) and the production degree N = 8192
(n1 = 128, n2 = 64).  Replaces the role of SEAL's util/ntt on the hot
path (reference
surface: /root/reference/CMakeLists.txt:120-128, the per-limb transform
inside ComputePowers / relinearization / BEHZ, receiver_osn.cpp:446-488).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from apsu_tpu.core import nt

U32 = jnp.uint32
I32 = jnp.int32


def _split(n: int):
    logn = n.bit_length() - 1
    n2 = 1 << (logn // 2)
    return n // n2, n2


def _digits7(w: np.ndarray) -> np.ndarray:
    """uint32 (< 2^28) -> [4, ...] s8 digits base 2^7, each in [0, 127]."""
    assert int(w.max(initial=0)) < 1 << 28
    return np.stack(
        [((w >> (7 * u)) & 0x7F).astype(np.int8) for u in range(4)]
    )


def _blk_contract_n1(w: np.ndarray) -> np.ndarray:
    """W [L, O, K=n1] mont u32 -> block operand [L, 4K, 7O] s8 for
    dot(xd [*, 4K], blk) = groups [*, 7O]: blk[l, uK+k, gO+o] = d_{g-u}(W[l,o,k])."""
    d = _digits7(w)                   # [4, L, O, K]
    _, L, O, K = d.shape
    blk = np.zeros((L, 4 * K, 7 * O), np.int8)
    for g in range(7):
        for u in range(4):
            v = g - u
            if 0 <= v < 4:
                blk[:, u * K : (u + 1) * K, g * O : (g + 1) * O] = (
                    d[v].transpose(0, 2, 1)
                )
    return blk


def _blk_contract_n2(w: np.ndarray) -> np.ndarray:
    """W [L, O, K=n2] mont u32 -> block operand [L, 7O, 4K] s8 for
    dot(blk, xd [4K, *]) = groups [7O, *]: blk[l, gO+o, uK+k] = d_{g-u}(W[l,o,k])."""
    d = _digits7(w)                   # [4, L, O, K]
    _, L, O, K = d.shape
    blk = np.zeros((L, 7 * O, 4 * K), np.int8)
    for g in range(7):
        for u in range(4):
            v = g - u
            if 0 <= v < 4:
                blk[:, g * O : (g + 1) * O, u * K : (u + 1) * K] = d[v]
    return blk


def _shoup(c: np.ndarray, p: np.ndarray) -> np.ndarray:
    """floor(c·2^32 / p) for plain constant tables."""
    return ((c.astype(np.uint64) << np.uint64(32)) // p.astype(np.uint64)).astype(
        np.uint32
    )


class Ntt4pTables:
    """Constant tables for both directions, in the transposed [n2, n1]
    kernel layout.  All host numpy (baked at trace time)."""

    def __init__(self, primes, n: int):
        self.primes = [int(p) for p in primes]
        assert all(p < (1 << 28) for p in self.primes), "ntt4p needs p < 2^28"
        self.n = n
        self.L = L = len(self.primes)
        n1, n2 = _split(n)
        assert n1 == 2 * n2 and n2 >= 64, "ntt4p expects N in {8192, 32768}"
        self.n1, self.n2 = n1, n2
        r1 = nt.bit_reverse_perm(n1)
        r2 = nt.bit_reverse_perm(n2)

        w1 = np.zeros((L, n1, n1), np.uint64)   # W1[j1, k1] plain
        w2 = np.zeros((L, n2, n2), np.uint64)   # W2[j2, k2] plain
        w1i = np.zeros((L, n1, n1), np.uint64)  # W1i[k1, j1] -> table [o=k1, k=j1]? see below
        w2i = np.zeros((L, n2, n2), np.uint64)
        twist = np.zeros((L, n2, n1), np.uint32)     # plain psi^k, TRANSPOSED [k2, k1]
        untwist = np.zeros((L, n2, n1), np.uint32)   # plain psi^{-k}/N, [j2, j1]
        mid = np.zeros((L, n2, n1), np.uint32)       # plain T[j1,k2] transposed [k2, j1]
        mid_i = np.zeros((L, n2, n1), np.uint32)
        p_arr = np.asarray(self.primes, np.uint32)

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

            pw = pows(w, n)
            pwi = pows(pow(w, -1, p), n)
            e1 = (np.arange(n1)[None, :] * r1[:, None]) % n1   # [j1, k1]
            w1[l] = pw[e1 * n2]
            w1i[l] = pwi[e1.T * n2]                            # [k1, j1]
            e2 = (np.arange(n2)[None, :] * r2[:, None]) % n2   # [j2, k2]
            w2[l] = pw[e2 * n1]
            w2i[l] = pwi[e2.T * n1]                            # [k2, j2]
            em = np.outer(r1, np.arange(n2)) % n               # [j1, k2]
            mid[l] = pw[em].T.astype(np.uint32)
            mid_i[l] = pwi[em].T.astype(np.uint32)
            psp = pows(psi, n).reshape(n1, n2)                 # [k1, k2]
            pspi = pows(pow(psi, -1, p), n).reshape(n1, n2)
            ninv = pow(n, -1, p)
            twist[l] = psp.T.astype(np.uint32)
            untwist[l] = (pspi.T * np.uint64(ninv) % np.uint64(p)).astype(
                np.uint32
            )

        R = 1 << 32

        def to_mont(a, l):
            return (a * np.uint64(R) % np.uint64(self.primes[l])).astype(
                np.uint32
            )

        w1m = np.stack([to_mont(w1[l], l) for l in range(L)])
        w2m = np.stack([to_mont(w2[l], l) for l in range(L)])
        w1im = np.stack([to_mont(w1i[l], l) for l in range(L)])
        w2im = np.stack([to_mont(w2i[l], l) for l in range(L)])

        # tables follow ops/ntt4.py's proven [O, K] convention exactly
        # (out[o] = Σ_k W[o, k]·x[k]): forward step 1 uses W1[j1, k1] and
        # step 2 W2[j2, k2]; the inverse uses w1i/w2i as stored (their
        # first axis is the OUTPUT index by construction, as in intt4)
        self.w1_blk = _blk_contract_n1(w1m)          # [L, 4n1, 7n1]
        self.w2_blk = _blk_contract_n2(w2m)          # [L, 7n2, 4n2]
        self.w1i_blk = _blk_contract_n1(w1im)        # [L, 4n1, 7n1]
        self.w2i_blk = _blk_contract_n2(w2im)        # [L, 7n2, 4n2]
        self.twist = twist
        self.twist_sh = np.stack(
            [_shoup(twist[l], np.uint32(self.primes[l])) for l in range(L)]
        )
        self.untwist = untwist
        self.untwist_sh = np.stack(
            [_shoup(untwist[l], np.uint32(self.primes[l])) for l in range(L)]
        )
        self.mid = mid
        self.mid_sh = np.stack(
            [_shoup(mid[l], np.uint32(self.primes[l])) for l in range(L)]
        )
        self.mid_i = mid_i
        self.mid_i_sh = np.stack(
            [_shoup(mid_i[l], np.uint32(self.primes[l])) for l in range(L)]
        )
        self.p = p_arr
        self.pni = np.asarray(
            [(-pow(p, -1, R)) % R for p in self.primes], np.uint32
        )
        # Barrett constant for the < 2^32 finish: floor(2^32 / p) < 16
        self.mu = np.asarray([(R // p) for p in self.primes], np.uint32)


def _shoup_mul(x, c, c_sh, p):
    """x·c mod p for constant c (plain) with Shoup companion; canonical."""
    # hi = floor(x·c_sh / 2^32) via 16-bit schoolbook on the needed terms
    x0 = x & jnp.uint32(0xFFFF)
    x1 = x >> 16
    c0 = c_sh & jnp.uint32(0xFFFF)
    c1 = c_sh >> 16
    mid1 = x0 * c1
    mid2 = x1 * c0
    w1 = (x0 * c0 >> 16) + (mid1 & jnp.uint32(0xFFFF)) + (
        mid2 & jnp.uint32(0xFFFF)
    )
    hi = x1 * c1 + (mid1 >> 16) + (mid2 >> 16) + (w1 >> 16)
    r = x * c - hi * p
    return jnp.where(r >= p, r - p, r)


def _mul32_hi(a, b):
    """floor(a·b / 2^32) for u32 operands (16-bit schoolbook)."""
    a0 = a & jnp.uint32(0xFFFF)
    a1 = a >> 16
    b0 = b & jnp.uint32(0xFFFF)
    b1 = b >> 16
    mid1 = a0 * b1
    mid2 = a1 * b0
    w1 = (a0 * b0 >> 16) + (mid1 & jnp.uint32(0xFFFF)) + (
        mid2 & jnp.uint32(0xFFFF)
    )
    return a1 * b1 + (mid1 >> 16) + (mid2 >> 16) + (w1 >> 16)


def _recombine(grp_u32_list, p, pni, mu):
    """7 digit-weight groups S_g (u32 < 2^24, base-2^7 digits of the exact
    product sum V < n1·p² < 2^63) -> canonical V·2^{-32} mod p.

    Pairwise packing keeps everything in u32: T_j = S_{2j} + S_{2j+1}·2^7
    (< 2^31), V = T0 + T1·2^14 + T2·2^28 + T3·2^42.  Montgomery fold by
    2^32 then a tiny Barrett finish (mu = floor(2^32/p) < 16)."""
    s = grp_u32_list
    t0 = s[0] + (s[1] << 7)
    t1 = s[2] + (s[3] << 7)
    t2 = s[4] + (s[5] << 7)
    t3 = s[6]
    # lo/hi of V with carry tracking
    lo = t0 + (t1 << 14)
    hi = (t1 >> 18) + (lo < t0).astype(U32)
    add = t2 << 28
    lo2 = lo + add
    hi = hi + (t2 >> 4) + (lo2 < add).astype(U32)
    hi = hi + (t3 << 10)
    lo = lo2
    # Montgomery fold: t = (V + m·p) / 2^32, m = lo·pni mod 2^32
    m = lo * pni
    mp_hi = _mul32_hi(m, p)
    # low 32 bits of V + m·p vanish by construction; carry out of the low
    # word is 1 iff lo != 0 (m·p ≡ -lo mod 2^32)
    t = hi + mp_hi + (lo != jnp.uint32(0)).astype(U32)
    # Barrett finish: t < 2^31 + 2^28; q = floor(t·mu / 2^32) ≈ floor(t/p)
    q = _mul32_hi(t, mu)
    t = t - q * p
    t = jnp.where(t >= p, t - p, t)
    t = jnp.where(t >= p, t - p, t)
    return t


def _dig(x, dt):
    """One digit value < 2^7 cast to the matmul dtype (Mosaic has no
    direct u32->bf16 cast; route through i32)."""
    if dt == jnp.bfloat16:
        return x.astype(jnp.int32).astype(dt)
    return x.astype(dt)


def _dig7_lanes(x, dt=jnp.int8):
    """[R, K] u32 -> [R, 4K] digits (dt) stacked along the lane axis."""
    return jnp.concatenate(
        [_dig((x >> (7 * u)) & jnp.uint32(0x7F), dt) for u in range(4)],
        axis=-1,
    )


def _dig7_sublanes(x, dt=jnp.int8):
    """[K, C] u32 -> [4K, C] digits (dt) stacked along the sublane axis."""
    return jnp.concatenate(
        [_dig((x >> (7 * u)) & jnp.uint32(0x7F), dt) for u in range(4)],
        axis=-2,
    )


def _kernel(w1_ref, w2_ref, tw_ref, tws_ref, md_ref, mds_ref, ut_ref,
            uts_ref, x_ref, o_ref, *, consts, n1, n2, inverse, rb,
            bf16=False):
    # x/o blocks: [1, rb, L, n2, n1] with the n1=128 axis on lanes (all
    # in-kernel reshapes keep the lane axis).  rb rows per grid step: the
    # single-row kernel's elementwise stages ran on [64, 128] tiles —
    # far below VPU-saturating shapes — and its [n2, 4n1] matmul M=64
    # under-filled the MXU; batching rb rows multiplies every elementwise
    # tensor and the step-1 matmul M-dim by rb at identical per-element op
    # counts (bit-identical outputs, same fold points).
    # bf16 digit matmuls (APSU_NTT4P_BF16): 7-bit digits are exact in
    # bf16 and every group sum < 512·127² = 8.26 M < 2^24, so f32 MXU
    # accumulation is exact — an A/B against the s8/i32 path, which may
    # not lower natively on every MXU generation
    dt = jnp.bfloat16 if bf16 else jnp.int8
    acc_t = jnp.float32 if bf16 else I32

    def to_u32(g):
        # f32 group sums are exact integers < 2^24; Mosaic needs the i32 hop
        return g.astype(I32).astype(U32) if bf16 else g.astype(U32)
    for l, (p_i, pni_i, mu_i) in enumerate(consts):
        p = jnp.uint32(p_i)
        pni = jnp.uint32(pni_i)
        mu = jnp.uint32(mu_i)
        xt = x_ref[0, :, l].reshape(rb * n2, n1)       # [rb·n2, n1]

        def contract_n1(v):
            # groups over the n1 (lane) axis: [rb·n2, n1] -> [rb·n2, n1]
            vd = _dig7_lanes(v, dt)                   # [rb·n2, 4·n1]
            grp = jax.lax.dot_general(
                vd, w1_ref[l],
                (((1,), (0,)), ((), ())),
                preferred_element_type=acc_t,
            )                                          # [rb·n2, 7·n1]
            return _recombine(
                [to_u32(grp[:, g * n1 : (g + 1) * n1]) for g in range(7)],
                p, pni, mu,
            )

        def contract_n2(v):
            # groups over the n2 (sublane) axis within each row; the rb
            # dots keep the [*, n1] lane layout, recombine runs batched
            v3 = v.reshape(rb, n2, n1)
            grps = [
                jax.lax.dot_general(
                    w2_ref[l], _dig7_sublanes(v3[r], dt),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=acc_t,
                )                                      # [7·n2, n1]
                for r in range(rb)
            ]
            g4 = jnp.stack(grps).reshape(rb, 7, n2, n1)
            return _recombine(
                [to_u32(g4[:, g]) for g in range(7)], p, pni, mu
            ).reshape(rb * n2, n1)

        def twmul(v, t_ref, ts_ref):
            # per-plane twiddle tables broadcast over the rb rows
            return _shoup_mul(
                v.reshape(rb, n2, n1), t_ref[l][None], ts_ref[l][None], p
            ).reshape(rb * n2, n1)

        if not inverse:
            b = twmul(xt, tw_ref, tws_ref)                    # twist
            g = contract_n1(b)                                # step 1 (j1)
            h = twmul(g, md_ref, mds_ref)                     # mid twiddle
            out = contract_n2(h)                              # step 2 (j2)
        else:
            pcol = contract_n2(xt)                            # step A (k2)
            q = twmul(pcol, md_ref, mds_ref)                  # mid inverse
            bb = contract_n1(q)                               # step B (k1)
            out = twmul(bb, ut_ref, uts_ref)                  # untwist·1/N
        o_ref[0, :, l] = out.reshape(rb, n2, n1)


def _kernel_gl(c_ref, w1_ref, w2_ref, tw_ref, tws_ref,
               md_ref, mds_ref, ut_ref, uts_ref, x_ref, o_ref, *, n1, n2,
               inverse, rb):
    """Grid-over-L kernel body (see ntt4_pallas_gl).  c_ref is the
    scalar-prefetch constants array [3L] (SMEM): per-l p/pni/mu arrive as
    TRUE scalars — vector-register "scalars" from VMEM hit Mosaic 3D
    broadcast-layout limits."""
    l = pl.program_id(1)
    p = c_ref[3 * l + 0].astype(jnp.uint32)
    pni = c_ref[3 * l + 1].astype(jnp.uint32)
    mu = c_ref[3 * l + 2].astype(jnp.uint32)
    xt = x_ref[0, :, 0].reshape(rb * n2, n1)

    def contract_n1(v):
        vd = _dig7_lanes(v, jnp.int8)
        grp = jax.lax.dot_general(
            vd, w1_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=I32,
        )
        return _recombine(
            [grp[:, g * n1 : (g + 1) * n1].astype(U32) for g in range(7)],
            p, pni, mu,
        )

    def contract_n2(v):
        v3 = v.reshape(rb, n2, n1)
        grps = [
            jax.lax.dot_general(
                w2_ref[0], _dig7_sublanes(v3[r], jnp.int8),
                (((1,), (0,)), ((), ())),
                preferred_element_type=I32,
            )
            for r in range(rb)
        ]
        g4 = jnp.stack(grps).reshape(rb, 7, n2, n1)
        return _recombine(
            [g4[:, g].astype(U32) for g in range(7)], p, pni, mu
        ).reshape(rb * n2, n1)

    def twmul(v, t_ref, ts_ref):
        return _shoup_mul(
            v.reshape(rb, n2, n1), t_ref[0][None], ts_ref[0][None], p
        ).reshape(rb * n2, n1)

    if not inverse:
        b = twmul(xt, tw_ref, tws_ref)
        g = contract_n1(b)
        h = twmul(g, md_ref, mds_ref)
        out = contract_n2(h)
    else:
        pcol = contract_n2(xt)
        q = twmul(pcol, md_ref, mds_ref)
        bb = contract_n1(q)
        out = twmul(bb, ut_ref, uts_ref)
    o_ref[0, :, 0] = out.reshape(rb, n2, n1)


def ntt4_pallas_gl(x, tb: Ntt4pTables, inverse: bool = False,
                   interpret: bool = False):
    """Grid-over-L entry (see _kernel_gl); bit-identical to ntt4_pallas."""
    import os as _os

    L, N = x.shape[-2], x.shape[-1]
    assert L == tb.L and N == tb.n
    n1, n2 = tb.n1, tb.n2
    lead = x.shape[:-2]
    B = int(np.prod(lead)) if lead else 1
    xf = x.reshape(B, L, N)
    if not inverse:
        w1_blk, w2_blk = tb.w1_blk, tb.w2_blk
        md, mds = tb.mid, tb.mid_sh
    else:
        w1_blk, w2_blk = tb.w1i_blk, tb.w2i_blk
        md, mds = tb.mid_i, tb.mid_i_sh
    xt = xf.reshape(B, L, n1, n2).swapaxes(-2, -1)
    rb_max = int(_os.environ.get("APSU_NTT4P_RB", "8"))
    rb = 1
    for d in range(1, min(B, rb_max) + 1):
        if B % d == 0:
            rb = d
    xt = xt.reshape(B // rb, rb, L, n2, n1)
    # scalar-prefetch consts [3L] (SMEM): p/pni/mu per limb as true scalars
    consts = np.stack(
        [np.asarray(tb.p), np.asarray(tb.pni), np.asarray(tb.mu)], axis=1
    ).reshape(-1).astype(np.int32)  # i32 bit patterns; kernel casts back
    kernel = functools.partial(
        _kernel_gl, n1=n1, n2=n2, inverse=inverse, rb=rb
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B // rb, L),
        in_specs=[
            pl.BlockSpec(
                (1,) + w1_blk.shape[1:], lambda b, l, c: (l, 0, 0)
            ),
            pl.BlockSpec(
                (1,) + w2_blk.shape[1:], lambda b, l, c: (l, 0, 0)
            ),
            pl.BlockSpec((1, n2, n1), lambda b, l, c: (l, 0, 0)),
            pl.BlockSpec((1, n2, n1), lambda b, l, c: (l, 0, 0)),
            pl.BlockSpec((1, n2, n1), lambda b, l, c: (l, 0, 0)),
            pl.BlockSpec((1, n2, n1), lambda b, l, c: (l, 0, 0)),
            pl.BlockSpec((1, n2, n1), lambda b, l, c: (l, 0, 0)),
            pl.BlockSpec((1, n2, n1), lambda b, l, c: (l, 0, 0)),
            pl.BlockSpec(
                (1, rb, 1, n2, n1), lambda b, l, c: (b, 0, l, 0, 0)
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, rb, 1, n2, n1), lambda b, l, c: (b, 0, l, 0, 0)
        ),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B // rb, rb, L, n2, n1), jnp.uint32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        jnp.asarray(consts),
        jnp.asarray(w1_blk), jnp.asarray(w2_blk),
        jnp.asarray(tb.twist), jnp.asarray(tb.twist_sh),
        jnp.asarray(md), jnp.asarray(mds),
        jnp.asarray(tb.untwist), jnp.asarray(tb.untwist_sh),
        xt,
    )
    return out.reshape(B, L, n2, n1).swapaxes(-2, -1).reshape(x.shape)


def ntt4_pallas(x, tb: Ntt4pTables, inverse: bool = False,
                interpret: bool = False):
    """x: [..., L, N] uint32 Montgomery canonical; returns the transform,
    bit-identical to ``NttContext.ntt/intt``."""
    L, N = x.shape[-2], x.shape[-1]
    assert L == tb.L and N == tb.n
    n1, n2 = tb.n1, tb.n2
    lead = x.shape[:-2]
    B = int(np.prod(lead)) if lead else 1
    xf = x.reshape(B, L, N)

    if not inverse:
        w1_blk, w2_blk = tb.w1_blk, tb.w2_blk
        md, mds = tb.mid, tb.mid_sh
    else:
        w1_blk, w2_blk = tb.w1i_blk, tb.w2i_blk
        md, mds = tb.mid_i, tb.mid_i_sh

    # the kernel layout is [n2, n1] (n1 = 128 on lanes, so every in-kernel
    # reshape keeps the lane axis); the transpose is XLA-level, ~N·4 bytes
    # of HBM each way
    xt = xf.reshape(B, L, n1, n2).swapaxes(-2, -1)

    # rows per grid step: the largest divisor of B within the VMEM budget
    # (x/o blocks are rb·L·64 KB together; rb=8, L=9 is ~4.6 MB)
    import os as _os

    rb_max = int(_os.environ.get("APSU_NTT4P_RB", "8"))
    rb = 1
    for d in range(1, min(B, rb_max) + 1):
        if B % d == 0:
            rb = d
    xt = xt.reshape(B // rb, rb, L, n2, n1)

    bf16 = _os.environ.get("APSU_NTT4P_BF16") == "1"
    if bf16:
        w1_blk = w1_blk.astype(np.float32)  # -> bf16 on device below
        w2_blk = w2_blk.astype(np.float32)

    consts = tuple(
        (int(tb.p[l]), int(tb.pni[l]), int(tb.mu[l])) for l in range(L)
    )
    kernel = functools.partial(
        _kernel, consts=consts, n1=n1, n2=n2, inverse=inverse, rb=rb,
        bf16=bf16,
    )
    const_specs = [
        pl.BlockSpec(w1_blk.shape, lambda b: (0, 0, 0)),
        pl.BlockSpec(w2_blk.shape, lambda b: (0, 0, 0)),
        pl.BlockSpec((L, n2, n1), lambda b: (0, 0, 0)),
        pl.BlockSpec((L, n2, n1), lambda b: (0, 0, 0)),
        pl.BlockSpec((L, n2, n1), lambda b: (0, 0, 0)),
        pl.BlockSpec((L, n2, n1), lambda b: (0, 0, 0)),
        pl.BlockSpec((L, n2, n1), lambda b: (0, 0, 0)),
        pl.BlockSpec((L, n2, n1), lambda b: (0, 0, 0)),
    ]
    out = pl.pallas_call(
        kernel,
        grid=(B // rb,),
        in_specs=const_specs
        + [pl.BlockSpec((1, rb, L, n2, n1), lambda b: (b, 0, 0, 0, 0))],
        out_specs=pl.BlockSpec((1, rb, L, n2, n1), lambda b: (b, 0, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B // rb, rb, L, n2, n1), jnp.uint32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        jnp.asarray(w1_blk, jnp.bfloat16 if bf16 else None),
        jnp.asarray(w2_blk, jnp.bfloat16 if bf16 else None),
        jnp.asarray(tb.twist), jnp.asarray(tb.twist_sh),
        jnp.asarray(md), jnp.asarray(mds),
        jnp.asarray(tb.untwist), jnp.asarray(tb.untwist_sh),
        xt,
    )
    return (
        out.reshape(B, L, n2, n1).swapaxes(-2, -1).reshape(x.shape)
    )
