"""Negacyclic NTT over RNS limbs — batched JAX implementation + host mirror.

The transform is the Longa–Naehrig / Harvey merged-ψ NTT used by every BFV
implementation (replaces SEAL's ``util/ntt`` from the reference's dependency
surface): forward is Cooley–Tukey with twiddles ``W[j] = ψ^{bitrev(j)}``
(ψ = primitive 2N-th root), output in bit-reversed evaluation order;
inverse is the exact reversal of the forward stages using ``W[j]^{-1}``
followed by an N^{-1} scale.  Because the inverse literally un-does the
forward stage list, round-trip exactness holds by construction and the
pointwise product in the transform domain is negacyclic convolution.

Device layout: residues ``[..., L, N]`` in Montgomery form, limb axis L maps
to the sublane axis, coefficient axis N to the 128-lane axis.  Each stage is
a reshape + elementwise butterfly; the twiddle product uses Harvey's lazy
Shoup multiplication (precomputed ``floor(w·2^32/p)`` companions, values kept
in [0, 4p) between stages, one canonicalization at the end) — ~2x fewer VPU
ops than a Montgomery butterfly, bit-identical canonical outputs.  Data stays
in Montgomery form throughout: Shoup multiplies by PLAIN twiddles, which
preserves the form of the variable operand.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import numpy as np

from apsu_tpu.core import nt
from apsu_tpu.core.mod32 import (
    PrimeConst,
    prime_consts,
    shoup_mul_lazy,
    shoup_pair,
)


class NttContext:
    """Precomputed tables for a fixed (primes, N) pair.

    Host numpy arrays; lift to device lazily via jnp.asarray (cheap, cached by
    the JAX transfer cache once jitted functions close over them).
    """

    def __init__(self, primes: Sequence[int], n: int):
        assert n & (n - 1) == 0, "N must be a power of two"
        self.primes = [int(p) for p in primes]
        self.n = n
        self.logn = n.bit_length() - 1
        self.L = len(self.primes)
        self.consts: PrimeConst = prime_consts(self.primes)

        brev = nt.bit_reverse_perm(n)
        w = np.zeros((self.L, n), dtype=np.uint32)
        winv = np.zeros((self.L, n), dtype=np.uint32)
        ninv = np.zeros((self.L,), dtype=np.uint32)
        w_pl = np.zeros((self.L, n), dtype=np.uint32)
        winv_pl = np.zeros((self.L, n), dtype=np.uint32)
        ninv_pl = np.zeros((self.L,), dtype=np.uint32)
        for l, p in enumerate(self.primes):
            psi = nt.root_of_unity(2 * n, p)
            psi_inv = pow(psi, -1, p)
            psi_pows = np.empty(n, dtype=np.uint64)
            ipsi_pows = np.empty(n, dtype=np.uint64)
            cur, icur = 1, 1
            for i in range(n):
                psi_pows[i] = cur
                ipsi_pows[i] = icur
                cur = cur * psi % p
                icur = icur * psi_inv % p
            wl = psi_pows[brev]
            wlinv = ipsi_pows[brev]
            # plain tables feed the Shoup/Harvey butterflies; Montgomery
            # tables remain for the host mirrors and external consumers
            w_pl[l] = wl.astype(np.uint32)
            winv_pl[l] = wlinv.astype(np.uint32)
            ninv_pl[l] = pow(n, -1, p)
            w[l] = (wl << np.uint64(32)) % np.uint64(p)
            winv[l] = (wlinv << np.uint64(32)) % np.uint64(p)
            ninv[l] = (pow(n, -1, p) << 32) % p
        self.w = w          # [L, N] mont
        self.winv = winv    # [L, N] mont
        self.ninv = ninv    # [L] mont
        self.w_pl = w_pl            # [L, N] plain twiddles
        self.winv_pl = winv_pl
        self.ninv_pl = ninv_pl      # [L] plain N^{-1}
        ps = np.array(self.primes, np.uint32)
        self.w_sh = shoup_pair(w_pl, ps[:, None])      # [L, N] Shoup pairs
        self.winv_sh = shoup_pair(winv_pl, ps[:, None])
        self.ninv_sh = shoup_pair(ninv_pl, ps)

    # -- device transforms ---------------------------------------------------

    def _c(self, arr, extra_dims: int):
        """Broadcastable per-limb constant: [L] -> [L, 1, 1, ...]."""
        return jnp.asarray(arr).reshape((self.L,) + (1,) * extra_dims)

    def _pallas_mode(self) -> bool:
        """Route transforms through the fused Pallas kernel
        (ops/ntt_pallas.py) — bit-identical to the staged XLA path, measured
        13% faster and ~3x faster to compile on v5e (tools/ntt_bench.py:
        1.68 ms vs 1.92 ms per [64,7,8192] transform).  Default ON for
        TPU-sized transforms; APSU_PALLAS_NTT=0 forces the XLA path."""
        import os

        import jax

        return os.environ.get("APSU_PALLAS_NTT", "1") != "0" and (
            jax.default_backend() != "cpu" and self.n >= 1024
        )

    def _ntt4_mode(self) -> bool:
        """Route transforms through the four-step MXU formulation
        (ops/ntt4.py: two int8-decomposed DFT matmuls instead of log2 N
        VPU butterfly stages) — bit-identical by construction and test.
        Opt-in via APSU_NTT4=1 until measured faster on chip."""
        import os

        import jax

        return os.environ.get("APSU_NTT4") == "1" and (
            jax.default_backend() != "cpu" and self.n >= 1024
        )

    def _ntt4_tables(self):
        if not hasattr(self, "_ntt4_tb"):
            from apsu_tpu.ops.ntt4 import Ntt4Tables

            self._ntt4_tb = Ntt4Tables(self.primes, self.n)
        return self._ntt4_tb

    def _pair_mode(self) -> bool:
        """Route transforms through the pair-form VMEM-resident Pallas
        kernel (ops/ntt_pair.py) — bit-identical.  The microbench
        (tools/ntt_bench.py on v5e, chained x32, N=8192) splits by limb
        count: pair wins clearly at L >= 6 (L=6: 1.37 vs 1.78 staged /
        2.04 select; L=9: 1.67 vs 2.26 / 2.86) but loses to the sublane-
        filled select kernel at the eval level (L=4: 1.38 vs 1.20), and
        making it the unconditional default measured SLOWER end-to-end
        (warm query 378 vs 281 ms), and embedding pair kernels in the
        production programs triggers pathological remote compiles (the
        dedup wavefront first call went 82 s -> 568 s with pair default,
        and >30 min with pair at L >= 6 only).  APSU_PAIR_NTT: "0"
        (default: never), "1" (always), "auto" (L >= 6 only)."""
        import os

        import jax

        mode = os.environ.get("APSU_PAIR_NTT", "0")
        if mode == "0" or jax.default_backend() == "cpu" or self.n < 2048:
            return False
        return mode == "1" or (mode == "auto" and len(self.primes) >= 6)

    def _pair_tables(self):
        if not hasattr(self, "_pair_tw"):
            from apsu_tpu.ops.ntt_pair import pair_tables

            self._pair_tw = (
                pair_tables(self.w_pl, self.w_sh, self.n, inverse=False),
                pair_tables(self.winv_pl, self.winv_sh, self.n, inverse=True),
            )
        return self._pair_tw

    def _stage_tables(self):
        if not hasattr(self, "_stage_tw"):
            from apsu_tpu.ops.ntt_pallas import stage_twiddles

            self._stage_tw = (
                stage_twiddles(self.w_pl, self.w_sh, self.n, inverse=False),
                stage_twiddles(self.winv_pl, self.winv_sh, self.n, inverse=True),
            )
        return self._stage_tw

    def _ntt4p_mode(self) -> bool:
        """Fused four-step MXU kernel (ops/ntt4_pallas.py): int8 digit
        matmuls + VMEM recombination, bit-identical.  DEFAULT on TPU at the
        production degree with < 2^28 limbs — the measured winner at every
        production limb count (tools/ntt_bench.py on v5e, [64, L, 8192]
        chained x32: L=4 0.92 ms vs 1.14 select; L=7 1.12 vs 1.47 pair /
        1.61 select; L=9 1.20 vs 1.69 pair / 2.20 staged), compiling in
        3-8 s where pair took minutes in-program.  APSU_NTT4P=0 disables."""
        import os

        import jax

        return (
            os.environ.get("APSU_NTT4P", "1") != "0"
            and jax.default_backend() != "cpu"
            and self.n == 8192
            and all(p < (1 << 28) for p in self.primes)
        )

    def _ntt4p_tables(self):
        if not hasattr(self, "_ntt4p_tb"):
            from apsu_tpu.ops.ntt4_pallas import Ntt4pTables

            self._ntt4p_tb = Ntt4pTables(self.primes, self.n)
        return self._ntt4p_tb

    def ntt(self, x):
        """Forward negacyclic NTT over the last axis. x: [..., L, N] mont."""
        if self._ntt4_mode():
            from apsu_tpu.ops.ntt4 import ntt4

            return ntt4(x, self._ntt4_tables())
        if self._pair_mode():
            from apsu_tpu.ops.ntt_pair import ntt_pair

            tw_f, _ = self._pair_tables()
            return ntt_pair(x, tw_f, np.asarray(self.consts.p, np.uint32))
        if self._ntt4p_mode():
            import os as _os

            if _os.environ.get("APSU_NTT4P_GL") == "1":
                # grid-over-L kernel (A/B: ~L× smaller Mosaic program —
                # the r5 sweep found a per-invocation fixed cost)
                from apsu_tpu.ops.ntt4_pallas import ntt4_pallas_gl

                return ntt4_pallas_gl(x, self._ntt4p_tables())
            from apsu_tpu.ops.ntt4_pallas import ntt4_pallas

            return ntt4_pallas(x, self._ntt4p_tables())
        if self._pallas_mode():
            from apsu_tpu.ops.ntt_pallas import ntt_pallas

            tw_f, _ = self._stage_tables()
            return ntt_pallas(x, tw_f, np.asarray(self.consts.p, np.uint32))
        # Harvey lazy Cooley-Tukey: values stay in [0, 4p) between stages
        # (p < 2^30 so 4p fits uint32); each butterfly is one Shoup product
        # (1 mul_hi + 2 wraparound muls) instead of a full Montgomery REDC —
        # ~2x fewer VPU ops.  Canonicalized once at the end, so results are
        # bit-identical to the Montgomery formulation.
        n, L = self.n, self.L
        w = jnp.asarray(self.w_pl)
        wsh = jnp.asarray(self.w_sh)
        lead = x.shape[:-2]
        for s in range(self.logn):
            m = 1 << s
            t = n >> (s + 1)
            xs = x.reshape(lead + (L, m, 2, t))
            p = self._c(self.consts.p, 2)          # [L, 1, 1]
            two_p = p + p
            tw = w[:, m : 2 * m].reshape(L, m, 1)
            tws = wsh[:, m : 2 * m].reshape(L, m, 1)
            u = xs[..., 0, :]                      # [0, 4p)
            u = jnp.where(u >= two_p, u - two_p, u)   # [0, 2p)
            v = shoup_mul_lazy(xs[..., 1, :], tw, tws, p)  # [0, 2p)
            x = jnp.stack([u + v, (u + two_p) - v], axis=-2)  # [0, 4p)
            x = x.reshape(lead + (L, n))
        p = self._c(self.consts.p, 1)
        two_p = p + p
        x = jnp.where(x >= two_p, x - two_p, x)
        return jnp.where(x >= p, x - p, x)

    def intt(self, x):
        """Inverse transform (exact reversal of ntt stages) + N^{-1} scale."""
        if self._ntt4_mode():
            from apsu_tpu.ops.ntt4 import intt4

            return intt4(x, self._ntt4_tables())
        if self._pair_mode():
            from apsu_tpu.ops.ntt_pair import ntt_pair

            _, tw_i = self._pair_tables()
            return ntt_pair(
                x, tw_i,
                np.asarray(self.consts.p, np.uint32),
                inverse=True,
                ninv_np=np.stack([self.ninv_pl, self.ninv_sh], axis=1),
            )
        if self._ntt4p_mode():
            import os as _os

            if _os.environ.get("APSU_NTT4P_GL") == "1":
                from apsu_tpu.ops.ntt4_pallas import ntt4_pallas_gl

                return ntt4_pallas_gl(x, self._ntt4p_tables(), inverse=True)
            from apsu_tpu.ops.ntt4_pallas import ntt4_pallas

            return ntt4_pallas(x, self._ntt4p_tables(), inverse=True)
        if self._pallas_mode():
            from apsu_tpu.ops.ntt_pallas import ntt_pallas

            _, tw_i = self._stage_tables()
            return ntt_pallas(
                x, tw_i,
                np.asarray(self.consts.p, np.uint32),
                inverse=True,
                ninv_np=np.stack([self.ninv_pl, self.ninv_sh], axis=1),
            )
        # Harvey lazy Gentleman-Sande: values stay in [0, 2p) between stages
        n, L = self.n, self.L
        winv = jnp.asarray(self.winv_pl)
        wsh = jnp.asarray(self.winv_sh)
        lead = x.shape[:-2]
        for s in reversed(range(self.logn)):
            m = 1 << s
            t = n >> (s + 1)
            xs = x.reshape(lead + (L, m, 2, t))
            p = self._c(self.consts.p, 2)          # [L, 1, 1]
            two_p = p + p
            tw = winv[:, m : 2 * m].reshape(L, m, 1)
            tws = wsh[:, m : 2 * m].reshape(L, m, 1)
            u = xs[..., 0, :]                      # [0, 2p)
            v = xs[..., 1, :]
            a = u + v                              # [0, 4p)
            a = jnp.where(a >= two_p, a - two_p, a)
            b = shoup_mul_lazy((u + two_p) - v, tw, tws, p)  # [0, 2p)
            x = jnp.stack([a, b], axis=-2)
            x = x.reshape(lead + (L, n))
        p = self._c(self.consts.p, 1)
        x = shoup_mul_lazy(
            x, self._c(self.ninv_pl, 1), self._c(self.ninv_sh, 1), p
        )
        return jnp.where(x >= p, x - p, x)

    # -- host (numpy / big-int) mirrors for tests and tiny offline work ------

    def np_ntt(self, x: np.ndarray) -> np.ndarray:
        """Host forward NTT on plain (non-Montgomery) residues. x: [L, N]."""
        out = x.astype(object).copy()
        for l, p in enumerate(self.primes):
            a = out[l]
            wl = (
                self.w[l].astype(np.uint64) * pow(1 << 32, -1, p) % p
            )  # de-Montgomery the table
            m = 1
            t = self.n
            while m < self.n:
                t //= 2
                for i in range(m):
                    s = int(wl[m + i])
                    base = 2 * i * t
                    for j in range(base, base + t):
                        u = int(a[j])
                        v = int(a[j + t]) * s % p
                        a[j] = (u + v) % p
                        a[j + t] = (u - v) % p
                m *= 2
            out[l] = a
        return out.astype(np.uint64).astype(np.uint32)

    def np_intt(self, x: np.ndarray) -> np.ndarray:
        out = x.astype(object).copy()
        for l, p in enumerate(self.primes):
            a = out[l]
            wli = (
                self.winv[l].astype(np.uint64) * pow(1 << 32, -1, p) % p
            )
            m = self.n
            t = 1
            while m > 1:
                m //= 2
                for i in range(m):
                    s = int(wli[m + i])
                    base = 2 * i * t
                    for j in range(base, base + t):
                        u = int(a[j])
                        v = int(a[j + t])
                        a[j] = (u + v) % p
                        a[j + t] = (u - v) * s % p
                t *= 2
            ninv = pow(self.n, -1, p)
            out[l] = [int(c) * ninv % p for c in a]
        return np.array(
            [[int(c) for c in row] for row in out], dtype=np.uint64
        ).astype(np.uint32)
