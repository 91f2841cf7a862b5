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
a reshape + elementwise Montgomery butterfly; XLA fuses the 16-bit-limb
arithmetic into a handful of VPU ops per butterfly.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import numpy as np

from apsu_tpu.core import nt
from apsu_tpu.core.mod32 import (
    PrimeConst,
    add_mod,
    mont_mul,
    prime_consts,
    sub_mod,
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
            # store in Montgomery form
            w[l] = (wl << np.uint64(32)) % np.uint64(p)
            winv[l] = (wlinv << np.uint64(32)) % np.uint64(p)
            ninv[l] = (pow(n, -1, p) << 32) % p
        self.w = w          # [L, N] mont
        self.winv = winv    # [L, N] mont
        self.ninv = ninv    # [L] mont

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

    def _stage_tables(self):
        if not hasattr(self, "_stage_tw"):
            from apsu_tpu.ops.ntt_pallas import stage_twiddles

            self._stage_tw = (
                stage_twiddles(self.w, self.n, inverse=False),
                stage_twiddles(self.winv, self.n, inverse=True),
            )
        return self._stage_tw

    def ntt(self, x):
        """Forward negacyclic NTT over the last axis. x: [..., L, N] mont."""
        if self._ntt4_mode():
            from apsu_tpu.ops.ntt4 import ntt4

            return ntt4(x, self._ntt4_tables())
        if self._pallas_mode():
            from apsu_tpu.ops.ntt_pallas import ntt_pallas

            tw_f, _ = self._stage_tables()
            return ntt_pallas(
                x, tw_f,
                np.asarray(self.consts.p, np.uint32),
                np.asarray(self.consts.p_neg_inv, np.uint32),
            )
        n, L = self.n, self.L
        w = jnp.asarray(self.w)
        lead = x.shape[:-2]
        for s in range(self.logn):
            m = 1 << s
            t = n >> (s + 1)
            xs = x.reshape(lead + (L, m, 2, t))
            p = self._c(self.consts.p, 3)
            pni = self._c(self.consts.p_neg_inv, 3)
            tw = w[:, m : 2 * m].reshape(L, m, 1)
            u = xs[..., 0, :]
            v = mont_mul(xs[..., 1, :], tw, p[..., 0, :], pni[..., 0, :])
            x = jnp.stack([add_mod(u, v, p[..., 0, :]), sub_mod(u, v, p[..., 0, :])], axis=-2)
            x = x.reshape(lead + (L, n))
        return x

    def intt(self, x):
        """Inverse transform (exact reversal of ntt stages) + N^{-1} scale."""
        if self._ntt4_mode():
            from apsu_tpu.ops.ntt4 import intt4

            return intt4(x, self._ntt4_tables())
        if self._pallas_mode():
            from apsu_tpu.ops.ntt_pallas import ntt_pallas

            _, tw_i = self._stage_tables()
            return ntt_pallas(
                x, tw_i,
                np.asarray(self.consts.p, np.uint32),
                np.asarray(self.consts.p_neg_inv, np.uint32),
                inverse=True,
                ninv_np=np.asarray(self.ninv, np.uint32),
            )
        n, L = self.n, self.L
        winv = jnp.asarray(self.winv)
        lead = x.shape[:-2]
        for s in reversed(range(self.logn)):
            m = 1 << s
            t = n >> (s + 1)
            xs = x.reshape(lead + (L, m, 2, t))
            p = self._c(self.consts.p, 3)
            pni = self._c(self.consts.p_neg_inv, 3)
            tw = winv[:, m : 2 * m].reshape(L, m, 1)
            u = xs[..., 0, :]
            v = xs[..., 1, :]
            x = jnp.stack(
                [
                    add_mod(u, v, p[..., 0, :]),
                    mont_mul(sub_mod(u, v, p[..., 0, :]), tw, p[..., 0, :], pni[..., 0, :]),
                ],
                axis=-2,
            )
            x = x.reshape(lead + (L, n))
        p = self._c(self.consts.p, 1)
        pni = self._c(self.consts.p_neg_inv, 1)
        return mont_mul(x, self._c(self.ninv, 1), p, pni)

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
