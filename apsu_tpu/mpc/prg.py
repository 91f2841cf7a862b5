"""AES-backed PRG and correlation-robust hashing (vectorized).

Replaces Kunlun's ``crypto/prg.hpp`` / ``crypto/aes.hpp`` and libOTe's
fixed-key-AES MMO hash: all hot loops run as single C calls through the
``cryptography`` package's OpenSSL backend over large numpy buffers.
"""

from __future__ import annotations

import os

import numpy as np
from cryptography.hazmat.primitives.ciphers import Cipher, algorithms, modes

_FIXED_KEY = bytes(range(16))


class CsRng:
    """Cryptographically secure RNG exposing the ``numpy.random.Generator``
    subset the framework draws from (``integers`` / ``permutation`` /
    ``bytes`` / ``normal``), backed by AES-256-CTR keyed from OS entropy.

    All party secrets — BFV secret keys and noise, result masks, OT choice
    bits and pads, EC scalars — must come from one of these (the reference
    gets the same guarantee from SEAL's Blake2XB PRNG and Kunlun's
    ``PRG::SetSeed``); ``numpy``'s PCG64 is NOT cryptographic, and a
    low-entropy seed makes every secret brute-forceable from the public
    transcript.  Deterministic tests pass an explicit 32-byte key.
    """

    def __init__(self, key: bytes | None = None):
        if key is None:
            key = os.urandom(32)
        if len(key) < 16:
            raise ValueError("CsRng key must be at least 128 bits")
        self._enc = Cipher(
            algorithms.AES(key.ljust(32, b"\0")[:32]), modes.CTR(b"\0" * 16)
        ).encryptor()

    def bytes(self, n: int) -> bytes:
        return self._enc.update(b"\0" * int(n))

    def spawn(self) -> "CsRng":
        """Independent child stream (forward-secure split)."""
        return CsRng(self.bytes(32))

    def _u64(self, count: int) -> np.ndarray:
        return np.frombuffer(self.bytes(8 * count), dtype=np.uint64)

    def integers(self, low, high=None, size=None, dtype=np.int64, endpoint=False):
        if high is None:
            low, high = 0, low
        lo, hi = int(low), int(high) + (1 if endpoint else 0)
        span = hi - lo
        if span <= 0:
            raise ValueError("low >= high")
        n = int(np.prod(size)) if size is not None else 1
        # 64-bit draw mod span: bias < span/2^64 ≤ 2^-34 for every range the
        # protocol uses (≤ 30-bit moduli) — cryptographically negligible
        u = self._u64(n) % np.uint64(span)
        out = (u.astype(np.int64) + lo).astype(dtype)
        if size is None:
            return out.reshape(())[()]
        return out.reshape(size)

    def permutation(self, n: int) -> np.ndarray:
        # argsort of 128-bit random keys: collision probability ≤ n²/2^129
        a, b = self._u64(int(n)), self._u64(int(n))
        return np.lexsort((b, a)).astype(np.int64)

    def normal(self, loc: float = 0.0, scale: float = 1.0, size=None) -> np.ndarray:
        n = int(np.prod(size)) if size is not None else 1
        m = (n + 1) // 2
        # Box-Muller from 53-bit uniforms (u1 offset avoids log(0))
        u1 = (self._u64(m) >> np.uint64(11)).astype(np.float64) / (1 << 53)
        u2 = (self._u64(m) >> np.uint64(11)).astype(np.float64) / (1 << 53)
        r = np.sqrt(-2.0 * np.log1p(-u1))
        theta = 2.0 * np.pi * u2
        z = np.concatenate([r * np.cos(theta), r * np.sin(theta)])[:n]
        z = loc + scale * z
        if size is None:
            return z[0]
        return z.reshape(size)


def prg_bytes(seed: bytes, n: int) -> np.ndarray:
    """Expand a 16/32-byte seed to n pseudorandom bytes (AES-CTR)."""
    key = seed.ljust(16, b"\0")[:16] if len(seed) < 32 else seed[:32]
    if len(key) not in (16, 32):
        key = key.ljust(32, b"\0")
    enc = Cipher(algorithms.AES(key), modes.CTR(b"\0" * 16)).encryptor()
    return np.frombuffer(enc.update(b"\0" * n), dtype=np.uint8).copy()


def prg_bits(seed: bytes, nbits: int) -> np.ndarray:
    """n pseudorandom bits as a uint8 0/1 array."""
    nbytes = (nbits + 7) // 8
    return np.unpackbits(prg_bytes(seed, nbytes))[:nbits]


def aes_ecb_fixed(blocks: np.ndarray) -> np.ndarray:
    """AES-ECB under the fixed key over [n, 16] uint8 blocks (one C call)."""
    b = np.ascontiguousarray(blocks, dtype=np.uint8)
    enc = Cipher(algorithms.AES(_FIXED_KEY), modes.ECB()).encryptor()
    out = enc.update(b.tobytes())
    return np.frombuffer(out, dtype=np.uint8).reshape(b.shape)


def mmo_hash(blocks: np.ndarray, tweak: int = 0) -> np.ndarray:
    """Matyas-Meyer-Oseas: H(x) = AES_fk(x ⊕ t) ⊕ (x ⊕ t), vectorized.

    blocks: [n, 16] uint8.  The tweak is folded in as an 8-byte LE counter
    added to the first 8 bytes — instance separation for OT pads.
    """
    x = np.ascontiguousarray(blocks, dtype=np.uint8).copy()
    if tweak:
        t = np.frombuffer(int(tweak).to_bytes(8, "little"), dtype=np.uint8)
        x[:, :8] ^= t
    return aes_ecb_fixed(x) ^ x


def mmo_hash_indexed(blocks: np.ndarray) -> np.ndarray:
    """Per-row-index tweaked MMO: H(i, x_i) for rows i (OT instance binding)."""
    x = np.ascontiguousarray(blocks, dtype=np.uint8).copy()
    n = x.shape[0]
    idx = np.arange(n, dtype=np.uint64)
    x[:, :8] ^= idx.view(np.uint8).reshape(n, 8)
    return aes_ecb_fixed(x) ^ x


def aes_code(inputs: np.ndarray, width_blocks: int) -> np.ndarray:
    """Pseudorandom code C(x): [n, 16] -> [n, 16*width_blocks] uint8.

    KKRT's linear-code substitute (eprint 2016/799 uses a PRC): each output
    block is AES under a distinct public derived key of the input block.
    """
    x = np.ascontiguousarray(inputs, dtype=np.uint8)
    outs = []
    for w in range(width_blocks):
        key = bytes([w + 1]) * 16
        enc = Cipher(algorithms.AES(key), modes.ECB()).encryptor()
        c = np.frombuffer(enc.update(x.tobytes()), dtype=np.uint8).reshape(x.shape)
        outs.append(c ^ x)
    return np.concatenate(outs, axis=1)


def pack_bits_rows(bits: np.ndarray) -> np.ndarray:
    """[r, c] 0/1 uint8 -> [r, ceil(c/8)] packed (little-endian bit order)."""
    return np.packbits(bits, axis=-1, bitorder="little")


def unpack_bits_rows(packed: np.ndarray, c: int) -> np.ndarray:
    return np.unpackbits(packed, axis=-1, bitorder="little", count=c)
