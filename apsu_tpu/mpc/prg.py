"""AES-backed PRG and correlation-robust hashing (vectorized).

Replaces Kunlun's ``crypto/prg.hpp`` / ``crypto/aes.hpp`` and libOTe's
fixed-key-AES MMO hash: all hot loops run as single C calls through the
``cryptography`` package's OpenSSL backend over large numpy buffers.
"""

from __future__ import annotations

import numpy as np
from cryptography.hazmat.primitives.ciphers import Cipher, algorithms, modes

_FIXED_KEY = bytes(range(16))


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
