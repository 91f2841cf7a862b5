"""Item hashing and vectorized table-location functions.

Mirrors the roles of the reference's ``Item::hash_to_value`` (Blake2b to a
128-bit value, /root/reference/common/apsu/item.cpp:13) and Kuku's
``LocFunc`` (cuckoo table locations, used at
/root/reference/sender/apsu/sender_osn.cpp:330-374 and
/root/reference/receiver/apsu/receiver_db.cpp:70-79).

TPU-first deviation: locations are a vectorized multiply-shift universal hash
over the 128-bit item hash instead of per-item keyed Blake2 calls — the DB
side computes hash_func_count locations for up to 256M items, which must be
a numpy-vectorized O(n) pass, not 10^8 hashlib invocations.  Location
functions need only spread well (Kuku's are not cryptographic either); all
pseudorandomness guarantees come from the per-slot OPRF layer above.

Items are represented as ``np.uint64`` arrays of shape [n, 2] (lo, hi words).
"""

from __future__ import annotations

import hashlib
from typing import Iterable, List, Sequence

import numpy as np

ITEM_BYTES = 16


def hash_item(data) -> tuple:
    """Arbitrary input -> 128-bit value (lo, hi) via Blake2b."""
    if isinstance(data, str):
        data = data.encode()
    elif isinstance(data, int):
        data = data.to_bytes((max(data.bit_length(), 1) + 7) // 8, "little")
    h = hashlib.blake2b(data, digest_size=ITEM_BYTES).digest()
    return (
        int.from_bytes(h[:8], "little"),
        int.from_bytes(h[8:], "little"),
    )


def hash_items(items: Iterable) -> np.ndarray:
    """List of str/bytes/int -> [n, 2] uint64 (lo, hi)."""
    vals: List = items if hasattr(items, "__len__") else list(items)
    out = np.empty((len(vals), 2), dtype=np.uint64)
    for i, it in enumerate(vals):
        lo, hi = hash_item(it)
        out[i, 0] = lo
        out[i, 1] = hi
    return out


def random_items(n: int, rng: np.random.Generator) -> np.ndarray:
    """Synthetic 128-bit items (already in hash space), [n, 2] uint64."""
    return rng.integers(0, 1 << 64, size=(n, 2), dtype=np.uint64)


# ---------------------------------------------------------------------
# item / label value types (reference item.h:32,96,177,294 — Item,
# HashedItem, Label, EncryptedLabel, Bitstring) and the label encryptor
# (reference util/label_encryptor.h: nonce + key-stretch AES encryption so
# only a party KNOWING an item can read its label)
# ---------------------------------------------------------------------
from dataclasses import dataclass  # noqa: E402

Label = bytes            # reference: Label = vector<unsigned char>
EncryptedLabel = bytes


@dataclass(frozen=True)
class Bitstring:
    """A value of an exact bit length (reference item.h:32-95)."""

    data: bytes
    bit_count: int

    def __post_init__(self):
        if len(self.data) != (self.bit_count + 7) // 8:
            raise ValueError("data length inconsistent with bit_count")
        rem = self.bit_count % 8
        if rem and (self.data[-1] >> rem):
            raise ValueError("padding bits of the last byte must be zero")


@dataclass(frozen=True)
class Item:
    """128-bit item value; hashes arbitrary input like the reference's
    Item::hash_to_value (item.cpp:13, Blake2b)."""

    lo: int
    hi: int

    @staticmethod
    def of(data) -> "Item":
        lo, hi = hash_item(data)
        return Item(lo, hi)

    def to_array(self) -> np.ndarray:
        return np.array([[self.lo, self.hi]], dtype=np.uint64)


HashedItem = Item  # post-OPRF values share the representation


def _label_key(item: np.ndarray, nonce: bytes, stretch: int = 2) -> bytes:
    """Key-stretched per-item label key (reference label_encryptor.h)."""
    seed = np.ascontiguousarray(item, dtype=np.uint64).tobytes() + nonce
    k = seed
    for _ in range(max(1, stretch)):
        k = hashlib.blake2b(k, digest_size=32, person=b"apsu-lblkey").digest()
    return k


def encrypt_label(label: bytes, item: np.ndarray, nonce: bytes) -> bytes:
    """AES-CTR encrypt a label under a key derived from (item, nonce); the
    nonce is prepended so decrypt needs only the item."""
    from cryptography.hazmat.primitives.ciphers import Cipher, algorithms, modes

    if len(nonce) != 16:
        raise ValueError("nonce must be 16 bytes")
    enc = Cipher(
        algorithms.AES(_label_key(item, nonce)), modes.CTR(nonce)
    ).encryptor()
    return nonce + enc.update(bytes(label))


def decrypt_label(blob: bytes, item: np.ndarray) -> bytes:
    from cryptography.hazmat.primitives.ciphers import Cipher, algorithms, modes

    nonce, ct = bytes(blob[:16]), bytes(blob[16:])
    dec = Cipher(
        algorithms.AES(_label_key(item, nonce)), modes.CTR(nonce)
    ).decryptor()
    return dec.update(ct)


class LocFuncs:
    """hash_func_count vectorized multiply-shift location functions.

    loc_i(x) = high64((x_lo·A_i + x_hi·B_i + C_i) mod 2^64 scaled to table):
    uses the Lemire reduction ``(v * table_size) >> 64`` implemented with
    uint64 arithmetic split into 32-bit halves.
    """

    def __init__(self, table_size: int, func_count: int, seed: bytes = b"apsu-loc"):
        self.table_size = int(table_size)
        self.func_count = int(func_count)
        st = np.random.Generator(
            np.random.Philox(
                int.from_bytes(hashlib.blake2b(seed, digest_size=8).digest(), "little")
            )
        )
        self.A = st.integers(0, 1 << 64, size=func_count, dtype=np.uint64) | np.uint64(1)
        self.B = st.integers(0, 1 << 64, size=func_count, dtype=np.uint64) | np.uint64(1)
        self.C = st.integers(0, 1 << 64, size=func_count, dtype=np.uint64)

    def locations(self, items: np.ndarray) -> np.ndarray:
        """items [n, 2] uint64 -> [n, func_count] int64 table locations.

        Per-function in-place column passes: the broadcast formulation
        ([n, 1] x [h]) allocated ~9 full [n, h] temporaries per call,
        which dominated the 2^28-item build's host phase (measured 94 s
        -> 23 s at 32M items x 3 functions).  Values are identical."""
        n = items.shape[0]
        lo = np.ascontiguousarray(items[:, 0])
        hi = np.ascontiguousarray(items[:, 1])
        out = np.empty((self.func_count, n), dtype=np.int64)
        m = np.uint64(self.table_size)
        t = np.empty(n, np.uint64)
        for i in range(self.func_count):
            v = lo * self.A[i]
            np.multiply(hi, self.B[i], out=t)
            v += t
            v += self.C[i]
            # mix before reduction (xorshift-multiply)
            np.right_shift(v, np.uint64(33), out=t)
            v ^= t
            v *= np.uint64(0xFF51AFD7ED558CCD)
            np.right_shift(v, np.uint64(33), out=t)
            v ^= t
            # Lemire map to [0, table_size): high 64 bits of v * table_size
            np.bitwise_and(v, np.uint64(0xFFFFFFFF), out=t)
            t *= m
            t >>= np.uint64(32)
            v >>= np.uint64(32)
            v *= m
            v += t
            v >>= np.uint64(32)
            out[i] = v.astype(np.int64)
        return np.ascontiguousarray(out.T)
