"""Oblivious switching network (share-translation) over the Benes router.

The reference's OSN (/root/reference/common/apsu/permute/apsu_OSNSender.cpp,
apsu_OSNReceiver.cpp, apsu_benes.cpp — Mohassel-Sadeghian style): the
*programmer* knows a permutation π, the *holder* knows the value vector x;
afterwards they hold XOR shares of π(x).  Every switch consumes one chosen
1-of-2 OT whose messages are the holder's wire-mask corrections (straight /
cross), batched into a single OT-extension run over all (2m-1)·n/2 switches.

Wire layout matches native/benes.cpp: level L pairs (a, a+2^dep) with
dep = min(L, 2m-2-L), switch id (a >> (dep+1))·2^dep + (a & (2^dep - 1)).

Bandwidth: the straight-path correction of every switch is DERIVED from the
OT pad y0 (the holder defines its next-level wire masks as
mask_out := mask_in ⊕ expand(y0)), so only the cross correction
m1 ⊕ expand(y1) travels — 32 bytes/switch instead of 64 (the role of the
reference's SilentOT/one-sided switch flavors, apsu_OSNSender.cpp:19-49).
The switch OTs themselves go through otext.ot_ext_*, which swaps IKNP for
SoftSpoken chunked extension on large batches — 2 bytes/switch of OT
correction instead of 16 (the reference's SilentOT still pays 64 B/switch
of message corrections on top).  Benes routes can be disk-cached via
APSU_BENES_CACHE_DIR (reference apsu_OSNSender.cpp:257-270).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from functools import lru_cache
from typing import List, Tuple

import numpy as np

from apsu_tpu.mpc.duplex import Duplex
from apsu_tpu.mpc.otext import expand_pad, ot_ext_recv, ot_ext_send

_NATIVE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "native")


@lru_cache(maxsize=1)
def _lib() -> ctypes.CDLL:
    so = os.path.join(_NATIVE, "libapsubenes.so")
    if not os.path.exists(so):
        subprocess.run(["make", "-C", _NATIVE, "-s"], check=True)
    return ctypes.CDLL(so)


def benes_route(perm: np.ndarray) -> np.ndarray:
    """perm [n] (perm[out] = in, n = 2^m) -> settings [levels, n/2] uint8.

    Routes are cached to APSU_BENES_CACHE_DIR when set (keyed by the
    permutation digest — the reference's benes disk cache)."""
    n = len(perm)
    m = n.bit_length() - 1
    assert 1 << m == n and n >= 2
    levels = 2 * m - 1
    p = np.ascontiguousarray(perm, dtype=np.int64)

    cache_dir = os.environ.get("APSU_BENES_CACHE_DIR")
    cache_path = None
    if cache_dir:
        import hashlib

        digest = hashlib.sha256(p.tobytes()).hexdigest()[:32]
        cache_path = os.path.join(cache_dir, f"benes-{n}-{digest}.npy")
        if os.path.exists(cache_path):
            return np.load(cache_path)

    out = np.zeros(levels * (n // 2), dtype=np.uint8)
    _lib().benes_route(
        p.ctypes.data_as(ctypes.c_void_p),
        ctypes.c_int64(n),
        out.ctypes.data_as(ctypes.c_void_p),
    )
    out = out.reshape(levels, n // 2)
    if cache_path:
        os.makedirs(cache_dir, exist_ok=True)
        np.save(cache_path, out)
    return out


def level_pairs(n: int) -> List[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Per level: (a_idx, b_idx, switch_idx) arrays of length n/2."""
    m = n.bit_length() - 1
    levels = 2 * m - 1
    out = []
    for L in range(levels):
        dep = min(L, levels - 1 - L)
        stride = 1 << dep
        a = []
        for blk in range(0, n, 2 * stride):
            a.extend(range(blk, blk + stride))
        a = np.array(a, dtype=np.int64)
        b = a + stride
        sidx = (a >> (dep + 1)) * stride + (a & (stride - 1))
        out.append((a, b, sidx))
    return out


def _pad_pow2(n: int) -> int:
    m = 1
    while m < n:
        m <<= 1
    return max(m, 2)


def _expand_pads(pads: np.ndarray) -> np.ndarray:
    """[k, 16] OT pads -> [k, 32] correction keystream."""
    return expand_pad(pads, 32)


def osn_holder(ch: Duplex, values: np.ndarray, rng: np.random.Generator) -> np.ndarray:
    """Holder of x [n_real, 16] uint8; returns its share [n_real, 16] of π(x)
    (the programmer's π, unknown here)."""
    n_real = values.shape[0]
    n = _pad_pow2(n_real)
    m = n.bit_length() - 1
    levels = 2 * m - 1
    half = n // 2

    x = np.zeros((n, 16), dtype=np.uint8)
    x[:n_real] = values
    x[n_real:] = rng.integers(0, 256, size=(n - n_real, 16), dtype=np.uint8)

    # one OT-extension batch for all switches (we are the OT sender); the
    # straight-path pads y0 BECOME the wire-mask chain, so only the cross
    # corrections travel (32 B/switch instead of 64)
    y0, y1 = ot_ext_send(ch, levels * half, rng)
    p0 = _expand_pads(y0)
    p1 = _expand_pads(y1)

    # wire masks per level boundary: masks[0] random; masks[L+1] derived
    # from the straight pads so that m0 == expand(y0) needs no transmission
    masks = np.empty((levels + 1, n, 16), dtype=np.uint8)
    masks[0] = rng.integers(0, 256, size=(n, 16), dtype=np.uint8)
    pairs = level_pairs(n)
    e1 = np.empty((levels * half, 32), dtype=np.uint8)
    for L, (a, b, sidx) in enumerate(pairs):
        idx = L * half + sidx            # OT index of switch s at level L
        r_in_a, r_in_b = masks[L][a], masks[L][b]
        r_out_a = r_in_a ^ p0[idx, :16]
        r_out_b = r_in_b ^ p0[idx, 16:]
        masks[L + 1][a] = r_out_a
        masks[L + 1][b] = r_out_b
        m1 = np.concatenate([r_in_b ^ r_out_a, r_in_a ^ r_out_b], axis=1)
        e1[idx] = m1 ^ p1[idx]
    ch.send(e1)
    # masked inputs
    ch.send(x ^ masks[0])
    return masks[levels][:n_real].copy()


def osn_programmer(
    ch: Duplex, perm: np.ndarray, rng: np.random.Generator
) -> np.ndarray:
    """Programmer of π (perm[out] = in over n_real elements); returns its
    share [n_real, 16]: share_prog ⊕ share_holder = x[π]."""
    n_real = len(perm)
    n = _pad_pow2(n_real)
    m = n.bit_length() - 1
    levels = 2 * m - 1
    half = n // 2

    full_perm = np.arange(n, dtype=np.int64)
    full_perm[:n_real] = perm
    settings = benes_route(full_perm)          # [levels, half]

    choices = settings.reshape(-1)
    y = ot_ext_recv(ch, choices, rng)          # [levels*half, 16]
    e1 = ch.recv()                             # [levels*half, 32] cross only
    pe = _expand_pads(y)
    # straight switches (c=0): correction IS expand(y0); cross: unmask e1
    corr = np.where(choices.astype(bool)[:, None], e1 ^ pe, pe)

    v = ch.recv().copy()                       # masked inputs [n, 16]
    pairs = level_pairs(n)
    for L, (a, b, sidx) in enumerate(pairs):
        c = corr[L * half + sidx]              # per-switch correction (32B)
        swap = settings[L][sidx].astype(bool)
        va, vb = v[a], v[b]
        new_a = np.where(swap[:, None], vb, va) ^ c[:, :16]
        new_b = np.where(swap[:, None], va, vb) ^ c[:, 16:]
        v[a] = new_a
        v[b] = new_b
    return v[:n_real]
