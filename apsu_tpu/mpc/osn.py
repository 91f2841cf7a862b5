"""Oblivious switching network (share-translation) over the Benes router.

The reference's OSN (/root/reference/common/apsu/permute/apsu_OSNSender.cpp,
apsu_OSNReceiver.cpp, apsu_benes.cpp — Mohassel-Sadeghian style): the
*programmer* knows a permutation π, the *holder* knows the value vector x;
afterwards they hold XOR shares of π(x).  Every switch consumes one chosen
1-of-2 OT whose messages are the holder's wire-mask corrections (straight /
cross), batched into a single OT-extension run over all switches.

The network is ARBITRARY-SIZE (native/benes.cpp, AS-Waksman with 2/3-wire
base cases, matching /root/reference/common/apsu/permute/apsu_benes.cpp:112
onward): n is used exactly, not padded to a power of two — the 6552-column
16M-4096 endgame stops paying the 8192-wide network's ~25% extra switches,
OTs and corrections.  Both parties derive the identical switch→OT-index
enumeration from the permutation-independent topology.

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
    lib = ctypes.CDLL(so)
    lib.benes_any_topology.restype = ctypes.c_int64
    lib.benes_any_route.restype = ctypes.c_int64
    return lib


def _levels(n: int) -> int:
    return 2 * max(1, (n - 1).bit_length()) - 1


@lru_cache(maxsize=16)
def benes_topology(
    n: int,
) -> Tuple[int, List[Tuple[np.ndarray, np.ndarray, np.ndarray]]]:
    """Permutation-independent network of n wires: returns
    (n_switches, per-level [(a_idx, b_idx, ot_idx)]) where ot_idx is each
    switch's rank in the canonical emission order (= its OT instance)."""
    assert n >= 2
    cap = _levels(n) * ((n + 1) // 2)
    lev = np.zeros(cap, dtype=np.int64)
    a = np.zeros(cap, dtype=np.int64)
    b = np.zeros(cap, dtype=np.int64)
    cnt = _lib().benes_any_topology(
        ctypes.c_int64(n),
        lev.ctypes.data_as(ctypes.c_void_p),
        a.ctypes.data_as(ctypes.c_void_p),
        b.ctypes.data_as(ctypes.c_void_p),
    )
    per_level = []
    for L in range(_levels(n)):
        sel = np.nonzero(lev[:cnt] == L)[0]
        if len(sel):
            per_level.append((a[sel].copy(), b[sel].copy(), sel))
    return int(cnt), per_level


def benes_route(perm: np.ndarray) -> np.ndarray:
    """perm [n] (perm[out] = in, any n >= 2) -> settings [n_switches] uint8
    aligned to ``benes_topology(n)``'s OT enumeration.

    Routes are cached to APSU_BENES_CACHE_DIR when set (keyed by the
    permutation digest — the reference's benes disk cache)."""
    n = len(perm)
    p = np.ascontiguousarray(perm, dtype=np.int64)

    cache_dir = os.environ.get("APSU_BENES_CACHE_DIR")
    cache_path = None
    if cache_dir:
        import hashlib

        digest = hashlib.sha256(p.tobytes()).hexdigest()[:32]
        cache_path = os.path.join(cache_dir, f"benes-{n}-{digest}.npy")
        if os.path.exists(cache_path):
            return np.load(cache_path)

    cap = _levels(n) * ((n + 1) // 2)
    out = np.zeros(cap, dtype=np.uint8)
    cnt = _lib().benes_any_route(
        p.ctypes.data_as(ctypes.c_void_p),
        ctypes.c_int64(n),
        out.ctypes.data_as(ctypes.c_void_p),
    )
    if cnt < 0:
        raise ValueError("benes_any_route: input is not a permutation")
    out = out[:cnt].copy()
    if cache_path:
        os.makedirs(cache_dir, exist_ok=True)
        np.save(cache_path, out)
    return out


def _expand_pads(pads: np.ndarray) -> np.ndarray:
    """[k, 16] OT pads -> [k, 32] correction keystream."""
    return expand_pad(pads, 32)


def osn_holder(ch: Duplex, values: np.ndarray, rng: np.random.Generator) -> np.ndarray:
    """Holder of x [n, 16] uint8; returns its share [n, 16] of π(x)
    (the programmer's π, unknown here)."""
    n = values.shape[0]
    n_sw, per_level = benes_topology(n)

    # one OT-extension batch for all switches (we are the OT sender); the
    # straight-path pads y0 BECOME the wire-mask chain, so only the cross
    # corrections travel (32 B/switch instead of 64)
    y0, y1 = ot_ext_send(ch, n_sw, rng)
    p0 = _expand_pads(y0)
    p1 = _expand_pads(y1)

    # wire-mask chain: cur starts random; switched wires advance via the
    # straight pads (m0 == expand(y0) needs no transmission), pass-through
    # wires of a level keep their mask
    mask0 = rng.integers(0, 256, size=(n, 16), dtype=np.uint8)
    cur = mask0.copy()
    e1 = np.empty((n_sw, 32), dtype=np.uint8)
    for a, b, idx in per_level:
        r_in_a, r_in_b = cur[a], cur[b]
        r_out_a = r_in_a ^ p0[idx, :16]
        r_out_b = r_in_b ^ p0[idx, 16:]
        m1 = np.concatenate([r_in_b ^ r_out_a, r_in_a ^ r_out_b], axis=1)
        e1[idx] = m1 ^ p1[idx]
        cur[a] = r_out_a
        cur[b] = r_out_b
    ch.send(e1)
    # masked inputs
    ch.send(values ^ mask0)
    return cur


def osn_programmer(
    ch: Duplex, perm: np.ndarray, rng: np.random.Generator
) -> np.ndarray:
    """Programmer of π (perm[out] = in over n elements); returns its
    share [n, 16]: share_prog ⊕ share_holder = x[π]."""
    n = len(perm)
    n_sw, per_level = benes_topology(n)
    settings = benes_route(perm)  # [n_sw]

    y = ot_ext_recv(ch, settings, rng)  # [n_sw, 16]
    e1 = ch.recv()                      # [n_sw, 32] cross corrections only
    pe = _expand_pads(y)
    # straight switches (c=0): correction IS expand(y0); cross: unmask e1
    corr = np.where(settings.astype(bool)[:, None], e1 ^ pe, pe)

    v = ch.recv().copy()                # masked inputs [n, 16]
    for a, b, idx in per_level:
        c = corr[idx]                   # per-switch correction (32B)
        swap = settings[idx].astype(bool)
        va, vb = v[a], v[b]
        new_a = np.where(swap[:, None], vb, va) ^ c[:, :16]
        new_b = np.where(swap[:, None], va, vb) ^ c[:, 16:]
        v[a] = new_a
        v[b] = new_b
    return v
