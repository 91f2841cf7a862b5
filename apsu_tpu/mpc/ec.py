"""ctypes wrapper over the native Edwards25519 batch library.

Auto-builds ``libapsuec.so`` on first use (make -C apsu_tpu/mpc/native).
All APIs are numpy-batch oriented: points are compressed 32-byte rows of a
[n, 32] uint8 array, scalars are 32-byte little-endian rows.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from functools import lru_cache

import numpy as np

# group order ℓ of the prime-order subgroup
ORDER = 2**252 + 27742317777372353535851937790883648493

_DIR = os.path.dirname(os.path.abspath(__file__))
_NATIVE = os.path.join(_DIR, "native")


@lru_cache(maxsize=1)
def _lib() -> ctypes.CDLL:
    so = os.path.join(_NATIVE, "libapsuec.so")
    if not os.path.exists(so):
        subprocess.run(["make", "-C", _NATIVE, "-s"], check=True)
    lib = ctypes.CDLL(so)
    for name in (
        "ge_scalarmult_batch",
        "ge_base_mult_batch",
        "ge_hash_to_point_batch",
        "ge_add_batch",
        "ge_sub_batch",
    ):
        getattr(lib, name).restype = None
    lib.ge_selftest.restype = ctypes.c_int
    if not lib.ge_selftest():
        raise RuntimeError("ec25519 self-test failed")
    return lib


def _buf(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte))


def _check(points: np.ndarray) -> np.ndarray:
    a = np.ascontiguousarray(points, dtype=np.uint8)
    assert a.ndim == 2 and a.shape[1] == 32
    return a


def scalars_to_bytes(scalars: np.ndarray | list) -> np.ndarray:
    """ints mod ORDER -> [n, 32] little-endian bytes."""
    out = np.zeros((len(scalars), 32), dtype=np.uint8)
    for i, s in enumerate(scalars):
        out[i] = np.frombuffer(int(s % ORDER).to_bytes(32, "little"), dtype=np.uint8)
    return out


def random_scalars(n: int, rng: np.random.Generator) -> np.ndarray:
    """[n] python ints uniform in [1, ORDER)."""
    return [int.from_bytes(rng.bytes(32), "little") % (ORDER - 1) + 1 for _ in range(n)]


def scalar_mult(points: np.ndarray, scalars_b: np.ndarray) -> np.ndarray:
    points = _check(points)
    scalars_b = _check(scalars_b)
    n = points.shape[0]
    out = np.empty((n, 32), dtype=np.uint8)
    _lib().ge_scalarmult_batch(_buf(out), _buf(points), _buf(scalars_b), n)
    return out


def base_mult(scalars_b: np.ndarray) -> np.ndarray:
    scalars_b = _check(scalars_b)
    n = scalars_b.shape[0]
    out = np.empty((n, 32), dtype=np.uint8)
    _lib().ge_base_mult_batch(_buf(out), _buf(scalars_b), n)
    return out


def hash_to_point(seeds: np.ndarray) -> np.ndarray:
    seeds = _check(seeds)
    n = seeds.shape[0]
    out = np.empty((n, 32), dtype=np.uint8)
    _lib().ge_hash_to_point_batch(_buf(out), _buf(seeds), n)
    return out


def point_add(ps: np.ndarray, qs: np.ndarray) -> np.ndarray:
    ps, qs = _check(ps), _check(qs)
    out = np.empty((ps.shape[0], 32), dtype=np.uint8)
    _lib().ge_add_batch(_buf(out), _buf(ps), _buf(qs), ps.shape[0])
    return out


def point_sub(ps: np.ndarray, qs: np.ndarray) -> np.ndarray:
    ps, qs = _check(ps), _check(qs)
    out = np.empty((ps.shape[0], 32), dtype=np.uint8)
    _lib().ge_sub_batch(_buf(out), _buf(ps), _buf(qs), ps.shape[0])
    return out
