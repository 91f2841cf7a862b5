"""Host-side number theory: primality, NTT-friendly prime generation, roots.

Replaces the role of SEAL's ``util/numth`` + ``Modulus``/``CoeffModulus``
machinery (reference: SEAL dependency, see /root/reference/CMakeLists.txt:120-128)
with plain-Python big-int math.  Everything here runs once at parameter-setup
time on the host; the results are baked into device constant tables.
"""

from __future__ import annotations

import functools
from typing import List

import numpy as np

# Deterministic Miller-Rabin witnesses valid for all n < 3.3e24 (> 2^64).
_MR_WITNESSES = (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37)


def is_prime(n: int) -> bool:
    if n < 2:
        return False
    for p in (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37):
        if n % p == 0:
            return n == p
    d = n - 1
    r = 0
    while d % 2 == 0:
        d //= 2
        r += 1
    for a in _MR_WITNESSES:
        x = pow(a, d, n)
        if x == 1 or x == n - 1:
            continue
        for _ in range(r - 1):
            x = x * x % n
            if x == n - 1:
                break
        else:
            return False
    return True


def gen_ntt_primes(
    bit_sizes: List[int], two_n: int, exclude: List[int] | None = None
) -> List[int]:
    """Distinct primes p ≡ 1 (mod ``two_n``), p of exactly the given bit sizes.

    Searches downward from the top of each bit range so the largest usable
    prime of each size is chosen (maximizes noise budget for a given security
    level).  ``exclude`` lets callers avoid collisions with the plain modulus
    or previously chosen bases.
    """
    found: List[int] = []
    excl = set(exclude or [])
    for bits in bit_sizes:
        if (1 << bits) <= two_n:
            raise ValueError(f"{bits}-bit prime cannot be ≡ 1 mod {two_n}")
        # Largest candidate < 2^bits with candidate ≡ 1 (mod two_n).
        cand = ((1 << bits) - 1) // two_n * two_n + 1
        while cand > (1 << (bits - 1)):
            if cand not in excl and cand not in found and is_prime(cand):
                found.append(cand)
                break
            cand -= two_n
        else:
            raise ValueError(f"no {bits}-bit prime ≡ 1 mod {two_n}")
    return found


def gen_batching_prime(bits: int, two_n: int) -> int:
    """Smallest prime of the given bit size ≡ 1 mod 2N (SEAL's
    ``PlainModulus::Batching`` analogue; reference psu_params.cpp:355-357)."""
    cand = (1 << (bits - 1)) // two_n * two_n + 1
    while cand < (1 << bits):
        if cand > (1 << (bits - 1)) and is_prime(cand):
            return cand
        cand += two_n
    raise ValueError(f"no {bits}-bit prime ≡ 1 mod {two_n}")


def primitive_root(p: int) -> int:
    """Smallest generator of Z_p^*."""
    factors = _factorize(p - 1)
    for g in range(2, p):
        if all(pow(g, (p - 1) // f, p) != 1 for f in factors):
            return g
    raise ValueError("no primitive root")


@functools.lru_cache(maxsize=None)
def _factorize(n: int) -> tuple:
    fs = set()
    d = 2
    while d * d <= n:
        while n % d == 0:
            fs.add(d)
            n //= d
        d += 1
    if n > 1:
        fs.add(n)
    return tuple(sorted(fs))


def root_of_unity(order: int, p: int) -> int:
    """A primitive ``order``-th root of unity mod p (order | p-1)."""
    if (p - 1) % order != 0:
        raise ValueError(f"{order} does not divide {p}-1")
    g = primitive_root(p)
    return pow(g, (p - 1) // order, p)


def min_root_of_unity(order: int, p: int) -> int:
    """The *smallest* primitive order-th root of unity (deterministic tables)."""
    w = root_of_unity(order, p)
    best = None
    cur = w
    for _ in range(order // 2):
        # Only odd powers of a primitive 2k-th root are primitive again; for a
        # generic search just scan all generators cur = w^j with gcd(j, order)=1.
        best = cur if best is None or cur < best else best
        cur = cur * pow(w, 2, p) % p  # steps through odd powers w^(2i+1)
    return best


def bit_reverse(x: int, bits: int) -> int:
    y = 0
    for _ in range(bits):
        y = (y << 1) | (x & 1)
        x >>= 1
    return y


def bit_reverse_perm(n: int) -> np.ndarray:
    bits = n.bit_length() - 1
    return np.array([bit_reverse(i, bits) for i in range(n)], dtype=np.int64)
