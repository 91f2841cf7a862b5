"""PSU protocol parameters — JSON schema compatible with the reference.

Mirrors the semantics of the reference's ``PSUParams``
(/root/reference/common/apsu/psu_params.h:31, JSON loader at
psu_params.cpp:290-374): item/table/query params are taken verbatim, while the
SEAL params are *re-based* for TPU: the reference's 48..56-bit RNS primes
assume a 64-bit scalar ALU; the TPU datapath is 32-bit, so the coefficient
modulus is regenerated as a chain of ≤30-bit NTT-friendly primes whose total
bit count never exceeds the reference's (same or better security for the same
poly degree), with the last prime reserved as the key-switching special prime
(same convention SEAL applies to ``coeff_modulus``).

Derived quantities follow psu_params.cpp:95-180:
  items_per_bundle = floor(poly_degree / felts_per_item)
  bins_per_bundle  = items_per_bundle * felts_per_item
  bundle_idx_count = ceil(table_size / items_per_bundle)
"""

from __future__ import annotations

import json
import math
from dataclasses import dataclass, field
from typing import Dict, List, Sequence, Tuple

from apsu_tpu.core import nt

# Largest per-limb prime size usable with the uint32 Montgomery datapath.
MAX_LIMB_BITS = 30
# Key-switching special prime size.  Small on purpose: every bit not spent
# on P is a data-modulus noise bit, and the relin noise term it controls
# (∝ k·q_max·σ·√N / P, relative to Q) stays orders of magnitude below the
# multiply noise even at P ≈ 2^22 for every shipped parameter set.  The
# noise sweep (tools/param_sweep.py) validates the resulting chains at full
# bin load.
SPECIAL_BITS = 22


@dataclass(frozen=True)
class TableParams:
    hash_func_count: int
    table_size: int
    max_items_per_bin: int


@dataclass(frozen=True)
class ItemParams:
    felts_per_item: int


@dataclass(frozen=True)
class QueryParams:
    ps_low_degree: int
    query_powers: Tuple[int, ...]  # sorted, always contains 1


@dataclass(frozen=True)
class SealParams:
    """BFV parameters, re-based onto ≤30-bit limbs.

    ``has_special`` reserves the last prime for key switching (SEAL's
    convention) — set only when the query plan actually relinearizes;
    source-covered power sets (e.g. 100K-1) keep the whole chain as data
    modulus, matching the reference's single-prime no-relin configs.
    """

    poly_modulus_degree: int
    plain_modulus: int
    coeff_modulus: Tuple[int, ...]       # data primes (+ special prime last)
    ref_coeff_modulus_bits: Tuple[int, ...]  # what the JSON asked for
    has_special: bool = True

    @property
    def data_modulus(self) -> Tuple[int, ...]:
        """Primes used for ciphertexts (all but the special prime)."""
        if len(self.coeff_modulus) == 1 or not self.has_special:
            return self.coeff_modulus
        return self.coeff_modulus[:-1]

    @property
    def special_modulus(self) -> int | None:
        if len(self.coeff_modulus) == 1 or not self.has_special:
            return None
        return self.coeff_modulus[-1]


def rebase_coeff_modulus(
    bit_sizes: Sequence[int], poly_degree: int, exclude: Sequence[int],
    with_special: bool = False,
) -> List[int]:
    """Map the reference's prime bit-lengths onto a ≤30-bit limb chain.

    Total bits of the new chain ≤ total of the reference chain (security
    never decreases).  With ``with_special`` the LAST prime is the
    key-switching special prime at SPECIAL_BITS, and the data chain gets
    everything else — maximizing noise headroom inside the same security
    budget (the previous even split gave the special prime a full data-sized
    limb and lost 4-6 data bits; tools/param_sweep.py caught dense-load
    overflows on the tightest reference chains because of it).
    """
    total = int(sum(bit_sizes))
    data_total = total - SPECIAL_BITS if with_special else total
    nlimbs = max(1, math.ceil(data_total / MAX_LIMB_BITS))
    base = data_total // nlimbs
    extra = data_total - base * nlimbs  # this many limbs get one extra bit
    sizes = [base + 1] * extra + [base] * (nlimbs - extra)
    if with_special:
        sizes = sizes + [SPECIAL_BITS]
    assert sum(sizes) == total and max(sizes) <= MAX_LIMB_BITS
    return nt.gen_ntt_primes(sizes, 2 * poly_degree, exclude=list(exclude))


@dataclass(frozen=True)
class PSUParams:
    table_params: TableParams
    item_params: ItemParams
    query_params: QueryParams
    seal_params: SealParams

    # ---- derived (psu_params.cpp:95-180 semantics) ----
    @property
    def poly_degree(self) -> int:
        return self.seal_params.poly_modulus_degree

    @property
    def felts_per_item(self) -> int:
        return self.item_params.felts_per_item

    @property
    def items_per_bundle(self) -> int:
        return self.poly_degree // self.felts_per_item

    @property
    def bins_per_bundle(self) -> int:
        return self.items_per_bundle * self.felts_per_item

    @property
    def bundle_idx_count(self) -> int:
        return -(-self.table_params.table_size // self.items_per_bundle)

    @property
    def item_bit_count_per_felt(self) -> int:
        # floor(log2(t)) usable bits per field element
        return self.seal_params.plain_modulus.bit_length() - 1

    @property
    def item_bit_count(self) -> int:
        return self.item_bit_count_per_felt * self.felts_per_item

    def log2_fpp(self) -> float:
        """False-positive probability exponent (psu_params.h:178-185)."""
        return -self.item_bit_count + math.log2(self.table_params.max_items_per_bin)

    # ---- validation ----
    def validate(self) -> None:
        tp, qp, sp = self.table_params, self.query_params, self.seal_params
        if tp.table_size < self.items_per_bundle:
            # table must fill at least one bundle
            if tp.table_size <= 0:
                raise ValueError("table_size must be positive")
        if 1 not in qp.query_powers:
            raise ValueError("query_powers must contain 1")
        if any(w < 1 or w > tp.max_items_per_bin for w in qp.query_powers):
            raise ValueError("query power out of range [1, max_items_per_bin]")
        if qp.ps_low_degree and qp.ps_low_degree >= tp.max_items_per_bin:
            raise ValueError("ps_low_degree must be < max_items_per_bin")
        if sp.plain_modulus % (2 * sp.poly_modulus_degree) != 1:
            raise ValueError("plain modulus must support batching (t ≡ 1 mod 2N)")
        if self.item_bit_count < 32:
            raise ValueError("item bit count too small")
        needs_mul = max(qp.query_powers) < tp.max_items_per_bin or qp.ps_low_degree
        if needs_mul and len(sp.coeff_modulus) < 2:
            raise ValueError("ct×ct multiply requires a special modulus prime")

    # ---- construction ----
    @staticmethod
    def from_dict(d: Dict) -> "PSUParams":
        tp = d["table_params"]
        table_params = TableParams(
            hash_func_count=int(tp["hash_func_count"]),
            table_size=int(tp["table_size"]),
            max_items_per_bin=int(tp["max_items_per_bin"]),
        )
        item_params = ItemParams(felts_per_item=int(d["item_params"]["felts_per_item"]))
        qp = d["query_params"]
        powers = sorted(set([1] + [int(x) for x in qp["query_powers"]]))
        query_params = QueryParams(
            ps_low_degree=int(qp["ps_low_degree"]), query_powers=tuple(powers)
        )
        sp = d["seal_params"]
        n = int(sp["poly_modulus_degree"])
        if "plain_modulus" in sp and "plain_modulus_bits" in sp:
            raise ValueError("specify only one of plain_modulus / plain_modulus_bits")
        if "plain_modulus" in sp:
            t = int(sp["plain_modulus"])
        elif "plain_modulus_bits" in sp:
            t = nt.gen_batching_prime(int(sp["plain_modulus_bits"]), 2 * n)
        else:
            raise ValueError("missing plain_modulus / plain_modulus_bits")
        ref_bits = tuple(int(b) for b in sp["coeff_modulus_bits"])
        # relinearization (hence a reserved special prime) is needed only when
        # the query powers don't already cover every degree, or PS is on
        covered = set(query_params.query_powers) >= set(
            range(1, table_params.max_items_per_bin + 1)
        )
        needs_relin = query_params.ps_low_degree > 0 or not covered
        needs_relin = needs_relin and len(ref_bits) > 1
        coeff = rebase_coeff_modulus(
            ref_bits, n, exclude=[t], with_special=needs_relin
        )
        seal_params = SealParams(
            poly_modulus_degree=n,
            plain_modulus=t,
            coeff_modulus=tuple(coeff),
            ref_coeff_modulus_bits=ref_bits,
            has_special=needs_relin,
        )
        params = PSUParams(table_params, item_params, query_params, seal_params)
        params.validate()
        return params

    @staticmethod
    def load_json(text: str) -> "PSUParams":
        return PSUParams.from_dict(json.loads(text))

    @staticmethod
    def load_file(path: str) -> "PSUParams":
        with open(path) as f:
            return PSUParams.load_json(f.read())

    def to_dict(self) -> Dict:
        return {
            "table_params": {
                "hash_func_count": self.table_params.hash_func_count,
                "table_size": self.table_params.table_size,
                "max_items_per_bin": self.table_params.max_items_per_bin,
            },
            "item_params": {"felts_per_item": self.item_params.felts_per_item},
            "query_params": {
                "ps_low_degree": self.query_params.ps_low_degree,
                "query_powers": list(self.query_params.query_powers),
            },
            "seal_params": {
                "poly_modulus_degree": self.seal_params.poly_modulus_degree,
                "plain_modulus": self.seal_params.plain_modulus,
                "coeff_modulus_bits": list(self.seal_params.ref_coeff_modulus_bits),
            },
        }

    def to_json(self) -> str:
        return json.dumps(self.to_dict(), indent=2)
