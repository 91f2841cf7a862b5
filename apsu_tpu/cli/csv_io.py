"""CSV input/output (the reference's cli/csv_reader.*: one item per line,
optional label after a comma — labels unused in the union protocol)."""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

from apsu_tpu.hash.items import hash_items

MAX_ITEM_BYTES = 16


def read_items_csv(path: str) -> List[str]:
    out = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            out.append(line.split(",")[0])
    return out


def encode_payloads(strings: List[str]) -> np.ndarray:
    """utf-8 item strings -> [n, 16] uint8 payload blocks (zero padded).

    Items longer than 16 bytes need the ARBITARY-length mode (reference flag
    at common/apsu/log.h:12) — not wired into the CLI yet.
    """
    out = np.zeros((len(strings), MAX_ITEM_BYTES), dtype=np.uint8)
    for i, s in enumerate(strings):
        b = s.encode()
        if len(b) > MAX_ITEM_BYTES:
            raise ValueError(
                f"item {s!r} exceeds {MAX_ITEM_BYTES} bytes; use arbitrary-length mode"
            )
        out[i, : len(b)] = np.frombuffer(b, dtype=np.uint8)
    return out


def decode_payloads(blocks: np.ndarray) -> List[str]:
    out = []
    for row in blocks:
        out.append(bytes(row).rstrip(b"\0").decode(errors="replace"))
    return out


def load_csv(path: str) -> Tuple[np.ndarray, np.ndarray, List[str]]:
    """-> (items [n,2] uint64 hashes, payloads [n,16] uint8, originals)."""
    strings = read_items_csv(path)
    return hash_items(strings), encode_payloads(strings), strings


def write_union_csv(path: str, strings: List[str]) -> None:
    with open(path, "w") as f:
        for s in strings:
            f.write(s + "\n")
