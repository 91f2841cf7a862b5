"""Measured evaluation-level overrides for specific parameter sets.

The analytic level selectors (``ReceiverDB.eval_level/ps_level/
result_level``) carry safety margins sized for the WORST configuration, so
on well-behaved chains they leave whole unused limbs of headroom — and
every retained limb costs ~1/L of the whole online-phase compute (all NTT
/ BEHZ / relin work is per-limb) plus result bytes on the wire.

This table records LOWER levels that were measured safe on the real chip:
``tools/level_calibrate.py`` re-runs the worst-case dense probe
(engine/probe.py — every bin at max_items_per_bin, production query path)
at candidate levels and only emits an entry when decryption stays exact
with ≥ MIN_BUDGET_BITS of residual invariant-noise budget.  The override
is keyed by the full parameter content (not the file name), so any edit
to a parameter file safely falls back to the analytic levels.

The reference's analogue is SEAL's per-parameter-set chain-index choice
inside eval_patstock (/root/reference/receiver/apsu/bin_bundle.cpp:192-360
operates at a fixed chain depth picked by psu_params.cpp); here the choice
is per-file and measurement-backed.

Set APSU_NO_LEVEL_OVERRIDES=1 to ignore the table (calibration runs do).
"""

from __future__ import annotations

import hashlib
import json
import os
from typing import Dict, Optional

MIN_BUDGET_BITS = 6.0  # calibration refuses entries with less residual room


def params_key(params) -> str:
    """Stable content key of a PSUParams (independent of file name)."""
    blob = json.dumps(params.to_dict(), sort_keys=True).encode()
    return hashlib.blake2b(blob, digest_size=8).hexdigest()


# key -> {"ps": int, "result": int, "eval": int} (any subset).  Each entry
# cites the calibration measurement (chip, dense full-bin probe).
MEASURED: Dict[str, Dict[str, int]] = {}


def lookup(params) -> Optional[Dict[str, int]]:
    if os.environ.get("APSU_NO_LEVEL_OVERRIDES"):
        return None
    return MEASURED.get(params_key(params))
