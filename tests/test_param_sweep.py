"""CI slice of the noise-margin sweep: the CPU-feasible parameter files
must decrypt exactly at FULL bin load (tools/param_sweep.py runs the whole
set on the chip).  A failure here means that parameter file would produce
silently wrong unions in production."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tools.param_sweep import PARAM_DIR, sweep_one  # noqa: E402

# Small-N, small-K files a CPU finishes in seconds-to-a-minute.  100K-1 is
# one of BASELINE.md's headline configs.
CI_FILES = ["100K-1", "100K-1-16", "256K-1", "1M-1", "16M-1"]


@pytest.mark.slow
@pytest.mark.parametrize("stem", CI_FILES)
def test_param_file_exact_at_full_bin_load(stem):
    r = sweep_one(os.path.join(PARAM_DIR, f"{stem}.json"), n_caches=2)
    assert r["ok"], r
    assert r["n_wrong"] == 0 and r["n_false"] == 0, r
    assert r["noise_budget_bits"] > 0, r
