"""The measured-level override table (db/measured_levels.py) must be
content-keyed: an entry applies only to the exact parameter content it was
calibrated against, any edit to the file falls back to the analytic
levels, and APSU_NO_LEVEL_OVERRIDES disables the table entirely.  A wrong
lookup here silently runs a parameter set below its noise floor."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from apsu_tpu.core.params import PSUParams  # noqa: E402
from apsu_tpu.db import measured_levels  # noqa: E402

PARAM_DIR = os.path.join(os.path.dirname(__file__), "..", "parameters")


def _load(stem):
    return PSUParams.load_file(os.path.join(PARAM_DIR, f"{stem}.json"))


def test_key_is_content_not_filename():
    # 16M-4096 and 16M-4096-32 carry identical parameter content on
    # purpose (they differ only in the driver's item bit length)
    assert measured_levels.params_key(_load("16M-4096")) == measured_levels.params_key(
        _load("16M-4096-32")
    )
    assert measured_levels.params_key(_load("16M-4096")) != measured_levels.params_key(
        _load("16M-2048")
    )


def test_lookup_and_env_killswitch(monkeypatch):
    p = _load("16M-4096")
    ov = measured_levels.lookup(p)
    assert ov is not None and ov["ps"] >= ov["result"] >= 1
    monkeypatch.setenv("APSU_NO_LEVEL_OVERRIDES", "1")
    assert measured_levels.lookup(p) is None


def test_any_param_edit_falls_back_to_analytic():
    import dataclasses

    p = _load("16M-4096")
    edited = dataclasses.replace(
        p,
        table_params=dataclasses.replace(
            p.table_params, max_items_per_bin=p.table_params.max_items_per_bin + 1
        ),
    )
    assert measured_levels.lookup(edited) is None, (
        "a calibration entry must not survive a parameter edit"
    )


def test_table_entries_reference_live_configs():
    # every key in the committed table must correspond to a shipped
    # parameter file (stale keys indicate a params change that silently
    # dropped its calibration)
    import glob

    live = {
        measured_levels.params_key(PSUParams.load_file(f))
        for f in glob.glob(os.path.join(PARAM_DIR, "*.json"))
    }
    for key in measured_levels.MEASURED:
        assert key in live, f"stale calibration key {key}"


def test_override_levels_are_at_most_analytic(monkeypatch):
    # the table must only LOWER levels (shedding limbs); a raise would
    # mean the analytic floor moved above a stale measurement
    from apsu_tpu.db.receiver_db import ReceiverDB

    p = _load("16M-4096")
    db = ReceiverDB(p, oprf=None)
    ov = measured_levels.lookup(p)
    monkeypatch.setenv("APSU_NO_LEVEL_OVERRIDES", "1")
    assert ov["ps"] <= db.ps_level()
    assert ov["result"] <= db.result_level()
