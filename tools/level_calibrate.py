#!/usr/bin/env python
"""Measure how many evaluation levels a parameter set can shed.

Every retained RNS limb costs ~1/L of the whole online phase (all NTT /
BEHZ / relin work is per-limb), so the analytic levels' safety margin is
paid in query latency.  For each config this tool runs the worst-case
dense probe (engine/probe.py: every bin at max_items_per_bin, production
query path) at progressively LOWER levels and reports the lowest setting
that stays exact with ≥ MIN_BUDGET_BITS of residual budget — the entry to
record in apsu_tpu/db/measured_levels.py.

Run on the chip:

    python tools/level_calibrate.py 16M-4096 [more stems...]

PS configs descend (ps-1, result-1) repeatedly while accepted, then take
one asymmetric refinement step; non-PS configs descend eval-1 repeatedly.
Finally the fresh-query encryption level descends from the full chain
toward the eval/ps floor (upload bytes + the power wavefront scale in it).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["APSU_NO_LEVEL_OVERRIDES"] = "1"  # measure from the analytic base

import numpy as np  # noqa: E402

PARAM_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "parameters"
)


def probe_at(params, levels: dict, seed: int = 0):
    """Run the dense probe with a temporary override table entry."""
    from apsu_tpu.db import measured_levels
    from apsu_tpu.engine.probe import dense_query_probe

    key = measured_levels.params_key(params)
    saved = os.environ.pop("APSU_NO_LEVEL_OVERRIDES", None)
    measured_levels.MEASURED[key] = dict(levels)
    try:
        return dense_query_probe(params, np.random.default_rng(seed), n_caches=2)
    finally:
        measured_levels.MEASURED.pop(key, None)
        if saved:
            os.environ["APSU_NO_LEVEL_OVERRIDES"] = saved


def calibrate(stem: str) -> dict:
    from apsu_tpu.core.params import PSUParams
    from apsu_tpu.db.measured_levels import MIN_BUDGET_BITS, params_key
    from apsu_tpu.db.receiver_db import ReceiverDB

    params = PSUParams.load_file(os.path.join(PARAM_DIR, f"{stem}.json"))
    db = ReceiverDB(params, oprf=None)
    uses_ps = params.query_params.ps_low_degree > 0
    out = {"file": stem, "key": params_key(params)}
    def try_one(cand) -> bool:
        t0 = time.perf_counter()
        try:
            r = probe_at(params, cand)
        except Exception as e:  # noqa: BLE001 — chip OOM etc.: report + skip
            print(f"  {stem} {cand}: ERROR {e}", flush=True)
            return False
        dt = time.perf_counter() - t0
        ok = r.exact and r.n_matched > 0 and r.noise_budget_bits >= MIN_BUDGET_BITS
        print(
            f"  {stem} {cand}: exact={r.exact} wrong={r.n_wrong} "
            f"budget={r.noise_budget_bits:.1f} ({dt:.0f}s) "
            f"{'ACCEPT' if ok else 'reject'}",
            flush=True,
        )
        if ok:
            out["accepted"] = dict(cand)
            out["budget"] = r.noise_budget_bits
        return ok

    # iterative descent: keep shedding a level from each knob while the
    # probe stays exact with margin (the floor often binds only several
    # levels below the analytic pick).  A committed MEASURED entry short-
    # circuits the already-calibrated knobs (APSU_RECALIBRATE=1 redoes all).
    from apsu_tpu.db.measured_levels import MEASURED

    k = len(db.bfv.q_primes)
    known = MEASURED.get(params_key(params))
    if known and not os.environ.get("APSU_RECALIBRATE"):
        out["base"] = {"known": dict(known)}
        best = {kk: v for kk, v in known.items() if kk != "query"}
        floor = known.get("ps", known.get("eval", 1))
        ql = known.get("query", k)
        while ql - 1 >= floor and try_one({**best, "query": ql - 1}):
            ql -= 1
        if "accepted" not in out:  # nothing below the known point held
            out["accepted"] = dict(known)
        # at_eval: run the power wavefront directly at the eval/ps level
        # (the mod-switch floor enters BEFORE the DAG — measure it)
        if "at_eval" not in out["accepted"] and ql > floor:
            if try_one({**out["accepted"], "at_eval": 1}):
                pass  # try_one recorded the accepted dict
        # defer_relin: terminal DAG products relinearize once at the eval
        # level (the gadget noise enters at the smaller modulus — measure)
        if uses_ps and "defer_relin" not in out["accepted"]:
            if try_one({**out["accepted"], "defer_relin": 1}):
                pass
        return out
    if uses_ps:
        ps0, r0 = db.ps_level(), db.result_level()
        out["base"] = {"ps": ps0, "result": r0}
        ps, r = ps0, r0
        while ps > 1 and r > 1 and try_one({"ps": ps - 1, "result": r - 1}):
            ps, r = ps - 1, r - 1
        # one asymmetric refinement step from the best point
        if r > 1 and try_one({"ps": ps, "result": r - 1}):
            r -= 1
        elif ps > 1 and ps > r and try_one({"ps": ps - 1, "result": r}):
            ps -= 1
        floor, best = ps, {"ps": ps, "result": r}
    else:
        e0 = db.eval_level()
        out["base"] = {"eval": e0}
        e = e0
        while e > 1 and try_one({"eval": e - 1}):
            e -= 1
        floor, best = e, {"eval": e}
    # query-level descent: the sender's fresh-encryption level (upload
    # bytes + the whole power wavefront scale in it).  Must stay ≥ the
    # eval/ps level (the wavefront mod-switches DOWN into it).
    ql = k
    while ql - 1 >= floor and try_one({**best, "query": ql - 1}):
        ql -= 1
    # at_eval refinement from whatever point was accepted (see above)
    acc = out.get("accepted", dict(best))
    if ql > floor and try_one({**acc, "at_eval": 1}):
        pass
    if uses_ps and "defer_relin" not in out.get("accepted", {}):
        if try_one({**out.get("accepted", dict(best)), "defer_relin": 1}):
            pass
    return out


def main(argv=None):
    args = list(argv or sys.argv[1:])
    if "--cpu" in args:
        # the probe is deterministic (all randomness comes from the seeded
        # host rng), so a CPU measurement is bit-identical to the chip's
        args.remove("--cpu")
        import jax

        jax.config.update("jax_platforms", "cpu")
    stems = args or ["16M-4096"]
    results = [calibrate(s) for s in stems]
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
