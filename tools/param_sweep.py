#!/usr/bin/env python
"""Noise-margin sweep over the parameter files (VERDICT round 1, next #3).

For every parameter file: build a synthetic DB with EVERY bin packed to
``max_items_per_bin`` (the densest load the file permits — dense bundles
measure ~10 bits worse than sparse ones), run one real query through the
production evaluator path, and assert exact decryption of every planted
match, reporting the residual invariant-noise budget.  A failing file would
produce silently wrong unions in production (a masked match decrypting
wrong, or garbage colliding with the mask).

The reference gets this guarantee implicitly from SEAL's parameter
selection (/root/reference/common/apsu/psu_params.cpp:95-180); our re-based
≤30-bit chains must prove theirs by measurement.

CPU-feasible files run in CI (tests/test_param_sweep.py); the full sweep
runs on the chip:

    python tools/param_sweep.py                 # all files
    python tools/param_sweep.py 100K-1 256K-512 # subset
    python tools/param_sweep.py --max-degree 64 # skip big-K files
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

PARAM_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "parameters")


def sweep_one(path: str, n_caches: int = 2, seed: int = 0) -> dict:
    from apsu_tpu.core.params import PSUParams
    from apsu_tpu.engine.probe import dense_query_probe

    params = PSUParams.load_file(path)
    t0 = time.perf_counter()
    res = dense_query_probe(params, np.random.default_rng(seed), n_caches=n_caches)
    return {
        "file": os.path.basename(path),
        "ok": bool(res.exact and res.n_matched > 0),
        "n_matched": res.n_matched,
        "n_wrong": res.n_wrong,
        "n_false": res.n_false,
        "noise_budget_bits": round(res.noise_budget_bits, 1),
        "eval_level": res.eval_level,
        "result_level": res.result_level,
        "seconds": round(time.perf_counter() - t0, 1),
    }


def main(argv=None):
    ap = argparse.ArgumentParser(description="apsu_tpu parameter noise sweep")
    ap.add_argument("names", nargs="*", help="parameter file stems (default: all)")
    ap.add_argument("--max-degree", type=int, default=None,
                    help="skip files with max_items_per_bin above this")
    ap.add_argument("--caches", type=int, default=2)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--json-out", default=None)
    args = ap.parse_args(argv)

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    if args.names:
        files = [os.path.join(PARAM_DIR, f"{n}.json") for n in args.names]
    else:
        files = sorted(glob.glob(os.path.join(PARAM_DIR, "*.json")))
    if args.max_degree is not None:
        from apsu_tpu.core.params import PSUParams

        files = [
            f
            for f in files
            if PSUParams.load_file(f).table_params.max_items_per_bin
            <= args.max_degree
        ]

    results = []
    failed = []
    for f in files:
        try:
            r = sweep_one(f, n_caches=args.caches)
        except Exception as e:  # a build/validate error is also a failure
            r = {"file": os.path.basename(f), "ok": False, "error": str(e)}
        results.append(r)
        status = "OK " if r["ok"] else "FAIL"
        print(f"{status} {json.dumps(r)}", flush=True)
        if not r["ok"]:
            failed.append(r["file"])

    if args.json_out:
        with open(args.json_out, "w") as fh:
            json.dump(results, fh, indent=2)
    print(f"\n{len(results) - len(failed)}/{len(results)} parameter files exact "
          f"at full bin load")
    if failed:
        print("FAILED:", ", ".join(failed))
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
