"""Benchmark: production PS query throughput on the 16M-4096 workload.

Times the receiver's FULL online phase — ``Receiver.run_query`` on a real
encrypted query through the production Paterson-Stockmeyer pipeline (power
wavefront: 6 source powers -> x^1..x^44 and y^1..y^28 with batched BEHZ
multiplies + relinearizations; then per-(bundle, cache) inner dot products,
batched BEHZ outer products, one relinearization, mod-switch, masking) at
the exact 16M-4096 shape: N=8192, K=1304, ps_low_degree=44, 4 bundle
indices × 6 caches = 24 bundle evaluations per query (reference hot stack:
receiver_osn.cpp:140-540 + bin_bundle.cpp:192-360).

The coefficient cache is synthetic random data at the correct shapes/levels.
MEASURED equivalent to a real cache, not assumed: tools/real_cache_validate.py
built the real 16.7M DB on chip and timed the warm query against the real
cache (166.1 ms) and a same-shape synthetic one (173.1 ms) through the SAME
executables — a 4.2% delta within run variance, with the per-slot match
oracle exact on the real cache (REAL_CACHE_16M.json, 2026-08-21).

Robustness: the axon remote compiler's latency is erratic (the same kernel
has compiled in 70 s and in 28 min on this machine), so each phase runs in
a SUBPROCESS under its own deadline and the parent always prints one JSON
line with the best metric that finished — the driver's `timeout 600` must
never end the round with no output.

Baseline (vs_baseline denominators): the reference repo publishes no
measured numbers (BASELINE.md), so the denominator is MEASURED by
tools/baseline_referee.cpp — a single-threaded C++ implementation of the
reference's SEAL hot-op inventory (Barrett/Shoup modmul, Harvey NTT, BEHZ
ct×ct, RNS relinearization) assembled with the exact 16M-4096 op counts
and scaled by the documented 32-thread server assumption with PERFECT
thread scaling (generous to the reference).  The committed measurement
lives in BASELINE_MEASURED.json (refresh: python tools/measure_baseline.py);
the old per-op napkin estimates (20 / 41 bundles/s, rounds 1-2) remain
below as fallbacks and are reported in `extra` for round-over-round
continuity.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.
"""

import json
import os
import subprocess
import sys
import time

REF_BASELINE_BUNDLES_PER_SEC = 41.0   # napkin hot-kernel fallback (r1/r2)
REF_BASELINE_FULL_QUERY_BPS = 20.0    # napkin full-query fallback (r1/r2)
_BASELINE_SRC = "napkin estimate (see header)"
try:
    with open(
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "BASELINE_MEASURED.json")
    ) as _f:
        _m = json.load(_f)
    REF_BASELINE_BUNDLES_PER_SEC = float(_m["hot_kernel_bundles_per_sec_32t"])
    REF_BASELINE_FULL_QUERY_BPS = float(_m["full_query_bundles_per_sec_32t"])
    _BASELINE_SRC = (
        f"measured referee (tools/baseline_referee.cpp on "
        f"{_m['provenance']['cpu']}, {_m['provenance']['date']}, 32-thread "
        f"perfect scaling)"
    )
except Exception:
    pass
TIME_BUDGET_S = float(os.environ.get("APSU_BENCH_BUDGET_S", 560.0))
_T0 = time.perf_counter()
# cold-vs-warm honesty: record whether the persistent compile cache had
# entries when this run started (first_call_s with a warm cache is the
# serve-loop's realistic cold-process startup; with a cold cache it is
# the full remote compile)
_CACHE_WAS_WARM = bool(
    os.path.isdir("/root/repo/.jax_cache") and os.listdir("/root/repo/.jax_cache")
)


def _left() -> float:
    return TIME_BUDGET_S - (time.perf_counter() - _T0)


def _log(msg: str) -> None:
    print(f"[bench +{time.perf_counter() - _T0:6.1f}s] {msg}", file=sys.stderr)


def _phase_hot() -> dict:
    """Hot-kernel metric: the batched matching-poly eval kernel alone at the
    16M-4096 shape (deg-1304 dot product; round-1's headline kernel)."""
    import jax
    import jax.numpy as jnp

    from apsu_tpu.core.params import PSUParams
    from apsu_tpu.db.receiver_db import ReceiverDB
    from apsu_tpu.engine.evaluator import eval_matching_polys
    from apsu_tpu.ops.polyeval import DEG_CHUNK

    params = PSUParams.load_file("parameters/16M-4096.json")
    bfv = ReceiverDB(params, oprf=None).bfv
    B, C = 4, 6
    K, N = params.table_params.max_items_per_bin, params.poly_degree
    lvl = min(3, len(bfv.q_primes))
    L = lvl
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    mk = lambda k, shape: jax.random.randint(
        k, shape, 0, 1 << 20, dtype=jnp.int32
    ).astype(jnp.uint32)
    planes = (K + 1 + DEG_CHUNK - 1) // DEG_CHUNK * DEG_CHUNK
    powers = mk(k1, (B, K, 2, L, N))
    cache = mk(k2, (B, C, planes, L, N))
    const_s = mk(k3, (B, C, N)) % jnp.uint32(bfv.t)
    mask_s = mk(k4, (B, C, N)) % jnp.uint32(bfv.t)
    # NOTE: block_until_ready is unreliable over the axon tunnel; force
    # completion with a scalar checksum readback.
    chk = jax.jit(lambda o: jnp.sum(o, dtype=jnp.uint32))
    out = eval_matching_polys(bfv, powers, cache, const_s, mask_s, lvl)
    jax.device_get(chk(out.data))
    _log("hot: first call done")

    # explicit HBM roofline accounting for the dominant kernel
    # (ops/polyeval.py eval_dot_pallas): the cache streams exactly once;
    # the power tensor is re-fetched once per cache BLOCK (cb consecutive
    # caches share one fetch since the r3 grid blocking); the accumulator
    # writes back once per row per degree chunk.  v5e peak ~819 GB/s.
    from apsu_tpu.ops.polyeval import _pick_cache_block

    cb = _pick_cache_block(C, L, N)
    bytes_cache = B * C * planes * L * N * 4
    bytes_powers = B * (C // cb) * planes * 2 * L * N * 4
    bytes_out = B * C * (planes // DEG_CHUNK) * 2 * L * N * 4 * 2  # r+w
    hbm_bytes = bytes_cache + bytes_powers + bytes_out

    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        out = eval_matching_polys(bfv, powers, cache, const_s, mask_s, lvl)
        jax.device_get(chk(out.data))
        times.append(time.perf_counter() - t0)
        # interim line after EVERY iteration: a deadline kill still leaves
        # the parent a parseable measurement in the captured stdout
        print(
            json.dumps(
                {
                    "hot_bundles_per_sec": B * C / min(times),
                    "hot_bundles_per_sec_mean": B * C
                    / (sum(times) / len(times)),
                    "agg": f"best-of-{len(times)}",
                    "hot_hbm_gbps": round(hbm_bytes / min(times) / 1e9, 1),
                    "hot_hbm_util_vs_819": round(
                        hbm_bytes / min(times) / 819e9, 3
                    ),
                }
            ),
            flush=True,
        )
    return {
        "hot_bundles_per_sec": B * C / min(times),
        "hot_bundles_per_sec_mean": B * C / (sum(times) / len(times)),
        "agg": f"best-of-{len(times)}",
        "hot_hbm_gbps": round(hbm_bytes / min(times) / 1e9, 1),
        "hot_hbm_util_vs_819": round(hbm_bytes / min(times) / 819e9, 3),
    }


def _phase_ps() -> dict:
    """Production PS warm query (Receiver.run_query) at the 16M-4096 shape."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from apsu_tpu.api.parties import QueryRequest, Receiver, _pow_mod
    from apsu_tpu.core.params import PSUParams
    from apsu_tpu.db.receiver_db import ReceiverDB
    from apsu_tpu.mpc.prg import CsRng
    from apsu_tpu.ops.polyeval import plane_count

    params = PSUParams.load_file("parameters/16M-4096.json")
    tp, qp = params.table_params, params.query_params
    B, C = params.bundle_idx_count, 6  # 6 caches/bundle at 16.7M items (r1)
    K, N = tp.max_items_per_bin, params.poly_degree
    t = params.seal_params.plain_modulus

    db = ReceiverDB(params, oprf=None)
    lvl = db.ps_level()
    L = db.bfv.levels[lvl].k
    ph = qp.ps_low_degree + 1
    nh = K // ph
    planes = plane_count(K, qp.ps_low_degree)

    # synthetic cache at production shapes/levels (values irrelevant for
    # throughput; generated on device to skip a multi-GB host transfer)
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    mk = lambda k, shape, hi: jax.random.randint(
        k, shape, 0, hi, dtype=jnp.int32
    ).astype(jnp.uint32)
    db.coeff_cache = mk(k1, (B, C, planes, L, N), 1 << 20)
    db.ps_const_polys = mk(k2, (B, C, nh + 1, N), int(t))
    db.const_slots = None
    db.eval_lvl = lvl
    db.result_lvl = db.result_level()

    # real encrypted query: source powers of a random query vector, at the
    # production fresh-query level (measured_levels "query" knob)
    from apsu_tpu.db.measured_levels import query_level

    rng = CsRng(b"bench-16M-4096-query-key0")
    bfv = db.bfv
    sk = bfv.gen_secret_key(rng)
    ql = query_level(params, len(bfv.q_primes))
    rk = bfv.gen_relin_key(sk, rng, level=ql)
    qvec = np.asarray(
        rng.integers(1, t, size=(B, N), dtype=np.uint64)
    ).astype(np.uint32)
    plist = tuple(qp.query_powers)
    stack = np.stack(
        [_pow_mod(qvec.astype(np.uint64), s, t).astype(np.uint32) for s in plist]
    )
    ct = bfv.encrypt_symmetric(bfv.encode(stack), sk, rng, level=ql)
    req = QueryRequest(power_list=plist, powers_data=ct.data, relin_key=rk.ksk)
    recv = Receiver(params, db, rng=CsRng(b"bench-16M-4096-recv-key0"))

    chk = jax.jit(lambda o: jnp.sum(o, dtype=jnp.uint32))
    _log("ps: setup done, first query (compiles)")
    t0 = time.perf_counter()
    resp = recv.run_query(req)
    jax.device_get(chk(resp.results))
    compile_s = time.perf_counter() - t0
    _log(f"ps: first call {compile_s:.1f}s")
    # interim line BEFORE the first warm iteration: a kill between compile
    # and first warm measurement still reports the compile time (ADVICE r2)
    print(
        json.dumps(
            {"ps_first_call_s": compile_s, "bundles_per_query": B * C}
        ),
        flush=True,
    )
    deadline = float(os.environ.get("APSU_BENCH_PHASE_LEFT_S", 1e9))
    iters = 3 if deadline - (time.perf_counter() - t0) > 60 else 1
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        resp = recv.run_query(req)
        jax.device_get(chk(resp.results))
        times.append(time.perf_counter() - t0)
        # interim line per iteration (rescued by the parent on a kill)
        print(
            json.dumps(
                {
                    "ps_warm_s": min(times),
                    "ps_warm_s_mean": sum(times) / len(times),
                    "agg": f"best-of-{len(times)}",
                    "ps_first_call_s": compile_s,
                    "bundles_per_query": B * C,
                }
            ),
            flush=True,
        )

    # phase split measured INSIDE the real run_query (a device sync between
    # the power wavefront and the eval stage): powers_s + eval_s equals the
    # instrumented call's wall time by construction, so the split explains
    # the warm total instead of overstating it (BENCH_r03's re-dispatched
    # split summed to 271 ms against a 206 ms query — the stages overlap
    # host dispatch with device execution; the sync serializes that, so
    # split_total_ms runs slightly ABOVE the uninstrumented headline)
    split = {}
    try:
        tms = []
        for _ in range(2):
            tm = {}
            recv.run_query(req, timings=tm)
            tms.append(tm)
        best = min(tms, key=lambda d: d["powers_s"] + d["eval_s"])
        split = {
            "powers_ms": round(best["powers_s"] * 1e3, 1),
            "eval_ms": round(best["eval_s"] * 1e3, 1),
            "split_total_ms": round(
                (best["powers_s"] + best["eval_s"]) * 1e3, 1
            ),
        }
    except Exception as e:  # the headline number is already banked
        split = {"split_error": repr(e)}

    return {
        "ps_warm_s": min(times),
        "ps_warm_s_mean": sum(times) / len(times),
        "agg": f"best-of-{len(times)}",
        "ps_first_call_s": compile_s,
        "bundles_per_query": B * C,
        **split,
    }


_PHASES = {"hot": _phase_hot, "ps": _phase_ps}


def _run_phase_subprocess(name: str, deadline_s: float) -> dict | None:
    """Run one phase in a child python; return its JSON dict or None."""
    if deadline_s < 30:
        return None
    env = dict(os.environ)
    env["APSU_BENCH_PHASE_LEFT_S"] = str(deadline_s)
    stdout = b""
    try:
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--phase", name],
            capture_output=True,
            timeout=deadline_s,
            env=env,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        stdout = r.stdout or b""
        sys.stderr.write(r.stderr.decode(errors="replace"))
        if r.returncode != 0:
            _log(f"phase {name}: exit {r.returncode}")
    except subprocess.TimeoutExpired as e:
        # children print an interim JSON line after EVERY completed
        # measurement — rescue the last one from the captured partial output
        _log(f"phase {name}: killed at {deadline_s:.0f}s deadline")
        stdout = e.stdout or b""
        if e.stderr:
            sys.stderr.write(e.stderr.decode(errors="replace"))
    for line in reversed(stdout.decode(errors="replace").strip().splitlines()):
        try:
            parsed = json.loads(line)
        except Exception:
            continue
        # a stray numeric/string stdout line parses as JSON too — only a
        # dict with a known measurement key is a real result (ADVICE r2)
        if isinstance(parsed, dict) and (
            "hot_bundles_per_sec" in parsed or "bundles_per_query" in parsed
        ):
            return parsed
    _log(f"phase {name}: no parseable measurement")
    return None


def main():
    if len(sys.argv) == 3 and sys.argv[1] == "--phase":
        # child mode: run one phase, print its JSON dict
        import jax

        try:
            jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        except Exception:
            pass
        print(json.dumps(_PHASES[sys.argv[2]]()))
        return

    # parent mode: orchestrate phases under the global budget.  The
    # production PS query — the HEADLINE — runs FIRST with most of the
    # budget: its all-Pallas program compiles in ~325 s cold (measured
    # 2026-08-20 after the 28-bit Bsk default), which fits the driver's
    # 600 s budget only if nothing runs before it (the old hot-first
    # order burned 240 s on the secondary metric and banked 0.0).  The
    # hot-kernel metric takes whatever remains; a deadline kill still
    # yields the last interim measurement via the rescued child stdout.
    _log("phase 1: production PS query (subprocess)")
    ps = _run_phase_subprocess("ps", _left() - 70)

    _log("phase 2: hot-kernel metric (subprocess)")
    hot = _run_phase_subprocess("hot", _left() - 10)
    hot_bundles = hot["hot_bundles_per_sec"] if hot else None
    if hot_bundles:
        _log(f"hot kernel: {hot_bundles:.1f} bundles/s")

    if ps is not None and "ps_warm_s" in ps:
        bundles_per_sec = ps["bundles_per_query"] / ps["ps_warm_s"]
        out = {
            "metric": "production PS warm-query throughput (16M-4096)",
            "value": round(bundles_per_sec, 2),
            "unit": "bundles/sec/chip",
            "vs_baseline": round(bundles_per_sec / REF_BASELINE_FULL_QUERY_BPS, 2),
            "extra": {
                "warm_query_s": round(ps["ps_warm_s"], 4),
                "warm_query_s_mean": round(
                    ps.get("ps_warm_s_mean", ps["ps_warm_s"]), 4
                ),
                "agg": ps.get("agg", "best"),
                "first_call_s": round(ps["ps_first_call_s"], 1),
                "compile_cache_warm": _CACHE_WAS_WARM,
                "bundles_per_query": ps["bundles_per_query"],
                "powers_ms": ps.get("powers_ms"),
                "eval_ms": ps.get("eval_ms"),
                "hot_kernel_bundles_per_sec": (
                    round(hot_bundles, 1) if hot_bundles else None
                ),
                "hot_hbm_gbps": (hot or {}).get("hot_hbm_gbps"),
                "hot_hbm_util_vs_819": (hot or {}).get("hot_hbm_util_vs_819"),
                "baseline_note": f"denominator "
                f"{REF_BASELINE_FULL_QUERY_BPS:.2f} bundles/s = "
                f"{_BASELINE_SRC}; reference FULL PS query (powers + "
                f"eval_patstock)",
                "vs_napkin_estimate_r1r2": round(bundles_per_sec / 20.0, 2),
                "includes": "powers wavefront + PS eval + mask (Receiver.run_query)",
            },
        }
    elif hot_bundles is not None:
        out = {
            "metric": "sender homomorphic-eval throughput (16M-4096 shape)",
            "value": round(hot_bundles, 2),
            "unit": "bundles/sec/chip",
            "vs_baseline": round(hot_bundles / REF_BASELINE_BUNDLES_PER_SEC, 2),
            "extra": {
                "note": "production PS metric skipped (compile budget); "
                "kernel-only number, see bench.py phase 2",
                "baseline_note": f"denominator "
                f"{REF_BASELINE_BUNDLES_PER_SEC:.2f} bundles/s = "
                f"{_BASELINE_SRC}",
            },
        }
    else:
        out = {
            "metric": "sender homomorphic-eval throughput (16M-4096 shape)",
            "value": 0.0,
            "unit": "bundles/sec/chip",
            "vs_baseline": 0.0,
            "extra": {
                "note": "remote compiler exceeded every phase deadline this "
                "run (known-erratic: 70s-28min for identical kernels); "
                "see BENCH_r01.json / README for measured numbers",
            },
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
