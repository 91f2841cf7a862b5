#!/usr/bin/env python
"""Device-profiler attribution of the warm 16M-4096 query (VERDICT r4 #5).

The in-call split (Receiver.run_query timings=) serializes host dispatch
that the plain call overlaps under device execution, so its "eval_ms" is
~half host dispatch.  This tool captures ONE JAX profiler trace of a warm
query and reports DEVICE time per XLA module: the power wavefront
("ps_powers") and the eval row programs ("ps_eval_rows") are named modules
(engine/evaluator.py), so the attribution is exact — plus everything else
(mask transfer, premul_sum_rhs) and the host-side gap, which together with
the modules must reconcile with the wall-clock warm query within ~10%.

Run on the chip:  timeout 1800 python tools/profile_trace.py
Matches the reference's Stopwatch semantics (common/apsu/util/stopwatch.h:25)
with real device spans instead of wall-clock scopes.
"""

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def _parse_xplane(trace_dir):
    """Sum device-plane XLA-module event durations per module name."""
    try:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2
    except ImportError:
        try:
            from xprof.protobuf import xplane_pb2
        except ImportError:
            from tensorboard_plugin_profile.protobuf import xplane_pb2

    paths = glob.glob(
        os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True
    )
    assert paths, f"no xplane.pb under {trace_dir}"
    modules = {}
    ops = {}       # name -> [total_ps, count]
    span_lo, span_hi = None, None
    for path in paths:
        xs = xplane_pb2.XSpace()
        with open(path, "rb") as f:
            xs.ParseFromString(f.read())
        for plane in xs.planes:
            name = plane.name
            is_device = ("TPU" in name or "/device:" in name) and (
                "Host" not in name
            )
            if not is_device:
                continue
            meta = {mid: em.name for mid, em in plane.event_metadata.items()}
            for line in plane.lines:
                ln = line.name
                for ev in line.events:
                    en = meta.get(ev.metadata_id, "")
                    dur = ev.duration_ps
                    t0 = line.timestamp_ns * 1000 + ev.offset_ps
                    t1 = t0 + dur
                    span_lo = t0 if span_lo is None else min(span_lo, t0)
                    span_hi = t1 if span_hi is None else max(span_hi, t1)
                    if "Module" in ln or ln == "XLA Modules":
                        modules[en] = modules.get(en, 0) + dur
                    elif "Ops" in ln and "Framework" not in ln:
                        # op names carry hlo op: bucket by leading token
                        # (fusion.123 -> fusion; custom-call ... -> pallas)
                        key = en.split(".")[0].split(" ")[0]
                        rec = ops.setdefault(key, [0, 0])
                        rec[0] += dur
                        rec[1] += 1
    return modules, ops, span_lo, span_hi


def main():
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from apsu_tpu.api.parties import QueryRequest, Receiver, _pow_mod
    from apsu_tpu.core.params import PSUParams
    from apsu_tpu.db.measured_levels import query_level
    from apsu_tpu.db.receiver_db import ReceiverDB
    from apsu_tpu.mpc.prg import CsRng
    from apsu_tpu.ops.polyeval import plane_count

    params = PSUParams.load_file("parameters/16M-4096.json")
    tp, qp = params.table_params, params.query_params
    B, C = params.bundle_idx_count, 6
    K, N = tp.max_items_per_bin, params.poly_degree
    t = params.seal_params.plain_modulus

    db = ReceiverDB(params, oprf=None)
    lvl = db.ps_level()
    L = db.bfv.levels[lvl].k
    ph = qp.ps_low_degree + 1
    nh = K // ph
    planes = plane_count(K, qp.ps_low_degree)

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

    rng = CsRng(b"profile-trace-keygen-00001")
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

    recv = Receiver(params, db, rng=CsRng(b"profile-trace-recv-000001"))
    chk = jax.jit(lambda o: jnp.sum(o, dtype=jnp.uint32))

    def one(tag):
        t0 = time.perf_counter()
        resp = recv.run_query(req)
        jax.device_get(chk(resp.results))
        dt = time.perf_counter() - t0
        print(f"[{tag}] {dt * 1e3:.1f} ms", file=sys.stderr, flush=True)
        return dt

    one("first (compile)")
    warm = min(one(f"warm{i}") for i in range(3))

    trace_dir = "/tmp/apsu_trace"
    os.system(f"rm -rf {trace_dir}")
    jax.profiler.start_trace(trace_dir)
    traced_s = one("traced")
    jax.profiler.stop_trace()

    modules, ops, lo, hi = _parse_xplane(trace_dir)
    mod_ms = {
        k: round(v / 1e9, 2) for k, v in sorted(
            modules.items(), key=lambda kv: -kv[1]
        )
    }

    def bucket(pred):
        return round(
            sum(v for k, v in modules.items() if pred(k)) / 1e9, 2
        )

    powers_ms = bucket(lambda k: "ps_powers" in k or "power_tensor" in k)
    eval_ms = bucket(lambda k: "ps_eval_rows" in k)
    other_ms = bucket(
        lambda k: "ps_powers" not in k
        and "power_tensor" not in k
        and "ps_eval_rows" not in k
    )
    device_ms = round(powers_ms + eval_ms + other_ms, 2)
    out = {
        "tool": "profile_trace",
        "config": "16M-4096",
        "warm_query_ms": round(warm * 1e3, 1),
        "traced_query_ms": round(traced_s * 1e3, 1),
        "device_powers_ms": powers_ms,
        "device_eval_ms": eval_ms,
        "device_other_ms": other_ms,
        "device_total_ms": device_ms,
        "host_gap_ms": round(traced_s * 1e3 - device_ms, 1),
        "modules_ms": mod_ms,
        "top_ops_ms": {
            k: {"ms": round(v[0] / 1e9, 2), "count": v[1]}
            for k, v in sorted(ops.items(), key=lambda kv: -kv[1][0])[:20]
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
