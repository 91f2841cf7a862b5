#!/usr/bin/env python
"""Validate the synthetic-cache bench assumption on a REAL 16M-4096 build
(VERDICT r4 next-#6).

bench.py times the warm query against a random synthetic cache, asserting
"throughput is identical to a real cache" because the Montgomery datapath
is data-independent.  This tool checks that once: build the real
16.7M-item DB on chip (~430 s measured in r3), time the warm query, then
swap the SAME ReceiverDB's cache for a synthetic random one (identical
shapes -> identical jit executables) and time again.  One JSON line with
both numbers; bench.py's header cites this artifact instead of asserting.

Run on the chip:  timeout 3600 python tools/real_cache_validate.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from apsu_tpu.api.parties import Receiver, Sender
    from apsu_tpu.core.params import PSUParams
    from apsu_tpu.db.receiver_db import ReceiverDB
    from apsu_tpu.mpc.oprf import DebugOprf
    from apsu_tpu.mpc.prg import CsRng
    from apsu_tpu.ops.polyeval import plane_count

    params = PSUParams.load_file("parameters/16M-4096.json")
    n = int(os.environ.get("APSU_RCV_ITEMS", 1 << 24))
    oprf = DebugOprf(0x16AD)
    rng = np.random.default_rng(0x16AD)

    def log(m):
        print(f"[rcv] {m}", file=sys.stderr, flush=True)

    log(f"generating {n} items + building the REAL DB on chip")
    items = rng.integers(0, 1 << 64, size=(n, 2), dtype=np.uint64)
    db = ReceiverDB(params, oprf)
    t0 = time.perf_counter()
    stats = db.set_data(items, assume_unique=True)
    chk = jax.jit(lambda o: jnp.sum(o, dtype=jnp.uint32))
    jax.device_get(chk(db.coeff_cache))
    build_s = time.perf_counter() - t0
    C = db.coeff_cache.shape[1]
    log(f"built in {build_s:.1f}s: cache {db.coeff_cache.shape}, "
        f"max_bin_load {stats.max_bin_load}")

    qn = 4096
    planted = items[rng.choice(n, size=256, replace=False)]
    fresh = rng.integers(0, 1 << 64, size=(qn - 256, 2), dtype=np.uint64)
    qitems = np.concatenate([planted, fresh])
    rng.shuffle(qitems)
    sender = Sender(params, oprf, rng=CsRng(b"real-cache-validate-send1"))
    req = sender.create_query(qitems)
    recv = Receiver(params, db, rng=CsRng(b"real-cache-validate-recv1"))

    def timeq(tag, iters=3):
        t0 = time.perf_counter()
        resp = recv.run_query(req)
        jax.device_get(chk(resp.results))
        first = time.perf_counter() - t0
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            resp = recv.run_query(req)
            jax.device_get(chk(resp.results))
            times.append(time.perf_counter() - t0)
        log(f"{tag}: first {first:.1f}s warm {min(times):.4f}s")
        return min(times), resp

    real_s, resp = timeq("real cache")

    # exactness spot-check: every filled query slot's match pattern must
    # agree with the DB roots (same oracle as run_256m_grid)
    mat = sender.extract_matrix(resp)
    got_match = mat == recv.last_mask
    qf = sender._query_felts
    filled = np.asarray(sender.cuckoo.filled)
    ipb, fpi = params.items_per_bundle, params.felts_per_item
    roots, counts = db._roots, db._counts
    mism = nmatch = 0
    for s in np.nonzero(filled)[0]:
        b, lane = s // ipb, (s % ipb) * fpi
        want = np.zeros(C, dtype=bool)
        for c in range(C):
            depth = counts[b, c, lane]
            if depth:
                eq = np.ones(depth, dtype=bool)
                for f in range(fpi):
                    eq &= roots[b, c, :depth, lane + f] == qf[s, f]
                want[c] = bool(eq.any())
        nmatch += int(want.sum())
        if not np.array_equal(want, got_match[b, :, lane : lane + fpi]
                              .all(axis=1)):
            mism += 1
    log(f"oracle: {nmatch} true matches, {mism} mismatches")
    assert mism == 0 and nmatch > 0

    # swap in a synthetic random cache of IDENTICAL shape (same jit keys)
    log("swapping in the synthetic cache (same shapes)")
    key = jax.random.PRNGKey(7)
    k1, k2 = jax.random.split(key)
    shape = db.coeff_cache.shape
    cshape = db.ps_const_polys.shape
    db.coeff_cache = None
    import gc

    gc.collect()
    mk = lambda k, shape, hi: jax.random.randint(
        k, shape, 0, hi, dtype=jnp.int32
    ).astype(jnp.uint32)
    db.coeff_cache = mk(k1, shape, 1 << 20)
    db.ps_const_polys = mk(k2, cshape, int(params.seal_params.plain_modulus))
    synth_s, _ = timeq("synthetic cache")

    print(json.dumps({
        "tool": "real_cache_validate",
        "config": "16M-4096",
        "n_items": n,
        "build_s": round(build_s, 1),
        "caches": int(C),
        "real_cache_warm_s": round(real_s, 4),
        "synthetic_cache_warm_s": round(synth_s, 4),
        "delta_pct": round((synth_s / real_s - 1) * 100, 1),
        "date": time.strftime("%Y-%m-%d"),
        "note": "same ReceiverDB object, identical tensor shapes, same "
                "compiled executables; only the cache CONTENT differs",
    }))


if __name__ == "__main__":
    main()
