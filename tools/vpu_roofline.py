#!/usr/bin/env python
"""Measure the chip's ACTUAL ceilings for this workload's primitive ops.

Every hot kernel in apsu_tpu (NTT butterflies, Montgomery/Shoup multiplies,
the eval dot products) is uint32 elementwise work on the VPU; the TPU has
no 64-bit integer datapath, so 32x32 products are 16-bit-limb schoolbook
(core/mod32.py).  "Is the kernel fast" therefore cannot be judged against
the HBM roofline alone — the real ceiling is min(HBM stream, u32-multiply
throughput).  This tool measures both on the real chip with VMEM-resident
Pallas loops:

  stream    : pure HBM copy bandwidth (u32 in -> u32 out)
  mul32     : back-to-back u32 lane multiplies (low 32 bits)
  mul_wide  : full 32x32->64 products (mul_wide: 4 muls + carries)
  mont_mul  : Montgomery modular multiplies (mont_mul: ~9 mul32 + adds)
  shoup_lazy: Shoup multiplies (2 muls + mulhi path)

Prints ops/s (and GB/s for stream) for each; docs/ROOFLINE.md derives the
kernel ceilings from these numbers.  Run on the chip:

    timeout 900 python tools/vpu_roofline.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    import jax

    # env JAX_PLATFORMS is captured too early by the axon sitecustomize;
    # only this config call reliably forces CPU (CLAUDE.md)
    if os.environ.get("APSU_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["APSU_PLATFORM"])
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from apsu_tpu.core.mod32 import mont_mul, mul_wide, shoup_mul_lazy

    # VMEM-resident compute loops: one [8, 512, 128] u32 block (2 MB),
    # REPS back-to-back dependent ops so HBM never enters the measurement.
    # The kernel is additionally iterated OUTER times by a lax.fori_loop
    # INSIDE one jitted call: a single dispatch over the remote tunnel
    # costs ~11 ms (CLAUDE.md), so a one-shot kernel measures the tunnel,
    # not the VPU — the first committed run of this tool read ~24 ms for
    # every op class (= 2 dispatches) regardless of the arithmetic.
    SHAPE = (8, 512, 128)
    ELEMS = int(np.prod(SHAPE))
    REPS = 64
    OUTER = 256

    P = (1 << 28) - 57
    R = 1 << 32
    PNI = (-pow(P, -1, R)) % R

    def k_mul32(x_ref, o_ref):
        x = x_ref[...]
        acc = x
        for _ in range(REPS):
            acc = acc * x + jnp.uint32(1)
        o_ref[...] = acc

    def k_mul_wide(x_ref, o_ref):
        x = x_ref[...]
        acc = x
        for _ in range(REPS):
            hi, lo = mul_wide(acc, x)
            acc = hi ^ lo
        o_ref[...] = acc

    def k_mont(x_ref, o_ref):
        x = x_ref[...]
        p = jnp.uint32(P)
        pni = jnp.uint32(PNI)
        acc = x
        for _ in range(REPS):
            acc = mont_mul(acc, x, p, pni)
        o_ref[...] = acc

    def k_shoup(x_ref, o_ref):
        x = x_ref[...]
        p = jnp.uint32(P)
        acc = x
        for _ in range(REPS):
            acc = shoup_mul_lazy(acc, x, x, p)
        o_ref[...] = acc

    interp = jax.default_backend() == "cpu"

    def run_kernel(kern, name, ops_per_rep):
        f = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct(SHAPE, jnp.uint32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
            interpret=interp,
        )
        x = jnp.asarray(
            np.random.default_rng(0).integers(1, 1 << 28, SHAPE, np.uint64)
        ).astype(jnp.uint32)

        # OUTER chained kernel invocations inside ONE dispatch: the output
        # feeds the next iteration so nothing is elided, and the per-call
        # tunnel latency amortizes to noise
        def many(v):
            return jax.lax.fori_loop(0, OUTER, lambda i, a: f(a), v)

        chk = jax.jit(lambda o: jnp.sum(o, dtype=jnp.uint32))
        g = jax.jit(many)
        jax.device_get(chk(g(x)))
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            jax.device_get(chk(g(x)))
            times.append(time.perf_counter() - t0)
        dt = min(times)
        n_ops = ELEMS * REPS * OUTER
        print(
            f"{name:10s} {dt * 1e3:8.3f} ms  "
            f"{n_ops * ops_per_rep / dt / 1e9:8.1f} G op/s  "
            f"({n_ops / dt / 1e9:6.2f} G {name}/s)"
        )
        return n_ops / dt

    # HBM stream: T dependent full-array traversals inside ONE jitted call
    # (v -> v+1 chained), so the ~11 ms dispatch and the checksum read
    # amortize over T x 2 GB of real traffic
    big = jnp.asarray(
        np.random.default_rng(1).integers(0, 1 << 30, (1 << 28,), np.uint64)
    ).astype(jnp.uint32)  # 1 GB
    T = 16
    cp = jax.jit(
        lambda v: jax.lax.fori_loop(0, T, lambda i, a: a + jnp.uint32(1), v)
    )
    chk = jax.jit(lambda o: jnp.sum(o, dtype=jnp.uint32))
    jax.device_get(chk(cp(big)))
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        jax.device_get(chk(cp(big)))
        times.append(time.perf_counter() - t0)
    # the timed window includes the chk() full-array read (1 extra GB of
    # traffic) — count it so counted traffic == timed traffic (ADVICE r3)
    bw = (T * 2 * big.nbytes + big.nbytes) / min(times)
    print(f"stream     {min(times) * 1e3:8.3f} ms  {bw / 1e9:8.1f} GB/s r+w")

    # ops_per_rep: lane-visible u32 ALU ops per element per rep (counted
    # from core/mod32.py lowering: mul32=2 (mul+add), mul_wide=~14 (4 muls
    # + shifts/masks/adds), mont_mul=~24, shoup_lazy=~12)
    run_kernel(k_mul32, "mul32", 2)
    run_kernel(k_mul_wide, "mul_wide", 14)
    run_kernel(k_mont, "mont_mul", 24)
    run_kernel(k_shoup, "shoup_lazy", 12)


if __name__ == "__main__":
    main()
