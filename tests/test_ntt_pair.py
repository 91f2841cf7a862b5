"""Pair-form VMEM NTT kernel (ops/ntt_pair.py, the TPU default for
N >= 2048): bit-identity with the XLA staged NTT and exact round trips,
run through the Pallas interpreter."""

import jax.numpy as jnp
import numpy as np
import pytest

from apsu_tpu.core.nt import gen_ntt_primes
from apsu_tpu.core.ntt import NttContext
from apsu_tpu.ops.ntt_pair import ntt_pair, pair_tables


@pytest.mark.slow
def test_pair_ntt_matches_xla():
    n = 2048
    primes = gen_ntt_primes([28, 27], 2 * n)
    ctx = NttContext(primes, n)
    rng = np.random.default_rng(n)
    L = len(primes)
    x = np.empty((3, L, n), np.uint32)
    for j, p in enumerate(primes):
        x[:, j, :] = rng.integers(0, p, size=(3, n))
    xj = jnp.asarray(x)

    tw_f = pair_tables(ctx.w_pl, ctx.w_sh, n, inverse=False)
    tw_i = pair_tables(ctx.winv_pl, ctx.winv_sh, n, inverse=True)
    p_np = np.asarray(ctx.consts.p, dtype=np.uint32)

    fwd_pair = ntt_pair(xj, tw_f, p_np, interpret=True)
    fwd_xla = ctx.ntt(xj)
    assert jnp.array_equal(fwd_pair, fwd_xla), "forward NTT diverges"

    inv_pair = ntt_pair(
        fwd_pair, tw_i, p_np, inverse=True,
        ninv_np=np.stack([ctx.ninv_pl, ctx.ninv_sh], axis=1), interpret=True,
    )
    inv_xla = ctx.intt(fwd_xla)
    assert jnp.array_equal(inv_pair, inv_xla), "inverse NTT diverges"
    assert jnp.array_equal(inv_pair, xj), "round trip not exact"
