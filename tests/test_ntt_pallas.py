"""Pallas fused-NTT kernel (interpret mode): bit-identity with the XLA
stage-by-stage NTT and exact round trips."""

import jax.numpy as jnp
import numpy as np
import pytest

from apsu_tpu.core.nt import gen_ntt_primes
from apsu_tpu.core.ntt import NttContext
from apsu_tpu.ops.ntt_pallas import ntt_pallas, stage_twiddles


@pytest.mark.slow
@pytest.mark.parametrize("n", [256, 1024])
def test_pallas_ntt_matches_xla(n):
    primes = gen_ntt_primes([28, 27], 2 * n)
    ctx = NttContext(primes, n)
    rng = np.random.default_rng(n)
    L = len(primes)
    x = np.empty((3, L, n), np.uint32)
    for j, p in enumerate(primes):
        x[:, j, :] = rng.integers(0, p, size=(3, n))
    xj = jnp.asarray(x)

    tw_f = stage_twiddles(ctx.w_pl, ctx.w_sh, n, inverse=False)
    tw_i = stage_twiddles(ctx.winv_pl, ctx.winv_sh, n, inverse=True)
    p_np = np.asarray(ctx.consts.p, dtype=np.uint32)

    fwd_pallas = ntt_pallas(xj, tw_f, p_np, interpret=True)
    fwd_xla = ctx.ntt(xj)
    assert jnp.array_equal(fwd_pallas, fwd_xla), "forward NTT diverges"

    inv_pallas = ntt_pallas(
        fwd_pallas, tw_i, p_np, inverse=True,
        ninv_np=np.stack([ctx.ninv_pl, ctx.ninv_sh], axis=1), interpret=True,
    )
    inv_xla = ctx.intt(fwd_xla)
    assert jnp.array_equal(inv_pallas, inv_xla), "inverse NTT diverges"
    assert jnp.array_equal(inv_pallas, xj), "round trip not exact"
