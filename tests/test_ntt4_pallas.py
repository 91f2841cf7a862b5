"""Fused four-step MXU NTT (ops/ntt4_pallas.py): bit-identity with the
XLA staged NTT in both directions and exact round trips, through the
Pallas interpreter (the int8 dot_general path is exact in interpret mode;
MXU exactness is asserted on-chip by tools/ntt_bench.py's ntt4p arm)."""

import jax.numpy as jnp
import numpy as np
import pytest

from apsu_tpu.core.nt import gen_ntt_primes
from apsu_tpu.core.ntt import NttContext
from apsu_tpu.ops.ntt4_pallas import Ntt4pTables, ntt4_pallas


@pytest.mark.slow
def test_ntt4_pallas_matches_xla():
    n = 8192  # the kernel is specific to the production degree
    primes = gen_ntt_primes([28, 27], 2 * n)
    ctx = NttContext(primes, n)
    tb = Ntt4pTables(primes, n)
    rng = np.random.default_rng(42)
    L = len(primes)
    x = np.empty((2, L, n), np.uint32)
    for j, p in enumerate(primes):
        x[:, j, :] = rng.integers(0, p, size=(2, n))
    xj = jnp.asarray(x)

    fwd = ntt4_pallas(xj, tb, interpret=True)
    fwd_xla = ctx.ntt(xj)
    assert jnp.array_equal(fwd, fwd_xla), "forward NTT diverges"

    inv = ntt4_pallas(fwd, tb, inverse=True, interpret=True)
    inv_xla = ctx.intt(fwd_xla)
    assert jnp.array_equal(inv, inv_xla), "inverse NTT diverges"
    assert jnp.array_equal(inv, xj), "round trip not exact"


def test_ntt4p_tables_reject_wide_primes():
    with pytest.raises(AssertionError):
        Ntt4pTables([(1 << 29) + 45], 8192)  # needs < 2^28
