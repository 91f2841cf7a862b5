"""Query-power computation and the batched matching-polynomial evaluator.

This is the receiver's online hot path, replacing the reference's
``Receiver::ComputePowers`` + ``ProcessBinBundleCache`` +
``BatchedPlaintextPolyn::eval`` stack (/root/reference/receiver/apsu/
receiver_osn.cpp:395-540, bin_bundle.cpp:106-174): instead of one thread task
per (bundle_idx, cache) evaluating SEAL ops, ALL bundle indices and caches
evaluate in a single fused device kernel — the dot product over the degree
axis runs as a fori_loop of elementwise Montgomery multiply-accumulates over
``[B, C, 2, L, N]`` accumulators, reading the HBM-resident coefficient cache
once (HBM-bandwidth-bound by design).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from apsu_tpu.core.bfv import BfvContext, Ciphertext, RelinKey
from apsu_tpu.core.mod32 import add_mod, mont_mul
from apsu_tpu.engine.powers import PowerSchedule, QueryPlan


def compute_power_tensor(
    bfv: BfvContext,
    source_cts: Dict[int, Ciphertext],
    schedule: PowerSchedule,
    relin_key: Optional[RelinKey],
    eval_level: int,
) -> jnp.ndarray:
    """Run the wavefront schedule, returning NTT powers [D, ..., 2, Le, N].

    source_cts: {power: Ciphertext} fresh query ciphertexts (coeff domain,
    full level), identically batched.  Each schedule level executes as one
    batched multiply + one batched relinearize over the level's targets.
    """
    have: Dict[int, Ciphertext] = dict(source_cts)
    for level in schedule.levels:
        lhs = jnp.stack([have[a].data for (_, a, _) in level])
        rhs = jnp.stack([have[b].data for (_, _, b) in level])
        k = bfv.q.k
        prod = bfv.multiply(
            Ciphertext(lhs, is_ntt=False, level=k),
            Ciphertext(rhs, is_ntt=False, level=k),
        )
        if relin_key is None:
            raise ValueError("power schedule requires relinearization keys")
        rel = bfv.relinearize(prod, relin_key)
        for i, (tgt, _, _) in enumerate(level):
            have[tgt] = Ciphertext(rel.data[i], is_ntt=False, level=k)

    # mod-switch every power to the evaluation level and NTT-transform
    stack = jnp.stack(
        [have[p].data for p in range(1, schedule.max_power + 1)]
    )  # [D, ..., 2, L, N]
    k = bfv.q.k
    switched = bfv.mod_switch_to(Ciphertext(stack, is_ntt=False, level=k), eval_level)
    return bfv.to_ntt(switched).data


def eval_matching_polys(
    bfv: BfvContext,
    powers_ntt: jnp.ndarray,      # [B, D, 2, Le, N] NTT mont (powers 1..D)
    coeff_cache: jnp.ndarray,     # [B, C, D+1, Le, N] NTT mont plaintexts
    const_slots: jnp.ndarray,     # [B, C, N] uint32 < t: coeff0 in slot domain
    mask_slots: jnp.ndarray,      # [B, C, N] uint32 < t: random mask r
    eval_level: int,
) -> Ciphertext:
    """result[b,c] = Σ_{j=1..D} ctpow[b,j] ⊙ pt[b,c,j]  + Δ·encode(coeff0+mask).

    Returns a batched 2-component ciphertext [B, C, 2, Le, N] in coeff domain.
    """
    base = bfv.levels[eval_level]
    t = np.uint32(bfv.t)

    def impl(powers, cache, const_s, mask_s):
        cms = add_mod(const_s, mask_s, t)  # fold mask on device
        D = powers.shape[1]
        B, C = cache.shape[0], cache.shape[1]
        acc = jnp.zeros(
            (B, C, 2, base.k, powers.shape[-1]), dtype=jnp.uint32
        )

        def body(j, acc):
            pw = jax.lax.dynamic_index_in_dim(powers, j, axis=1, keepdims=False)
            pt = jax.lax.dynamic_index_in_dim(cache, j + 1, axis=2, keepdims=False)
            term = mont_mul(
                pw[:, None, :, :, :], pt[:, :, None, :, :], base.p_d, base.pni_d
            )  # [B, C, 2, Le, N]
            return add_mod(acc, term, base.p_d)

        acc = jax.lax.fori_loop(0, D, body, acc)
        acc = base.from_mont(base.ntt.intt(acc))  # coeff domain plain
        pt0 = bfv.encode(cms)                     # [B, C, N] poly mod t
        dm = bfv._scale_impl(pt0, eval_level)     # round(Q_l·m/t), plain
        c0 = add_mod(acc[:, :, 0], dm, base.p_d)
        return acc.at[:, :, 0].set(c0)

    data = bfv._jitted(("eval_matching", eval_level), impl)(
        powers_ntt, coeff_cache, const_slots, mask_slots
    )
    return Ciphertext(data, is_ntt=False, level=eval_level)
