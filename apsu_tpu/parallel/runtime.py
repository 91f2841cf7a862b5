"""Multi-chip sharded query runtime.

Scales the DB party across a ``jax.sharding.Mesh`` along the protocol's two
native work axes (SURVEY §2.7 P2/P3 → C4): bundle indices and caches.  The
coefficient cache shards on the (bundle × cache) product axis; query-power
ciphertexts replicate (they are small); every chip evaluates its cache
shard's matching polynomials locally and the result packages all-gather at
the end (a concat, not a reduction — SURVEY §5).

On the single-chip dev box this runs under a virtual CPU mesh
(xla_force_host_platform_device_count); the same code drives real v5p/v5e
slices — shardings are expressed as NamedSharding constraints and XLA
inserts the ICI collectives.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from apsu_tpu.core.bfv import BfvContext, Ciphertext
from apsu_tpu.core.mod32 import add_mod, mont_mul
from apsu_tpu.db.receiver_db import ReceiverDB


class ShardedEvaluator:
    """Shards a built ReceiverDB's cache over a mesh and evaluates queries.

    The cache [B, C, Dp, L, N] is reshaped to [B·C, Dp, L, N] and sharded on
    axis 0; bundles-with-fewer-caches hold all-one polynomials (never match)
    so the rectangular shard layout is exact.  Non-PS query path only for
    now; the PS pipeline shards the same way (per-(bundle, cache) chunks are
    already independent) and lands next round.
    """

    def __init__(self, db: ReceiverDB, mesh: Mesh, axis: str = "bundle"):
        self.db = db
        self.bfv: BfvContext = db.bfv
        self.mesh = mesh
        self.axis = axis
        B, C = db.coeff_cache.shape[0], db.coeff_cache.shape[1]
        self.B, self.C = B, C
        n_dev = mesh.devices.size
        if (B * C) % n_dev != 0:
            # pad the cache axis with never-matching (zero-polynomial) caches
            pad = n_dev - (B * C) % n_dev
        else:
            pad = 0
        self.pad = pad
        flat = db.coeff_cache.reshape((B * C,) + db.coeff_cache.shape[2:])
        consts = db.const_slots.reshape(B * C, -1)
        if pad:
            flat = jnp.concatenate(
                [flat, jnp.zeros((pad,) + flat.shape[1:], flat.dtype)]
            )
            ones = jnp.ones((pad, consts.shape[1]), consts.dtype)
            consts = jnp.concatenate([consts, ones])
        shard = NamedSharding(mesh, P(axis))
        self.cache = jax.device_put(flat, shard)          # [(BC+pad), Dp, L, N]
        self.const_slots = jax.device_put(consts, shard)  # [(BC+pad), N]
        self.repl = NamedSharding(mesh, P())

    def eval_query(self, powers_ntt, mask_slots, eval_level: int) -> jnp.ndarray:
        """powers_ntt: [B, D, 2, Le, N] replicated; mask_slots [B, C, N].
        Returns result ct data [B, C, 2, Le, N] (replicated/gathered)."""
        base = self.bfv.levels[eval_level]
        bfv = self.bfv
        B, C, pad = self.B, self.C, self.pad
        t = np.uint32(bfv.t)

        def impl(cache, consts, powers, mask):
            D = powers.shape[1]
            Dp = cache.shape[1]
            BC = cache.shape[0]
            N = cache.shape[-1]
            # per-shard-row bundle index selects the matching power batch
            bundle_of = (
                jnp.arange(BC, dtype=jnp.int32) // C
            ).clip(0, B - 1)
            pw = jnp.concatenate(
                [
                    jnp.zeros((B, 1, 2, base.k, N), jnp.uint32),
                    powers,
                    jnp.zeros((B, Dp - D - 1, 2, base.k, N), jnp.uint32),
                ],
                axis=1,
            )
            pw_rows = pw[bundle_of]  # [BC, Dp, 2, L, N]

            def body(j, acc):
                a = jax.lax.dynamic_index_in_dim(pw_rows, j, axis=1, keepdims=False)
                b = jax.lax.dynamic_index_in_dim(cache, j, axis=1, keepdims=False)
                return add_mod(
                    acc, mont_mul(a, b[:, None], base.p_d, base.pni_d), base.p_d
                )

            acc = jax.lax.fori_loop(
                0, Dp, body, jnp.zeros((BC, 2, base.k, N), jnp.uint32)
            )
            acc = base.from_mont(base.ntt.intt(acc))
            maskf = mask.reshape(B * C, -1)
            if pad:
                maskf = jnp.concatenate(
                    [maskf, jnp.zeros((pad, maskf.shape[1]), maskf.dtype)]
                )
            cms = add_mod(consts, maskf, t)
            dm = bfv._scale_impl(bfv.encode(cms), eval_level)
            acc = acc.at[:, 0].set(add_mod(acc[:, 0], dm, base.p_d))
            return acc[: B * C].reshape(B, C, 2, base.k, acc.shape[-1])

        f = bfv._jitted(
            ("sharded_eval", eval_level, id(self.mesh)),
            jax.jit(
                impl,
                in_shardings=(
                    NamedSharding(self.mesh, P(self.axis)),
                    NamedSharding(self.mesh, P(self.axis)),
                    self.repl,
                    self.repl,
                ),
                out_shardings=self.repl,  # all-gather of result packages
            ),
        )
        with self.mesh:
            return f(self.cache, self.const_slots, powers_ntt, mask_slots)
