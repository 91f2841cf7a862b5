"""Device-mesh sharding of the PSU query pipeline.

The reference is a single-process, thread-parallel program; its two scalable
work axes (SURVEY §2.7 P2/P3) are the *bundle-index* axis and the *cache*
(BinBundle-per-index) axis.  Those become mesh axes here:

  mesh ("bundle",): the DB coefficient cache [B, C, K+1, L, N] and every
  per-bundle tensor shard on axis 0 (pure data parallel over ICI — each chip
  owns B/n bundle indices end to end: powers, eval, masks).

  The query ciphertexts are replicated (they are small); results stay
  sharded until the final gather to the host/network layer.

For pod-scale (256M-4096) the cache axis C shards too ("cache" axis), and
the fan-in of decrypted match matrices is a concat, not a reduction (SURVEY
§5 long-context note), so cross-host traffic is one all-gather at the end.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "bundle") -> Mesh:
    devs = jax.devices()[: n_devices or len(jax.devices())]
    return Mesh(np.array(devs), (axis,))


def bundle_sharding(mesh: Mesh) -> NamedSharding:
    """Shard axis 0 (bundle-index) of a PSU tensor across the mesh."""
    return NamedSharding(mesh, P("bundle"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
