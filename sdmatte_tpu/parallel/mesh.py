"""Device mesh + sharding helpers.

The reference has NO distributed layer at all (SURVEY.md §2.3: single-process,
single-GPU, with memory crutches).  The TPU-native scale-out story is SPMD:
a 1-D ``data`` mesh over ICI, batch (or video-frame) axis sharded, params and
prompt embeddings replicated, XLA inserting the collectives.  That covers the
BASELINE.json batch-8 throughput and 64-frame video configs; TP/PP/EP are
deliberately not built (model fits one chip — SURVEY.md §2.3).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "data") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    if n > len(devs):
        raise ValueError(f"requested {n} devices, have {len(devs)}")
    return Mesh(np.asarray(devs[:n]), axis_names=(axis_name,))


def shard_batch(x, mesh: Mesh, axis_name: str = "data"):
    """Shard the leading (batch / frame) axis of every leaf across the mesh."""
    def put(leaf):
        spec = P(axis_name, *([None] * (leaf.ndim - 1))) if leaf.ndim else P()
        return jax.device_put(leaf, NamedSharding(mesh, spec))
    return jax.tree_util.tree_map(put, x)


def replicate(x, mesh: Mesh):
    """Replicate every leaf (params, shared prompt embeds) on all devices."""
    def put(leaf):
        return jax.device_put(leaf, NamedSharding(mesh, P()))
    return jax.tree_util.tree_map(put, x)


def batch_sharding(mesh: Mesh, ndim: int, axis_name: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis_name, *([None] * (ndim - 1))))
