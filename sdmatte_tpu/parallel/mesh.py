"""Device mesh + sharding helpers.

The reference has NO distributed layer at all (SURVEY.md §2.3: single-process,
single-GPU, with memory crutches).  The TPU-native scale-out story is SPMD:
a ``data`` mesh, batch (or video-frame) axis sharded, params and prompt
embeddings replicated, XLA inserting the collectives.  That covers the
BASELINE.json batch-8 throughput and 64-frame video configs; TP/PP/EP are
deliberately not built (model fits one chip — SURVEY.md §2.3).

Two mesh shapes:

* ``make_mesh`` — 1-D ``('data',)`` over one host's ICI-connected slice.
* ``make_hybrid_mesh`` — 2-D ``('dcn', 'data')`` for multi-host fleets:
  the outer axis spans hosts (slow DCN links), the inner axis the ICI-
  connected chips of each host.  Both axes carry the batch; the only
  cross-axis traffic is the training all-reduce, which XLA performs
  hierarchically (reduce-scatter over ICI, then the small cross-host hop
  over DCN) because the device order places ICI neighbours contiguously.
  Inference/video sharding has no hot-loop collectives at all, so DCN
  placement costs nothing there.

Every consumer derives the batch partition via ``data_axes(mesh)`` /
``data_spec`` rather than a hard-coded axis name, so a pipeline written
against the 1-D mesh runs unchanged on the hybrid one.
"""

from __future__ import annotations

import os
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


def make_hybrid_mesh(n_hosts: Optional[int] = None,
                     devices_per_host: Optional[int] = None,
                     axis_names: Sequence[str] = ("dcn", "data")) -> Mesh:
    """2-D ``(dcn, data)`` mesh: hosts × per-host ICI chips.

    In a real multi-process run (``jax.process_count() > 1`` after
    ``distributed_init``), devices are grouped by ``process_index`` so the
    inner axis is exactly one host's ICI-connected chips and the outer axis
    rides DCN.  Single-process (tests, virtual CPU meshes): the flat device
    list is reshaped to the requested grid, which preserves the same
    axis semantics for compile-checking.
    """
    devs = jax.devices()
    if jax.process_count() > 1:
        n_hosts = n_hosts or jax.process_count()
        by_host: dict = {}
        for d in devs:
            by_host.setdefault(d.process_index, []).append(d)
        rows = [by_host[k] for k in sorted(by_host)]
        devices_per_host = devices_per_host or len(rows[0])
        # exact match required in BOTH directions: a subset mesh would leave
        # the excluded processes running the same SPMD program with no mesh
        # devices, deadlocking at the first collective instead of erroring
        if len(rows) != n_hosts or any(len(r) != devices_per_host for r in rows):
            raise ValueError(
                f"requested {n_hosts}x{devices_per_host}, have "
                f"{[len(r) for r in rows]} devices per host — hybrid mesh "
                f"must cover every process exactly")
        grid = np.asarray(rows)
    else:
        n_hosts = n_hosts or 1
        devices_per_host = devices_per_host or len(devs) // n_hosts
        need = n_hosts * devices_per_host
        if need > len(devs):
            raise ValueError(f"requested {need} devices, have {len(devs)}")
        grid = np.asarray(devs[:need]).reshape(n_hosts, devices_per_host)
    return Mesh(grid, axis_names=tuple(axis_names))


def distributed_init(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> bool:
    """Initialize multi-host JAX (one call, before any backend use).

    Arguments fall back to the standard env vars (COORDINATOR_ADDRESS /
    NUM_PROCESSES / PROCESS_ID, or the TPU-pod metadata auto-detection that
    ``jax.distributed.initialize()`` performs with no arguments on Cloud
    TPU).  Returns False (no-op) when nothing indicates a multi-process
    fleet, so single-host callers can invoke it unconditionally.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "COORDINATOR_ADDRESS")
    env_n = os.environ.get("NUM_PROCESSES")
    num_processes = num_processes if num_processes is not None else (
        int(env_n) if env_n else None)
    on_tpu_pod = os.environ.get("TPU_WORKER_HOSTNAMES") is not None
    if not coordinator_address and not on_tpu_pod:
        return False
    env_id = os.environ.get("PROCESS_ID")
    process_id = process_id if process_id is not None else (
        int(env_id) if env_id else None)
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    return True


def data_axes(mesh: Mesh) -> tuple:
    """Mesh axes that carry the batch/frame dimension — all of them, in mesh
    order (1-D: ``('data',)``; hybrid: ``('dcn', 'data')`` so consecutive
    batch rows land on one host's ICI slice)."""
    return tuple(mesh.axis_names)


def data_spec(mesh: Mesh, ndim: int) -> P:
    """PartitionSpec sharding axis 0 over every mesh axis."""
    return P(data_axes(mesh), *([None] * (ndim - 1))) if ndim else P()


def shard_batch(x, mesh: Mesh):
    """Shard the leading (batch / frame) axis of every leaf across the mesh
    (over all mesh axes — see ``data_axes``)."""
    def put(leaf):
        return jax.device_put(leaf, NamedSharding(mesh, data_spec(mesh, leaf.ndim)))
    return jax.tree_util.tree_map(put, x)


def replicate(x, mesh: Mesh):
    """Replicate every leaf (params, shared prompt embeds) on all devices."""
    def put(leaf):
        return jax.device_put(leaf, NamedSharding(mesh, P()))
    return jax.tree_util.tree_map(put, x)


def batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    return NamedSharding(mesh, data_spec(mesh, ndim))
