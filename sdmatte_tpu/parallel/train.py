"""Data-parallel training step (matting fine-tune) over a device mesh.

The reference ships no training code (stripped upstream, SURVEY.md §0), but
the meta-arch retains training-era conditioning paths.  This module provides
the TPU-native training loop skeleton: L1 matte loss + the uncertainty-band
weighting the reference keeps as a dead training util
(reference utils.py:62-83, reimplemented in-graph in ``uncertainty_weight``),
optax optimizer, and pjit-style sharding: params replicated, batch sharded on
the ``data`` axis — gradients all-reduced over ICI by XLA.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import optax

from ..configs import SDMatteConfig
from ..core.dtypes import Policy, FP32
from ..models import sdmatte


def uncertainty_weight(pred: jnp.ndarray, width: int = 15) -> jnp.ndarray:
    """In-graph analogue of the reference's cv2-dilated uncertainty band
    (reference utils.py:62-83): mark pixels whose alpha is neither ~0 nor ~1,
    then dilate by ``width`` with a max-pool — an elliptical structuring
    element becomes a separable max filter on TPU (VPU-friendly, no host cv2).

    pred: (B, H, W, 1) in [0,1]; returns same-shape {0,1} weights.
    """
    eps = 1.0 / 255.0
    band = ((pred > eps) & (pred < 1.0 - eps)).astype(jnp.float32)
    k = 2 * (width // 2) + 1
    return jax.lax.reduce_window(
        band, -jnp.inf, jax.lax.max, (1, k, k, 1), (1, 1, 1, 1), "SAME")


def matting_loss(params, cfg: SDMatteConfig, batch: dict, *,
                 policy: Policy = FP32, attn_impl: str = "xla"):
    """L1 alpha loss + uncertainty-weighted L1 (reference-era loss shape)."""
    pred = sdmatte.forward(params, cfg, batch, policy=policy,
                           attn_impl=attn_impl)
    gt = batch["alpha_gt"]
    l1 = jnp.abs(pred - gt)
    w = uncertainty_weight(gt)
    denom = jnp.maximum(jnp.sum(w), 1.0)
    return jnp.mean(l1) + jnp.sum(l1 * w) / denom


def init_train_state(params, learning_rate: float = 1e-5):
    tx = optax.adamw(learning_rate)
    return tx, tx.init(params)


def train_step(params, opt_state, batch, *, cfg: SDMatteConfig, tx,
               policy: Policy = FP32, attn_impl: str = "xla"):
    """One SPMD step: loss/grad on the local batch shard, gradients combined
    by XLA's all-reduce when jitted with batch sharded over the mesh."""
    loss, grads = jax.value_and_grad(matting_loss)(
        params, cfg, batch, policy=policy, attn_impl=attn_impl)
    updates, opt_state = tx.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, loss


def make_sharded_train_step(mesh, cfg: SDMatteConfig, tx, *,
                            policy: Policy = FP32, attn_impl: str = "xla"):
    """jit the step with explicit in/out shardings over the mesh: params and
    optimizer state replicated, batch sharded on 'data'."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(mesh, P())

    def batch_spec(leaf):
        return NamedSharding(mesh, P("data", *([None] * (leaf.ndim - 1))))

    step = functools.partial(train_step, cfg=cfg, tx=tx, policy=policy,
                             attn_impl=attn_impl)

    def wrapped(params, opt_state, batch):
        batch = jax.lax.with_sharding_constraint(
            batch, jax.tree_util.tree_map(batch_spec, batch))
        return step(params, opt_state, batch)

    return jax.jit(wrapped,
                   out_shardings=(repl, repl, repl))
