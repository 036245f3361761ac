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

import dataclasses
import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import optax

from ..configs import SDMatteConfig
from ..core.dtypes import Policy, FP32
from ..models import sdmatte

# Reference training freezes the VAE and text towers and fine-tunes only the
# U-Net (reference meta_arch.py:73-75: requires_grad_(False) on text_encoder
# and vae, unet.train()).  Same default here; pass frozen=() to train
# everything.  Freezing is enforced twice: stop_gradient at the loss (so XLA
# DCEs the frozen towers' backward pass) and optax.multi_transform masking
# (so adamw allocates NO moment buffers for them — ~3.5 GB fp32 saved on the
# full-size model's ~437M frozen params).
FROZEN_TOWERS = ("vae", "text_encoder")


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


@dataclasses.dataclass(frozen=True)
class LossConfig:
    """Weights for the composite matting loss.  The reference's training loss
    was stripped upstream (SURVEY.md §0); these terms reconstruct the
    training-era API its flags imply: plain L1, uncertainty-band-weighted L1
    (the dead util at reference utils.py:62-83), gradient L1 (edge fidelity
    — the standard matting-objective companion to SAD), and an optional
    feature-distillation term consuming the use_dis_loss feature maps
    (reference meta_arch.py:39, replace.py:465,490,506,538)."""
    l1: float = 1.0
    unknown_l1: float = 1.0
    grad_l1: float = 0.0
    dis: float = 0.0


def _grad_l1(pred, gt):
    """L1 on spatial finite differences (edge-fidelity term)."""
    dyp, dyg = pred[:, 1:] - pred[:, :-1], gt[:, 1:] - gt[:, :-1]
    dxp, dxg = pred[:, :, 1:] - pred[:, :, :-1], gt[:, :, 1:] - gt[:, :, :-1]
    return jnp.mean(jnp.abs(dyp - dyg)) + jnp.mean(jnp.abs(dxp - dxg))


def matting_loss(params, cfg: SDMatteConfig, batch: dict, *,
                 policy: Policy = FP32, attn_impl: str = "xla",
                 loss_cfg: LossConfig = LossConfig(),
                 frozen: Sequence[str] = FROZEN_TOWERS,
                 remat: bool = False):
    """Composite matting loss; term weights via ``loss_cfg``.

    ``frozen`` towers pass through stop_gradient, so their parameter
    gradients are structurally zero and XLA drops that backward compute.
    ``remat`` rematerializes U-Net block activations on the backward pass
    (jax.checkpoint), trading ~1/3 more FLOPs for the block-activation
    memory — the lever that fits larger fine-tune batches in 16 GB HBM.

    With cfg.use_dis_loss and a ``teacher_features`` list in the batch, adds
    L2 feature distillation over the down/mid/up capture points."""
    if frozen:
        params = {k: (jax.lax.stop_gradient(v) if k in frozen else v)
                  for k, v in params.items()}
    out = sdmatte.forward(params, cfg, batch, policy=policy,
                          attn_impl=attn_impl, remat=remat)
    pred, features = out if isinstance(out, tuple) else (out, None)
    gt = batch["alpha_gt"]
    l1 = jnp.abs(pred - gt)
    loss = loss_cfg.l1 * jnp.mean(l1)
    if loss_cfg.unknown_l1:
        w = uncertainty_weight(gt)
        denom = jnp.maximum(jnp.sum(w), 1.0)
        loss = loss + loss_cfg.unknown_l1 * jnp.sum(l1 * w) / denom
    if loss_cfg.grad_l1:
        loss = loss + loss_cfg.grad_l1 * _grad_l1(pred, gt)
    if loss_cfg.dis and features is not None \
            and batch.get("teacher_features") is not None:
        for f, t in zip(features, batch["teacher_features"]):
            loss = loss + loss_cfg.dis * jnp.mean(
                jnp.square(f.astype(jnp.float32) - t.astype(jnp.float32)))
    return loss


def make_lr_schedule(base_lr: float = 1e-5, *, warmup_steps: int = 100,
                     total_steps: int = 10_000, end_scale: float = 0.1):
    """Linear warmup -> cosine decay (the standard fine-tune shape)."""
    return optax.warmup_cosine_decay_schedule(
        init_value=0.0, peak_value=base_lr, warmup_steps=warmup_steps,
        decay_steps=max(total_steps, warmup_steps + 1),
        end_value=base_lr * end_scale)


def init_train_state(params, learning_rate=1e-5, *, weight_decay: float = 0.0,
                     grad_clip: Optional[float] = 1.0,
                     frozen: Sequence[str] = FROZEN_TOWERS):
    """``learning_rate`` may be a float or an optax schedule
    (make_lr_schedule).  Gradient clipping defaults on — diffusion-backbone
    fine-tunes spike early.

    ``frozen`` top-level towers (default: reference parity, vae +
    text_encoder) get a set_to_zero transform via multi_transform, so the
    optimizer holds NO moment state for them; pass ``frozen=()`` to train
    the full tree.  Pair with the same ``frozen`` in the loss so the
    backward pass is skipped too."""
    tx = optax.adamw(learning_rate, weight_decay=weight_decay)
    if grad_clip:
        tx = optax.chain(optax.clip_by_global_norm(grad_clip), tx)
    frozen = tuple(k for k in frozen
                   if isinstance(params, dict) and k in params)
    if frozen:
        labels = {k: jax.tree_util.tree_map(
                      lambda _: "frozen" if k in frozen else "trained", v)
                  for k, v in params.items()}
        tx = optax.multi_transform(
            {"trained": tx, "frozen": optax.set_to_zero()}, labels)
    return tx, tx.init(params)


def train_step(params, opt_state, batch, *, cfg: SDMatteConfig, tx,
               policy: Policy = FP32, attn_impl: str = "xla",
               loss_cfg: LossConfig = LossConfig(),
               frozen: Sequence[str] = FROZEN_TOWERS, remat: bool = False):
    """One SPMD step: loss/grad on the local batch shard, gradients combined
    by XLA's all-reduce when jitted with batch sharded over the mesh."""
    loss, grads = jax.value_and_grad(matting_loss)(
        params, cfg, batch, policy=policy, attn_impl=attn_impl,
        loss_cfg=loss_cfg, frozen=frozen, remat=remat)
    updates, opt_state = tx.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, loss


def make_sharded_train_step(mesh, cfg: SDMatteConfig, tx, *,
                            policy: Policy = FP32, attn_impl: str = "xla",
                            loss_cfg: LossConfig = LossConfig(),
                            frozen: Sequence[str] = FROZEN_TOWERS,
                            remat: bool = False, donate: bool = True):
    """jit the step with explicit in/out shardings over the mesh: params and
    optimizer state replicated, batch sharded over the mesh's data axes
    (1-D 'data' or hybrid ('dcn','data') — mesh.data_spec).

    ``donate`` (default) donates the incoming params/opt-state buffers to
    the updated ones, so the old and new trees never coexist in HBM — the
    standard train-loop pattern (callers must not reuse the donated inputs
    after the step; pass donate=False to keep them readable)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from .mesh import data_spec

    repl = NamedSharding(mesh, P())

    def batch_spec(leaf):
        return NamedSharding(mesh, data_spec(mesh, leaf.ndim))

    step = functools.partial(train_step, cfg=cfg, tx=tx, policy=policy,
                             attn_impl=attn_impl, loss_cfg=loss_cfg,
                             frozen=frozen, remat=remat)

    def wrapped(params, opt_state, batch):
        batch = jax.lax.with_sharding_constraint(
            batch, jax.tree_util.tree_map(batch_spec, batch))
        return step(params, opt_state, batch)

    from ..ops.dispatch import model_jit
    return model_jit(wrapped,
                     out_shardings=(repl, repl, repl),
                     donate_argnums=(0, 1) if donate else ())


def train_loop(params, cfg: SDMatteConfig, *, steps: int, batch_size: int,
               mesh=None, sampler=None, learning_rate=1e-4,
               loss_cfg: LossConfig = LossConfig(),
               policy: Policy = FP32, attn_impl: str = "xla",
               frozen: Sequence[str] = FROZEN_TOWERS, remat: bool = False,
               ema_decay: float = 0.0,
               ckpt_dir: Optional[str] = None, ckpt_every: int = 0,
               log_every: int = 10):
    """Full fine-tune driver: data pipeline -> sharded step -> checkpoints.

    Composition runs one step ahead on a host thread (parallel/data.py);
    the device only ever sees ready batches.  Returns (params, losses), or
    (params, losses, ema_params) when ``ema_decay`` > 0 — the standard
    matting-training EMA of the weights (the reference's checkpoint loader
    tolerates ema-nested dicts, sdmatte_nodes.py:307-319, because upstream
    SDMatte training shipped them).  EMA costs one extra param tree of HBM
    and a cheap fused multiply-add per step."""
    from .data import CompositeSampler, prefetch_batches
    from ..utils.observability import get_logger
    log = get_logger("sdmatte_tpu.train")

    # per-process seed: in a multi-host run each process composites its own
    # slice of the global batch (data.py), so hosts must draw distinct data
    sampler = sampler or CompositeSampler(size=64, seed=jax.process_index())
    tx, opt_state = init_train_state(params, learning_rate, frozen=frozen)
    ema = ema_update = None
    if ema_decay:
        # real copies, NOT jnp.asarray: the step donates the params buffers,
        # so an aliasing EMA tree would read donated memory on step 1
        ema = jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True),
                                     params)
        ema_update = jax.jit(
            lambda e, p: jax.tree_util.tree_map(
                lambda a, b: ema_decay * a + (1.0 - ema_decay)
                * b.astype(a.dtype), e, p),
            donate_argnums=(0,))
    if mesh is not None:
        from .mesh import replicate
        params = replicate(params, mesh)
        opt_state = replicate(opt_state, mesh)
        if ema is not None:
            ema = replicate(ema, mesh)
        step_fn = make_sharded_train_step(mesh, cfg, tx, policy=policy,
                                          attn_impl=attn_impl,
                                          loss_cfg=loss_cfg, frozen=frozen,
                                          remat=remat)
    else:
        step_fn = jax.jit(functools.partial(
            train_step, cfg=cfg, tx=tx, policy=policy, attn_impl=attn_impl,
            loss_cfg=loss_cfg, frozen=frozen, remat=remat),
            donate_argnums=(0, 1))

    losses = []
    for i, batch in enumerate(prefetch_batches(sampler, batch_size,
                                               steps=steps, mesh=mesh)):
        params, opt_state, loss = step_fn(params, opt_state, batch)
        if ema_update is not None:
            ema = ema_update(ema, params)
        if i % log_every == 0 or i == steps - 1:
            losses.append(float(loss))
            log.info("step %d loss %.5f", i, losses[-1])
        if ckpt_dir and ckpt_every and (i + 1) % ckpt_every == 0:
            from . import checkpointing
            checkpointing.save_train_state(ckpt_dir, i + 1, params, opt_state,
                                           ema=ema)
    if ema is not None:
        return params, losses, ema
    return params, losses
