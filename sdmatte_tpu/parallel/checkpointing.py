"""Training checkpoint/resume (orbax-backed).

The reference has no training and therefore no resume story (SURVEY.md §5);
this provides the TPU-native one: save/restore of the full train state
(params + optimizer state + step) for elastic recovery, plus export of
trained params to the reference-compatible safetensors format
(checkpoint.toy.save_sdmatte_checkpoint).
"""

from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import jax


def _checkpointer():
    import orbax.checkpoint as ocp
    return ocp.PyTreeCheckpointer()


def save_train_state(ckpt_dir: str, step: int, params, opt_state, *,
                     ema=None) -> str:
    """Write an atomic step checkpoint; returns its path.

    ``ema``: optional exponential-moving-average param tree (train_loop's
    ``ema_decay``); stored alongside and restorable via
    ``restore_train_state(..., with_ema=True)``."""
    path = os.path.join(os.path.abspath(ckpt_dir), f"step_{step:08d}")
    state = {"step": step, "params": params, "opt_state": opt_state}
    if ema is not None:
        state["ema"] = ema
    _checkpointer().save(path, state, force=True)
    return path


def latest_step(ckpt_dir: str) -> Optional[int]:
    if not os.path.isdir(ckpt_dir):
        return None
    steps = [int(d.split("_")[1]) for d in os.listdir(ckpt_dir)
             if d.startswith("step_") and d.split("_")[1].isdigit()]
    return max(steps) if steps else None


def restore_train_state(ckpt_dir: str, *, step: Optional[int] = None,
                        template: Optional[Any] = None,
                        with_ema: bool = False) -> Tuple[Any, ...]:
    """Restore (step, params, opt_state); latest step by default.

    ``template`` (a pytree of like-shaped arrays) restores with matching
    shardings/dtypes when given.  ``with_ema=True`` appends the stored EMA
    tree (or None when the checkpoint has none) as a fourth element.
    """
    s = step if step is not None else latest_step(ckpt_dir)
    if s is None:
        raise FileNotFoundError(f"no checkpoints under {ckpt_dir}")
    path = os.path.join(os.path.abspath(ckpt_dir), f"step_{s:08d}")
    if template is not None:
        item = {"step": 0, "params": template[0], "opt_state": template[1]}
        if with_ema and len(template) > 2 and template[2] is not None:
            item["ema"] = template[2]
        restored = _checkpointer().restore(path, item=item)
    else:
        restored = _checkpointer().restore(path)
    out = (restored["step"], restored["params"], restored["opt_state"])
    return out + (restored.get("ema"),) if with_ema else out


def export_reference_checkpoint(params, path: str):
    """Export params as reference-consumable torch-layout safetensors."""
    from ..checkpoint.toy import save_sdmatte_checkpoint
    params_host = jax.device_get(params)
    save_sdmatte_checkpoint(params_host, path)
