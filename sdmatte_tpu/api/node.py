"""ComfyUI node adapter: the ``Apply SDMatte`` node on the TPU backend.

Public surface kept drop-in compatible with the reference node (same input
names, types, defaults, ranges, return types/names, function name, category —
reference sdmatte_nodes.py:219-255) so existing workflows run unchanged.

Improvements over the reference (SURVEY.md §7 "fix, don't preserve"):
  * the model + weights are cached across calls (the reference rebuilds and
    reloads ~11 GB per node execution, sdmatte_nodes.py:286-323)
  * force_cpu actually works (the reference hardcodes .cuda())
  * no attention slicing / autocast knobs needed — bf16 + flash attention
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np

from . import comfy_shim
from ..assets import manager as assets
from ..configs import SDMatteConfig
from ..core.dtypes import BF16, FP32
from ..pipeline import MattingPipeline, PipelineOptions

_PIPELINE_CACHE: dict = {}

# Register the SDMatte model dir with the host path system at import time —
# same side effect as the reference plugin's module import
# (reference sdmatte_nodes.py:9-12).
try:
    comfy_shim.register_default_dirs()
except Exception:
    pass


def _resolve_config_dir() -> Optional[str]:
    """Find a local SD2.1 config dir in registered diffusers paths; try the
    network bootstrap; fall back to built-in defaults (the built-in
    SDMatteConfig already encodes the SD2.1-base architecture, so the config
    download is an optional nicety here, not a hard dependency as in the
    reference sdmatte_nodes.py:266-284)."""
    for path in comfy_shim.get_folder_paths("diffusers"):
        cand = os.path.join(path, "stable-diffusion-2-1-base")
        if os.path.isdir(cand):
            return cand
    default = os.path.join(comfy_shim.models_dir(), "diffusers",
                           "stable-diffusion-2-1-base")
    if os.path.isdir(os.path.join(default, "unet")):
        return default
    try:
        return assets.ensure_sd21_configs(default)
    except Exception as e:
        print(f"[sdmatte_tpu] config bootstrap unavailable ({e}); "
              f"using built-in SD2.1 config")
        return None


def get_pipeline(ckpt_name: str, *, force_cpu: bool = False,
                 policy_name: str = "bf16", speed_mode: str = "off",
                 weight_storage: str = "fp") -> MattingPipeline:
    """Build-or-fetch the cached pipeline for a checkpoint."""
    models_dir = comfy_shim.register_default_dirs()
    ckpt_path = assets.download_model(
        ckpt_name, models_dir,
        search_paths=comfy_shim.get_folder_paths("SDMatte"))
    mtime = os.path.getmtime(ckpt_path)
    key = (ckpt_path, mtime, force_cpu, policy_name, speed_mode,
           weight_storage)
    if key in _PIPELINE_CACHE:
        return _PIPELINE_CACHE[key]

    import jax
    import jax.numpy as jnp
    from ..models import sdmatte
    from ..models.tokenizer import CLIPTokenizer
    from ..checkpoint import load_sdmatte_checkpoint

    cfg_dir = _resolve_config_dir()
    cfg = (SDMatteConfig.from_pretrained_dir(cfg_dir)
           if cfg_dir and os.path.isdir(os.path.join(cfg_dir, "unet"))
           else SDMatteConfig())

    tokenizer = None
    if cfg_dir:
        tok_dir = os.path.join(cfg_dir, "tokenizer")
        if os.path.isfile(os.path.join(tok_dir, "vocab.json")):
            tokenizer = CLIPTokenizer.from_pretrained_dir(tok_dir)

    policy = FP32 if force_cpu else {"bf16": BF16, "fp32": FP32}[policy_name]
    params = sdmatte.init(cfg, seed=0)
    params, report = load_sdmatte_checkpoint(params, ckpt_path,
                                             dtype=policy.param_dtype)
    print(f"[sdmatte_tpu] checkpoint {os.path.basename(ckpt_path)}: "
          f"{report.summary()}")

    if force_cpu:
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            pipe = MattingPipeline(params, cfg, policy=policy,
                                   attn_impl="xla", tokenizer=tokenizer,
                                   speed_mode=speed_mode,
                                   weight_storage=weight_storage)
    else:
        pipe = MattingPipeline(params, cfg, policy=policy, attn_impl="auto",
                               tokenizer=tokenizer, speed_mode=speed_mode,
                               weight_storage=weight_storage)
    _PIPELINE_CACHE.clear()   # hold one model at a time (11 GB weights)
    _PIPELINE_CACHE[key] = pipe
    return pipe


class SDMatteApply:
    """Drop-in 'Apply SDMatte' node, TPU backend."""

    @classmethod
    def INPUT_TYPES(cls):
        return {
            "required": {
                "ckpt_name": (list(assets.MODEL_URLS.keys()),),
                "image": ("IMAGE", {"tooltip": "Input image to matte"}),
                "trimap": ("MASK", {"tooltip": "Trimap mask: white=fg, "
                                               "black=bg, gray=unknown"}),
                "inference_size": ([512, 640, 768, 896, 1024], {
                    "default": 1024,
                    "tooltip": "Inference resolution; higher = better quality,"
                               " slower"}),
                "is_transparent": ("BOOLEAN", {
                    "default": False,
                    "tooltip": "Enable if the input image has an alpha/"
                               "transparent background"}),
                "output_mode": (["alpha_only", "matted_rgba", "matted_rgb"], {
                    "default": "alpha_only",
                    "tooltip": "alpha_only = mask only; matted_rgba = cutout "
                               "with transparency; matted_rgb = cutout on "
                               "black"}),
                "mask_refine": ("BOOLEAN", {
                    "default": True,
                    "tooltip": "Trimap-constrained alpha refinement"}),
                "trimap_constraint": ("FLOAT", {
                    "default": 0.8, "min": 0.1, "max": 1.0, "step": 0.1,
                    "tooltip": "Constraint strength: higher = stricter "
                               "filtering by the trimap"}),
            },
            "optional": {
                "force_cpu": ("BOOLEAN", {"default": False}),
            },
        }

    RETURN_TYPES = ("MASK", "IMAGE")
    RETURN_NAMES = ("alpha_mask", "matted_image")
    FUNCTION = "apply_matte"
    CATEGORY = "Matting/SDMatte"

    def apply_matte(self, ckpt_name, image, trimap, inference_size,
                    is_transparent, output_mode, mask_refine,
                    trimap_constraint, force_cpu=False) -> Tuple:
        # ComfyUI hands torch tensors: image (B,H,W,C) in [0,1], trimap (B,H,W)
        img_np = np.asarray(image.detach().cpu().numpy(), np.float32) \
            if hasattr(image, "detach") else np.asarray(image, np.float32)
        tri_np = np.asarray(trimap.detach().cpu().numpy(), np.float32) \
            if hasattr(trimap, "detach") else np.asarray(trimap, np.float32)
        if tri_np.ndim == 2:
            tri_np = tri_np[None]

        # Honor the host's device manager like the reference does
        # (sdmatte_nodes.py:258-260): a CPU-only ComfyUI deployment makes
        # force_cpu implicit.  Standalone this is always a no-op.
        force_cpu = bool(force_cpu) or comfy_shim.host_prefers_cpu()
        pipe = get_pipeline(ckpt_name, force_cpu=force_cpu)
        opts = PipelineOptions(
            inference_size=int(inference_size),
            is_transparent=bool(is_transparent),
            output_mode=str(output_mode),
            mask_refine=bool(mask_refine),
            trimap_constraint=float(trimap_constraint),
        )
        alpha, matted = pipe(img_np, tri_np, options=opts)
        # np.array (copy), not np.asarray: the jax-backed buffer is read-only
        # and torch.from_numpy would hand ComfyUI a non-writable tensor —
        # undefined behavior the moment a downstream node mutates its mask
        alpha_np = np.array(alpha, np.float32)
        matted_np = np.array(matted, np.float32)

        # Mirror the reference's post-run cache flush through the host's
        # policy hook (sdmatte_nodes.py:399-403); no-op outside ComfyUI.
        comfy_shim.soft_empty_cache()

        try:
            import torch
            return (torch.from_numpy(alpha_np), torch.from_numpy(matted_np))
        except ImportError:
            return (alpha_np, matted_np)


NODE_CLASS_MAPPINGS = {"SDMatteApply": SDMatteApply}
NODE_DISPLAY_NAME_MAPPINGS = {"SDMatteApply": "Apply SDMatte"}
