"""End-to-end matting pipeline: ONE jit-compiled XLA graph per shape bucket.

The reference splits the flow across host and device: torchvision preprocess,
torch forward under autocast, CPU postprocess with boolean indexing
(reference sdmatte_nodes.py:339-397), and rebuilds the model + reloads 11 GB
of weights on EVERY node call (sdmatte_nodes.py:286-323 — SURVEY.md §3.2
flags this as the design flaw to fix).

Here:
  * preprocess -> VAE encodes -> U-Net -> decode -> resize-back -> refine ->
    composite is a single traced function; host work is only array handoff.
  * compiled executables are cached per (batch, in-size, inference-size,
    output-mode, refine, prompt-type) bucket; the 5 supported inference sizes
    (512/640/768/896/1024 — reference sdmatte_nodes.py:226-229) bound the
    bucket count.
  * params live on device once, shared across calls.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from ..configs import SDMatteConfig, AUX_INPUT_COORDS
from ..core.dtypes import Policy, FP32, policy_for
from ..core import imaging
from ..models import sdmatte
from . import postprocess

INFERENCE_SIZES = (512, 640, 768, 896, 1024)


@dataclasses.dataclass(frozen=True)
class PipelineOptions:
    """User-facing knobs — mirrors the reference node's INPUT_TYPES schema
    (reference sdmatte_nodes.py:219-250)."""
    inference_size: int = 1024
    is_transparent: bool = False
    output_mode: str = "alpha_only"
    mask_refine: bool = True
    trimap_constraint: float = 0.8
    aux_input: str = "trimap"


class MattingPipeline:
    def __init__(self, params, cfg: SDMatteConfig, *, policy: Policy = FP32,
                 attn_impl: str = "auto", tokenizer=None,
                 vae_chunk: Optional[int] = None):
        self.cfg = cfg
        self.policy = policy
        self.attn_impl = attn_impl
        self.tokenizer = tokenizer
        # Optional: run pixel-space VAE stages in <=vae_chunk-image lax.map
        # groups.  Caps peak HBM for very large batches, but measured ~2x
        # slower at b8@1024 on v5e (map serializes and defeats XLA's
        # cross-stage scheduling) — so OFF by default; enable only when a
        # batch otherwise OOMs.
        self.vae_chunk = vae_chunk
        # move params to device once, in compute dtype for the big tensors
        self.params = jax.tree_util.tree_map(
            lambda x: jnp.asarray(x, policy.param_dtype), params)

    # -- traced body ------------------------------------------------------

    def _run(self, params, image, prompt_mask, coords, is_trans, text_ids, *,
             size: int, orig_hw, output_mode: str, refine: bool,
             trimap_constraint: float, aux_type: str):
        """image (B,H,W,3) [0,1]; prompt_mask (B,H,W) [0,1]; coords (B,K)."""
        oh, ow = orig_hw
        pol = self.policy

        img = imaging.resize_bilinear(image, size, size, antialias=True)
        img = imaging.normalize_pm1(img).astype(pol.compute_dtype)
        pm = imaging.resize_bilinear(prompt_mask[..., None], size, size,
                                     antialias=True)
        pm = imaging.normalize_pm1(pm).astype(pol.compute_dtype)

        data = {
            "image": img,
            aux_type: pm,
            AUX_INPUT_COORDS[aux_type]: coords,
            "is_trans": is_trans,
        }
        if text_ids is not None:
            data["text_ids"] = text_ids

        alpha = sdmatte.forward(params, self.cfg, data,
                                aux_input_type=aux_type, policy=pol,
                                attn_impl=self.attn_impl,
                                vae_chunk=self.vae_chunk)
        # resize back to original resolution (reference sdmatte_nodes.py:362)
        alpha = imaging.resize_bilinear(alpha.astype(jnp.float32), oh, ow,
                                        antialias=True)
        alpha = jnp.clip(alpha[..., 0], 0.0, 1.0)
        if refine:
            alpha = postprocess.mask_refine(alpha, prompt_mask, trimap_constraint)
        matted = postprocess.composite(image, alpha, prompt_mask, output_mode)
        return alpha, matted

    @functools.lru_cache(maxsize=32)
    def _compiled(self, size: int, orig_hw, output_mode: str, refine: bool,
                  trimap_constraint: float, aux_type: str, has_text: bool):
        fn = functools.partial(
            self._run, size=size, orig_hw=orig_hw, output_mode=output_mode,
            refine=refine, trimap_constraint=trimap_constraint,
            aux_type=aux_type)
        if not has_text:
            fn2 = lambda p, i, m, c, t: fn(p, i, m, c, t, None)  # noqa: E731
            return jax.jit(fn2)
        return jax.jit(fn)

    # -- public entry -----------------------------------------------------

    def __call__(self, image, prompt_mask, *, options: PipelineOptions,
                 coords=None, caption: Optional[Sequence[str]] = None):
        """image (B,H,W,3) or (H,W,3) in [0,1]; prompt_mask (B,H,W)/(H,W).

        Returns (alpha (B,H,W), matted (B,H,W,3|4)) as jnp arrays.
        """
        image = jnp.asarray(image, jnp.float32)
        if image.ndim == 3:
            image = image[None]
        prompt_mask = jnp.asarray(prompt_mask, jnp.float32)
        if prompt_mask.ndim == 2:
            prompt_mask = prompt_mask[None]
        b, h, w, _ = image.shape
        aux_type = options.aux_input

        if coords is None:
            coords = np.tile(np.asarray([[0.0, 0.0, 1.0, 1.0]], np.float32), (b, 1))
        coords = jnp.asarray(coords, jnp.float32)

        is_trans = jnp.full((b,), 1.0 if options.is_transparent else 0.0, jnp.float32)

        text_ids = None
        if not all(self.cfg.unet.use_encoder_hidden_states_list):
            prompts = list(caption) if caption else [""] * b
            if self.tokenizer is None:
                raise ValueError("text-conditioned gating requires a tokenizer")
            text_ids = jnp.asarray(self.tokenizer(prompts), jnp.int32)

        fn = self._compiled(options.inference_size, (h, w),
                            options.output_mode, options.mask_refine,
                            options.trimap_constraint, aux_type,
                            text_ids is not None)
        # stays async (no sync barrier): callers pipeline batches; the
        # serving layer records end-to-end latency (api/serve.py)
        if text_ids is None:
            return fn(self.params, image, prompt_mask, coords, is_trans)
        return fn(self.params, image, prompt_mask, coords, is_trans, text_ids)
