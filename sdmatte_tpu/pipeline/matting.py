"""End-to-end matting pipeline: ONE jit-compiled XLA graph per shape bucket.

The reference splits the flow across host and device: torchvision preprocess,
torch forward under autocast, CPU postprocess with boolean indexing
(reference sdmatte_nodes.py:339-397), and rebuilds the model + reloads 11 GB
of weights on EVERY node call (sdmatte_nodes.py:286-323 — SURVEY.md §3.2
flags this as the design flaw to fix).

Here:
  * the flow runs as three chained on-device jit graphs — pre (resize+
    normalize), heavy (VAE encodes -> U-Net -> decode), post (resize-back ->
    refine -> composite) — so the model graph is keyed ONLY on
    (batch, inference-size, prompt-type, text?) and arbitrary input sizes
    never recompile it; the 5 supported inference sizes
    (512/640/768/896/1024 — reference sdmatte_nodes.py:226-229) bound its
    bucket count.  Host work is array handoff only.
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
                 vae_chunk: Optional[int] = None, vae_int8: bool = False,
                 weight_storage: str = "fp",
                 vae_encode_split: Optional[bool] = None,
                 speed_mode: str = "off"):
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
        # None = auto: split the rgb/aux VAE encode into two passes when the
        # concat batch would exceed 16 (the measured b>8 HBM cliff — see
        # sdmatte.forward)
        self.vae_encode_split = vae_encode_split
        # OPT-IN out-of-parity speed modes (VERDICT r3 item 8; never
        # default): "aux_half" encodes the aux mask at S/2 + latent 2x
        # upsample; "rgb_half" does the same for the rgb image;
        # "decode_half" decodes the alpha latent at half resolution;
        # "fast" = aux_half+decode_half; "fastest" = all three.  Quality
        # deltas per checkpoint: benchmarks/ab_speed_modes.py.
        if speed_mode not in ("off", "aux_half", "rgb_half", "decode_half",
                              "fast", "fastest"):
            raise ValueError(f"unknown speed_mode {speed_mode!r}")
        self.speed_mode = speed_mode
        if weight_storage not in ("fp", "int8"):
            raise ValueError(f"weight_storage must be 'fp' or 'int8', "
                             f"got {weight_storage!r}")
        self.weight_storage = weight_storage
        # Text-tower residency: under the default all-aux gating the text
        # encoder is never consumed by any stage (SURVEY.md §7 — the
        # reference computes it and discards it, meta_arch.py:225-234 +
        # replace.py:413-416; we already skip the compute), so its ~0.7 GB
        # of params never need to be on the device at all.  HBM freed here
        # converts straight into batch slots at 1024px.
        params = dict(params)
        text_unused = all(cfg.unet.use_encoder_hidden_states_list)
        if text_unused and "text_encoder" in params:
            params["text_encoder"] = {}
        if vae_int8:
            # opt-in speed mode: int8 3x3 VAE convs (2x MXU MAC rate);
            # quality budget measured by benchmarks/quality.py --vae-int8.
            # Must run BEFORE int8 weight storage: compress_tree_int8
            # replaces "kernel" with "kernel_i8", which would hide every
            # large VAE conv from quantize_vae_tree's "kernel" check and
            # silently drop the requested int8 compute (compress skips
            # kernel_q dicts, so this order composes).
            from ..ops.quant import quantize_vae_tree
            params["vae"] = quantize_vae_tree(params["vae"])
        if weight_storage == "int8":
            # int8 weight STORAGE, bf16 compute: kernels sit in HBM as
            # int8 + per-channel scale and dequantize at their use site
            # (core/nn.kernel_of) — halves resident weight HBM so larger
            # batches fit unchunked (ops/quant.compress_tree_int8; distinct
            # from the measured-slower int8 COMPUTE path).
            from ..ops.quant import compress_tree_int8
            params = {k: (compress_tree_int8(v) if k in ("unet", "vae")
                          else v)
                      for k, v in params.items()}
        # move params to device once, in compute dtype for the big tensors;
        # int8 kernels (stored OR compute) and their fp32 scales keep their
        # own dtypes (casting a scale to bf16 would stack a second rounding
        # on top of the int8 one)
        def _stage(path, x):
            name = getattr(path[-1], "key", None) if path else None
            if name in ("kernel_i8", "kernel_s", "kernel_q", "kernel_scale"):
                return jnp.asarray(x)
            return jnp.asarray(x, policy.param_dtype)
        self.params = jax.tree_util.tree_map_with_path(_stage, params)
        # traces per graph kind (observability + the recompile-bound tests)
        self._trace_counts = {"pre": 0, "heavy": 0, "post": 0}
        self._pre_cache: dict = {}
        self._heavy_cache: dict = {}
        self._post_cache: dict = {}

    # -- traced bodies ------------------------------------------------------
    #
    # The flow is split into three graphs so arbitrary input sizes never
    # recompile the expensive one (VERDICT round 1, item 5 — the reference
    # handles any input size recompile-free because its resize-back is
    # host-side, sdmatte_nodes.py:362):
    #   pre   (tiny,  keyed on orig_hw+size): resize+normalize to (S, S)
    #   heavy (model, keyed on batch/size/aux/text ONLY): VAE+U-Net+decode
    #   post  (tiny,  keyed on orig_hw+size+mode): resize-back, refine,
    #          composite at the original resolution
    # Op order and numerics are identical to the former fused graph; XLA
    # pipelines the three dispatches back-to-back (all stay on device).

    def _pre(self, image, prompt_mask, *, size: int):
        """image (B,H,W,3) [0,1]; prompt_mask (B,H,W) [0,1] -> (S,S) pair."""
        self._trace_counts["pre"] += 1
        pol = self.policy
        img = imaging.resize_bilinear(image, size, size, antialias=True)
        img = imaging.normalize_pm1(img).astype(pol.compute_dtype)
        pm = imaging.resize_bilinear(prompt_mask[..., None], size, size,
                                     antialias=True)
        pm = imaging.normalize_pm1(pm).astype(pol.compute_dtype)
        return img, pm

    def _heavy(self, params, img, pm, coords, is_trans, text_ids, *,
               aux_type: str):
        """Preprocessed (B,S,S) inputs -> model alpha (B,S,S) fp32 [0,1]."""
        self._trace_counts["heavy"] += 1
        data = {
            "image": img,
            aux_type: pm,
            AUX_INPUT_COORDS[aux_type]: coords,
            "is_trans": is_trans,
        }
        if text_ids is not None:
            data["text_ids"] = text_ids
        alpha = sdmatte.forward(params, self.cfg, data,
                                aux_input_type=aux_type, policy=self.policy,
                                attn_impl=self.attn_impl,
                                vae_chunk=self.vae_chunk,
                                vae_encode_split=self.vae_encode_split,
                                speed_aux_half=self.speed_mode in
                                ("aux_half", "fast", "fastest"),
                                speed_rgb_half=self.speed_mode in
                                ("rgb_half", "fastest"),
                                speed_decode_half=self.speed_mode in
                                ("decode_half", "fast", "fastest"))
        if isinstance(alpha, tuple):
            # cfg.use_dis_loss=True makes forward() return
            # (alpha, feature_maps) — a training-era hook (reference
            # meta_arch.py:39); inference keeps only the alpha
            alpha = alpha[0]
        return alpha.astype(jnp.float32)[..., 0]

    def _post(self, alpha_s, image, prompt_mask, *, orig_hw, output_mode: str,
              refine: bool, trimap_constraint: float):
        """Model alpha (B,S,S) + ORIGINAL-res image/mask -> (alpha, matted).

        Mirrors the reference's host postprocess (sdmatte_nodes.py:362-397):
        resize back, clamp, trimap-constrained refine against the
        original-resolution trimap, composite."""
        self._trace_counts["post"] += 1
        oh, ow = orig_hw
        alpha = imaging.resize_bilinear(alpha_s[..., None], oh, ow,
                                        antialias=True)
        alpha = jnp.clip(alpha[..., 0], 0.0, 1.0)
        if refine:
            alpha = postprocess.mask_refine(alpha, prompt_mask, trimap_constraint)
        matted = postprocess.composite(image, alpha, prompt_mask, output_mode)
        return alpha, matted

    # Per-INSTANCE compiled-fn caches (dicts created in __init__, FIFO-capped).
    # NOT functools.lru_cache on the methods: a class-level lru_cache keys on
    # `self` and holds a strong reference forever, pinning every pipeline —
    # and its on-device param tree — for the life of the process (a real HBM
    # leak for anything that constructs pipelines repeatedly).

    def _memo(self, store: dict, key, build, cap: int):
        if key not in store:
            if len(store) >= cap:
                store.pop(next(iter(store)))
            store[key] = build()
        return store[key]

    def _compiled_pre(self, size: int):
        return self._memo(self._pre_cache, size,
                          lambda: jax.jit(functools.partial(self._pre,
                                                            size=size)), 16)

    def _compiled_heavy(self, aux_type: str, has_text: bool):
        def build():
            # model_jit: raised scoped-VMEM compile + the fused-conv
            # dispatch overlay it unlocks (ops/dispatch.py) — exactly
            # jax.jit on CPU or with SDMATTE_NO_SVMEM=1
            from ..ops.dispatch import model_jit
            fn = functools.partial(self._heavy, aux_type=aux_type)
            if not has_text:
                return model_jit(lambda p, i, m, c, t: fn(p, i, m, c, t, None))
            return model_jit(fn)
        return self._memo(self._heavy_cache, (aux_type, has_text), build, 16)

    def _compiled_post(self, orig_hw, output_mode: str, refine: bool,
                       trimap_constraint: float):
        key = (orig_hw, output_mode, refine, trimap_constraint)
        return self._memo(
            self._post_cache, key,
            lambda: jax.jit(functools.partial(
                self._post, orig_hw=orig_hw, output_mode=output_mode,
                refine=refine, trimap_constraint=trimap_constraint)), 64)

    # -- public entry -----------------------------------------------------

    def warmup(self, *, sizes: Sequence[int] = (1024,),
               batch_sizes: Sequence[int] = (1,),
               options: Optional[PipelineOptions] = None) -> dict:
        """Precompile the pipeline graphs for the given configs by running
        zero-filled dummies through them, so deployment pays the 20-40s+
        first-compile cost at startup instead of on the first user request
        (the TPU analogue of the reference README's 'first run is slow,
        needs to compile CUDA kernels' caveat, reference README.md:183).

        Warms pre/heavy/post for every (inference_size, batch) pair with
        inputs AT the inference size (callers with other input resolutions
        only re-trace the tiny pre/post graphs).  Returns
        {(size, batch): seconds} compile+run timings."""
        import time
        base = options or PipelineOptions()
        timings = {}
        for size in sizes:
            opts = dataclasses.replace(base, inference_size=size)
            for b in batch_sizes:
                t0 = time.perf_counter()
                img = jnp.zeros((b, size, size, 3), jnp.float32)
                pm = jnp.zeros((b, size, size), jnp.float32)
                alpha, matted = self(img, pm, options=opts)
                jax.block_until_ready((alpha, matted))
                timings[(size, b)] = round(time.perf_counter() - t0, 3)
        return timings

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

        img_s, pm_s = self._compiled_pre(options.inference_size)(
            image, prompt_mask)
        heavy = self._compiled_heavy(aux_type, text_ids is not None)
        if text_ids is None:
            alpha_s = heavy(self.params, img_s, pm_s, coords, is_trans)
        else:
            alpha_s = heavy(self.params, img_s, pm_s, coords, is_trans, text_ids)
        post = self._compiled_post((h, w), options.output_mode,
                                   options.mask_refine,
                                   options.trimap_constraint)
        # stays async (no sync barrier): callers pipeline batches; the
        # serving layer records end-to-end latency (api/serve.py)
        return post(alpha_s, image, prompt_mask)
