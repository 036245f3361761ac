"""Standalone CLI: image + trimap -> alpha / matted PNG, no ComfyUI needed.

Usage:
    python -m sdmatte_tpu.cli --image in.png --trimap tri.png --out alpha.png \
        [--ckpt SDMatte.safetensors] [--size 1024] [--mode alpha_only]
        [--refine/--no-refine] [--tc 0.8] [--cpu] [--random-weights]

``--random-weights`` builds the model without a checkpoint (smoke/benchmark
runs in weight-less environments).
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def _load_image(path: str, want_channels: int):
    from PIL import Image
    img = Image.open(path)
    arr = np.asarray(img, np.float32) / 255.0
    if arr.ndim == 2:
        arr = arr[..., None]
    if want_channels == 3:
        if arr.shape[-1] == 4:
            arr = arr[..., :3]
        elif arr.shape[-1] == 1:
            arr = np.repeat(arr, 3, axis=-1)
    elif want_channels == 1 and arr.shape[-1] > 1:
        arr = arr[..., :1]
    return arr


def _save_image(path: str, arr: np.ndarray):
    from PIL import Image
    a = np.clip(np.asarray(arr), 0.0, 1.0)
    Image.fromarray((a * 255.0 + 0.5).astype(np.uint8).squeeze()).save(path)


def main(argv=None):
    ap = argparse.ArgumentParser(description="SDMatte TPU-native matting CLI")
    ap.add_argument("--image", required=True)
    ap.add_argument("--trimap", required=True)
    ap.add_argument("--out", required=True, help="alpha PNG output path")
    ap.add_argument("--matted-out", default=None, help="matted image PNG path")
    ap.add_argument("--ckpt", default="SDMatte.safetensors",
                    help="checkpoint name or path")
    ap.add_argument("--size", type=int, default=1024,
                    choices=[512, 640, 768, 896, 1024])
    ap.add_argument("--mode", default="alpha_only",
                    choices=["alpha_only", "matted_rgba", "matted_rgb"])
    ap.add_argument("--refine", action=argparse.BooleanOptionalAction,
                    default=True)
    ap.add_argument("--tc", type=float, default=0.8, help="trimap constraint")
    ap.add_argument("--transparent", action="store_true")
    ap.add_argument("--prompt-type", default="trimap",
                    choices=["trimap", "mask", "bbox_mask", "point_mask",
                             "auto_mask"],
                    help="visual-prompt type; --trimap supplies the prompt "
                         "mask for all types")
    ap.add_argument("--coords", default=None,
                    help="comma-separated prompt coords (bbox: x0,y0,x1,y1 "
                         "normalized; points: x1,y1,x2,y2,...)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--fp32", action="store_true")
    ap.add_argument("--random-weights", action="store_true",
                    help="skip checkpoint loading (smoke runs)")
    args = ap.parse_args(argv)

    from .pipeline import MattingPipeline, PipelineOptions
    from .configs import SDMatteConfig
    from .core.dtypes import BF16, FP32

    image = _load_image(args.image, 3)
    trimap = _load_image(args.trimap, 1)[..., 0]

    t0 = time.time()
    policy = FP32 if (args.cpu or args.fp32) else BF16
    if args.random_weights:
        from .models import sdmatte
        cfg = SDMatteConfig()
        params = sdmatte.init(cfg, seed=0)
        pipe = MattingPipeline(params, cfg, policy=policy,
                               attn_impl="xla" if args.cpu else "auto")
    else:
        from .api.node import get_pipeline
        import os
        if os.path.isfile(args.ckpt):
            from .api import comfy_shim
            comfy_shim.add_model_folder_path(
                "SDMatte", os.path.dirname(os.path.abspath(args.ckpt)))
            args.ckpt = os.path.basename(args.ckpt)
        pipe = get_pipeline(args.ckpt, force_cpu=args.cpu,
                            policy_name="fp32" if args.fp32 else "bf16")
    print(f"[cli] model ready in {time.time() - t0:.1f}s", file=sys.stderr)

    opts = PipelineOptions(inference_size=args.size,
                           is_transparent=args.transparent,
                           output_mode=args.mode, mask_refine=args.refine,
                           trimap_constraint=args.tc,
                           aux_input=args.prompt_type)
    coords = None
    if args.coords:
        coords = np.asarray([[float(v) for v in args.coords.split(",")]],
                            np.float32)
    t0 = time.time()
    alpha, matted = pipe(image, trimap, options=opts, coords=coords)
    import jax
    jax.block_until_ready((alpha, matted))
    print(f"[cli] matted in {time.time() - t0:.2f}s", file=sys.stderr)

    _save_image(args.out, np.asarray(alpha)[0])
    if args.matted_out:
        _save_image(args.matted_out, np.asarray(matted)[0])
    return 0


if __name__ == "__main__":
    sys.exit(main())
