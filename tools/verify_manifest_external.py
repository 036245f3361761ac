#!/usr/bin/env python3
"""De-circularize the UNet/VAE key manifest on a weights/diffusers-capable host.

The frozen manifest (sdmatte_tpu/checkpoint/sdmatte_expected_keys.json) is
hand-derived from reading the reference's CustomUNet/AutoencoderKL topology;
the CLIP portion is already derived from the installed ``transformers``
library (non-circular), but the UNet/VAE portions have never been diffed
against an artifact this repo didn't produce (VERDICT round 2, missing item
3 / next-round item 5).  This dev environment has neither ``diffusers`` nor
network access, so this script is SELF-CONTAINED (stdlib only for mode 1):
copy it plus the manifest JSON to any host that has the missing artifact and
run one of:

1. **Checkpoint-header mode** (strongest; needs ONLY the 11 GB file, no
   torch/diffusers — the safetensors header is plain JSON):

       python verify_manifest_external.py --manifest sdmatte_expected_keys.json \
           --ckpt /path/to/SDMatte.safetensors

2. **diffusers mode** (needs ``pip install diffusers torch``): meta-device
   instantiates a stock SD2.1 ``UNet2DConditionModel``/``AutoencoderKL`` and
   diffs their ``state_dict()`` keys, accounting for the SDMatte surgery
   extras the reference adds on top (widened conv_in is a shape change only;
   aux_conv_in / point_embedding / bbox_embedding are added keys —
   reference src/utils/utils.py:13-41, replace.py:198-200):

       python verify_manifest_external.py --manifest sdmatte_expected_keys.json \
           --diffusers

3. **Reference-repo mode** (exact: imports the reference's own CustomUNet):

       python verify_manifest_external.py --manifest sdmatte_expected_keys.json \
           --reference /path/to/ComfyUI-SDMatte

Exit code 0 = manifest exactly matches (modulo documented ignorables:
text_encoder.text_model.embeddings.position_ids buffer, scheduler-less
extras); nonzero prints the full diff.
"""

from __future__ import annotations

import argparse
import json
import struct
import sys


def load_manifest(path: str) -> dict:
    with open(path) as f:
        m = json.load(f)
    # frozen file format: {key: [shape...]} possibly nested under "keys"
    if "keys" in m and isinstance(m["keys"], dict):
        m = m["keys"]
    return {k: tuple(v) for k, v in m.items()}


IGNORABLE_SUFFIXES = ("position_ids", "num_batches_tracked")


def diff(expected: dict, actual: dict, scope: str = "") -> int:
    if scope:
        expected = {k: v for k, v in expected.items() if k.startswith(scope)}
        actual = {k: v for k, v in actual.items() if k.startswith(scope)}
    actual = {k: v for k, v in actual.items()
              if not k.endswith(IGNORABLE_SUFFIXES)}
    missing = sorted(set(expected) - set(actual))
    unexpected = sorted(set(actual) - set(expected))
    mismatched = sorted(k for k in set(expected) & set(actual)
                        if tuple(expected[k]) != tuple(actual[k]))
    for k in missing:
        print(f"MISSING (in manifest, not in artifact): {k} {expected[k]}")
    for k in unexpected:
        print(f"UNEXPECTED (in artifact, not in manifest): {k} {actual[k]}")
    for k in mismatched:
        print(f"SHAPE MISMATCH: {k} manifest={expected[k]} artifact={actual[k]}")
    n = len(missing) + len(unexpected) + len(mismatched)
    print(f"[{scope or 'all'}] expected={len(expected)} actual={len(actual)} "
          f"problems={n}")
    return n


def keys_from_safetensors_header(path: str) -> dict:
    """Read key -> shape from the 8-byte-length-prefixed JSON header."""
    with open(path, "rb") as f:
        (hlen,) = struct.unpack("<Q", f.read(8))
        header = json.loads(f.read(hlen))
    return {k: tuple(v["shape"]) for k, v in header.items()
            if k != "__metadata__"}


def keys_from_diffusers() -> dict:
    import torch
    from diffusers import AutoencoderKL, UNet2DConditionModel

    with torch.device("meta"):
        vae = AutoencoderKL(
            in_channels=3, out_channels=3, latent_channels=4,
            block_out_channels=(128, 256, 512, 512), layers_per_block=2,
            down_block_types=("DownEncoderBlock2D",) * 4,
            up_block_types=("UpDecoderBlock2D",) * 4,
            norm_num_groups=32, sample_size=768)
        unet = UNet2DConditionModel(
            in_channels=8,                       # post-surgery widened conv_in
            out_channels=4, sample_size=96,
            block_out_channels=(320, 640, 1280, 1280), layers_per_block=2,
            cross_attention_dim=1024, attention_head_dim=(5, 10, 20, 20),
            use_linear_projection=True, norm_num_groups=32,
            down_block_types=("CrossAttnDownBlock2D",) * 3 + ("DownBlock2D",),
            up_block_types=("UpBlock2D",) + ("CrossAttnUpBlock2D",) * 3)
    out = {}
    for k, v in vae.state_dict().items():
        out["vae." + k] = tuple(v.shape)
    for k, v in unet.state_dict().items():
        out["unet." + k] = tuple(v.shape)
    # SDMatte extras the surgery adds (utils.py:33-41, replace.py:198-200):
    out["unet.aux_conv_in.weight"] = (1024, 4, 3, 3)
    out["unet.aux_conv_in.bias"] = (1024,)
    for head, cin in (("point_embedding", 1680), ("bbox_embedding", 1280)):
        out[f"unet.{head}.linear_1.weight"] = (1280, cin)
        out[f"unet.{head}.linear_1.bias"] = (1280,)
        out[f"unet.{head}.linear_2.weight"] = (1280, 1280)
        out[f"unet.{head}.linear_2.bias"] = (1280,)
    return out


def keys_from_reference(ref_path: str) -> dict:
    import torch
    sys.path.insert(0, ref_path)
    from src.utils.replace import CustomUNet          # reference's own class
    from src.utils.utils import add_aux_conv_in, replace_unet_conv_in

    with torch.device("meta"):
        unet = CustomUNet(
            in_channels=4, out_channels=4, sample_size=96,
            block_out_channels=(320, 640, 1280, 1280), layers_per_block=2,
            cross_attention_dim=1024, attention_head_dim=(5, 10, 20, 20),
            use_linear_projection=True,
            down_block_types=("CrossAttnDownBlock2D",) * 3 + ("DownBlock2D",),
            up_block_types=("UpBlock2D",) + ("CrossAttnUpBlock2D",) * 3,
            point_embeddings_input_dim=1680, bbox_embeddings_input_dim=1280,
            bbox_time_embed_dim=1280)
        unet = add_aux_conv_in(unet)
        unet = replace_unet_conv_in(unet, 2)
    return {("unet." + k): tuple(v.shape) for k, v in unet.state_dict().items()}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--manifest", required=True)
    ap.add_argument("--ckpt")
    ap.add_argument("--diffusers", action="store_true")
    ap.add_argument("--reference")
    args = ap.parse_args()

    expected = load_manifest(args.manifest)
    problems = 0
    if args.ckpt:
        problems += diff(expected, keys_from_safetensors_header(args.ckpt))
    if args.diffusers:
        actual = keys_from_diffusers()
        problems += diff(expected, actual, scope="vae.")
        problems += diff(expected, actual, scope="unet.")
    if args.reference:
        problems += diff(expected, keys_from_reference(args.reference),
                         scope="unet.")
    if not (args.ckpt or args.diffusers or args.reference):
        ap.error("pick at least one of --ckpt / --diffusers / --reference")
    sys.exit(1 if problems else 0)


if __name__ == "__main__":
    main()
