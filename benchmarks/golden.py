"""Golden-activation parity harness (BASELINE config 1: FP32 CPU parity ref).

Two halves:

  dump    — run THIS framework fp32 on CPU for a checkpoint + input pair and
            write per-module activations (rgb/aux latents, aux tokens, U-Net
            output, decoded image, alpha) to an .npz.
  compare — diff two such dumps (ours vs a torch-reference dump produced in
            an environment that has diffusers) and report per-tensor MAE
            against the 1e-2 end-to-end bound.

The torch-side dump is a ~30-line script against the reference plugin's
meta-arch (documented below) — it cannot run in this image (no diffusers),
so goldens are produced externally and checked in / mounted.

Key-manifest verification on a weights-capable host is a separate,
self-contained script: tools/verify_manifest_external.py (checkpoint-header
mode needs only the .safetensors file and the frozen manifest JSON — no
torch, no diffusers; see its docstring for the diffusers/reference modes).

Usage:
  python benchmarks/golden.py dump  --ckpt SDMatte.safetensors \
      --image img.png --trimap tri.png --size 512 --out ours.npz
  python benchmarks/golden.py compare ours.npz golden_torch.npz
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def dump(args):
    import jax
    jax.config.update("jax_platforms", "cpu")  # fp32 CPU parity reference
    import jax.numpy as jnp
    from sdmatte_tpu.configs import SDMatteConfig
    from sdmatte_tpu.core import imaging
    from sdmatte_tpu.models import sdmatte
    from sdmatte_tpu.checkpoint import load_sdmatte_checkpoint

    cfg = SDMatteConfig()
    params = sdmatte.init(cfg, seed=0)
    if args.ckpt:
        params, report = load_sdmatte_checkpoint(params, args.ckpt)
        print("checkpoint:", report.summary())

    from sdmatte_tpu.utils.images import load_unit_image
    img = load_unit_image(args.image, 3)
    tri = load_unit_image(args.trimap, 1)[..., 0]
    s = args.size
    img_r = imaging.resize_bilinear(jnp.asarray(img)[None], s, s)
    tri_r = imaging.resize_bilinear(jnp.asarray(tri)[None, ..., None], s, s)
    data = {
        "image": imaging.normalize_pm1(img_r),
        "trimap": imaging.normalize_pm1(tri_r),
        "trimap_coords": jnp.asarray([[0.0, 0.0, 1.0, 1.0]], jnp.float32),
        "is_trans": jnp.zeros((1,), jnp.float32),
    }
    alpha, inter = jax.jit(
        lambda p, d: sdmatte.forward(p, cfg, d, attn_impl="xla",
                                     return_intermediates=True))(params, data)
    out = {"alpha": np.asarray(alpha)}
    for k, v in inter.items():
        if v is not None:
            out[k] = np.asarray(v, np.float32)
    np.savez_compressed(args.out, **out)
    print("wrote", args.out, "keys:", sorted(out))


def compare(args):
    a = np.load(args.ours)
    b = np.load(args.golden)
    worst = 0.0
    for k in sorted(set(a.files) & set(b.files)):
        x, y = a[k], b[k]
        if k in ("rgb_latent", "aux_latent", "unet_out", "decoded"):
            # torch dumps are NCHW; ours NHWC
            if x.ndim == 4 and y.ndim == 4 and x.shape != y.shape:
                y = y.transpose(0, 2, 3, 1)
        mae = float(np.abs(x - y).mean())
        worst = max(worst, mae)
        print(f"{k:12s} MAE {mae:.6f}  shapes {x.shape} vs {y.shape}")
    missing = set(a.files) ^ set(b.files)
    if missing:
        print("only in one dump:", sorted(missing))
    ok = worst <= 1e-2
    print("PASS" if ok else "FAIL", f"(worst MAE {worst:.6f}, bound 1e-2)")
    return 0 if ok else 1


# Torch-side golden script (run where diffusers is available):
#   import torch, numpy as np
#   from src.modeling.SDMatte.meta_arch import SDMatte   # reference package
#   m = SDMatte(pretrained_repo, load_weight=False, use_aux_input=True,
#               aux_input="trimap", use_encoder_hidden_states=True,
#               use_attention_mask=True, add_noise=False)
#   m.load_state_dict(state_dict, strict=False); m.eval()
#   ... hook vae.encoder/quant_conv outputs, unet output, decoder output,
#   save as npz with keys matching the dump() above (NCHW is fine; compare()
#   transposes).


def main():
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    d = sub.add_parser("dump")
    d.add_argument("--ckpt", default=None)
    d.add_argument("--image", required=True)
    d.add_argument("--trimap", required=True)
    d.add_argument("--size", type=int, default=512)
    d.add_argument("--out", required=True)
    c = sub.add_parser("compare")
    c.add_argument("ours")
    c.add_argument("golden")
    args = ap.parse_args()
    if args.cmd == "dump":
        return dump(args)
    return compare(args)


if __name__ == "__main__":
    sys.exit(main())
