"""Runnable fine-tune example: the full training stack in one script.

The reference ships no training code (stripped upstream — SURVEY.md §0);
this demonstrates the TPU-native stack end to end:

  * composite data pipeline with augmentation + one-step-ahead prefetch
  * warmup-cosine LR, composite matting loss (L1 + uncertainty-band)
  * reference-parity tower freezing (only the U-Net trains,
    reference meta_arch.py:73-75) — pass --train-all to unfreeze
  * optional per-block rematerialization (--remat) for bigger batches
  * EMA weight tracking (--ema-decay), checkpoints + resume, and export
    to the reference-compatible safetensors layout

Smoke (CPU, ~2 min):
  python examples/finetune.py --tiny --cpu --steps 5 --out /tmp/ft

Real (one TPU chip, random-init full-size model):
  python examples/finetune.py --steps 200 --batch 4 --size 512 --remat \
      --ema-decay 0.999 --out /tmp/ft_full

Multi-chip: the same script DP-shards over all visible devices via
--mesh (each step all-reduces gradients over ICI).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp_cache"))

import jax  # noqa: E402


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--size", type=int, default=64,
                    help="composite/train resolution (multiple of 64)")
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--tiny", action="store_true",
                    help="tiny CI config instead of the full-size model")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--mesh", action="store_true",
                    help="DP-shard the batch over all visible devices")
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--train-all", action="store_true",
                    help="unfreeze the vae/text towers (reference keeps "
                         "them frozen)")
    ap.add_argument("--ema-decay", type=float, default=0.0)
    ap.add_argument("--out", default="/tmp/sdmatte_finetune",
                    help="checkpoint/export directory")
    args = ap.parse_args(argv)

    if args.cpu:
        # the axon TPU plugin ignores JAX_PLATFORMS=cpu; force in-process
        jax.config.update("jax_platforms", "cpu")

    from sdmatte_tpu.configs import SDMatteConfig
    from sdmatte_tpu.models import sdmatte
    from sdmatte_tpu.parallel import train as ptrain
    from sdmatte_tpu.parallel import checkpointing
    from sdmatte_tpu.parallel.data import CompositeSampler
    from sdmatte_tpu.parallel.mesh import make_mesh

    cfg = SDMatteConfig.tiny() if args.tiny else SDMatteConfig()
    params = sdmatte.init(cfg, seed=0)
    mesh = make_mesh() if args.mesh else None
    print(f"backend={jax.default_backend()} devices={len(jax.devices())} "
          f"mesh={'on' if mesh else 'off'}", flush=True)

    result = ptrain.train_loop(
        params, cfg,
        steps=args.steps, batch_size=args.batch, mesh=mesh,
        sampler=CompositeSampler(size=args.size, seed=jax.process_index()),
        learning_rate=ptrain.make_lr_schedule(
            args.lr, warmup_steps=max(2, args.steps // 10),
            total_steps=args.steps),
        loss_cfg=ptrain.LossConfig(l1=1.0, unknown_l1=1.0, grad_l1=0.5),
        frozen=() if args.train_all else ptrain.FROZEN_TOWERS,
        remat=args.remat, ema_decay=args.ema_decay,
        ckpt_dir=os.path.join(args.out, "ckpts"),
        ckpt_every=max(1, args.steps // 2), log_every=1)
    params, losses = result[0], result[1]
    ema = result[2] if args.ema_decay else None

    print(f"loss: {losses[0]:.4f} -> {losses[-1]:.4f} "
          f"over {args.steps} steps", flush=True)

    export = os.path.join(args.out, "finetuned.safetensors")
    checkpointing.export_reference_checkpoint(ema if ema is not None
                                              else params, export)
    kind = "EMA" if ema is not None else "live"
    print(f"exported {kind} weights (reference-compatible layout): {export}",
          flush=True)


if __name__ == "__main__":
    main()
