"""Opt-in speed modes: throughput + quality-delta table (VERDICT r3 item 8).

Parity-safe levers are measured out (docs/ROADMAP.md); these are the honest
next step — OUT-OF-PARITY modes, never default-on, each with a measured
speed factor and a measured deviation from the parity pipeline:

  aux_half     aux mask encoded at S/2, latent upsampled 2x
  rgb_half     rgb image encoded at S/2, latent upsampled 2x
  decode_half  alpha latent decoded at half resolution
  fast         aux_half + decode_half
  fastest      all three

Speed is checkpoint-independent (same graphs).  The quality delta printed
here is vs the parity pipeline ON THE SAME WEIGHTS: with --ckpt it is the
true per-mode quality cost; without, random full-size weights make it an
upper-bound characterization (random nets amplify perturbations — a real
checkpoint's smooth decoder shrinks these numbers, not grows them).

Run: nohup python -u benchmarks/ab_speed_modes.py > /tmp/ab_speed.log 2>&1 &
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp_cache"))

import numpy as np  # noqa: E402
import jax  # noqa: E402

from sdmatte_tpu.configs import SDMatteConfig  # noqa: E402
from sdmatte_tpu.core.dtypes import BF16  # noqa: E402
from sdmatte_tpu.models import sdmatte  # noqa: E402
from sdmatte_tpu.pipeline import MattingPipeline, PipelineOptions  # noqa: E402
from sdmatte_tpu.eval import synthetic, metrics  # noqa: E402
from ab_bigbatch import bench  # noqa: E402

MODES = ("off", "decode_half", "aux_half", "rgb_half", "fast", "fastest",
         "off")  # off brackets


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--quality-size", type=int, default=512)
    args = ap.parse_args()

    print("backend:", jax.default_backend(), flush=True)
    cfg = SDMatteConfig()
    params = sdmatte.init(cfg, seed=0)
    if args.ckpt:
        from sdmatte_tpu.checkpoint import load_sdmatte_checkpoint
        params, rep = load_sdmatte_checkpoint(params, args.ckpt)
        print("ckpt:", rep.summary(), flush=True)

    cases = synthetic.make_eval_set(args.quality_size)[:2]
    qopts = PipelineOptions(inference_size=args.quality_size,
                            mask_refine=False)
    base_alpha = None
    for mode in MODES:
        pipe = MattingPipeline(params, cfg, policy=BF16, attn_impl="auto",
                               speed_mode=mode)
        try:
            t = bench(pipe, args.batch)
        except Exception as e:
            print(f"{mode:12s}: timed FAIL {str(e)[-110:]}", flush=True)
            del pipe
            jax.clear_caches()
            continue
        line = f"{mode:12s}: {t*1e3:8.1f} ms  {args.batch/t:6.3f} mattes/s"
        # quality vs the parity pipeline on the same weights
        alphas = [np.asarray(pipe(c["image"][None], c["trimap"][None],
                                  options=qopts)[0])[0] for c in cases]
        if mode == "off" and base_alpha is None:
            base_alpha = alphas
        elif base_alpha is not None:
            mae = float(np.mean([np.abs(a - b).mean()
                                 for a, b in zip(alphas, base_alpha)]))
            dsad = float(np.mean(
                [metrics.evaluate(a, c["alpha_gt"], trimap=c["trimap"])["SAD"]
                 - metrics.evaluate(b, c["alpha_gt"], trimap=c["trimap"])["SAD"]
                 for a, b, c in zip(alphas, base_alpha, cases)]))
            line += f"  | alpha MAE vs parity {mae:.4f}  dSAD {dsad:+.2f}"
        print(line, flush=True)
        del pipe
        jax.clear_caches()


if __name__ == "__main__":
    main()
