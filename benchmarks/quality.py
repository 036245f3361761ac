"""Quality harness: SAD / MSE / Grad / Conn on the synthetic-composite set.

    python benchmarks/quality.py [--tiny] [--size 256] [--ckpt path.safetensors]

Runs the full matting pipeline on procedurally generated composites with
exact ground-truth alphas (sdmatte_tpu/eval/synthetic.py) and prints the
standard matting metrics table.  With real SDMatte weights (--ckpt) this
reports true model quality; without, it exercises the identical scoring path
end-to-end (random weights — the numbers characterize the harness, not the
model).  The reference never reproduced its paper's metrics in-repo
(SURVEY.md §6); this makes them one command.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp_cache"))

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true", help="tiny CI model")
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--infer-size", type=int, default=None)
    ap.add_argument("--ckpt", default=None, help="SDMatte safetensors path")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--vae-int8", action="store_true",
                    help="also score the int8-VAE speed mode and report the "
                         "delta vs the bf16 pipeline (quality budget gate)")
    args = ap.parse_args()

    if args.cpu or args.tiny:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from sdmatte_tpu.configs import SDMatteConfig
    from sdmatte_tpu.core.dtypes import BF16, FP32
    from sdmatte_tpu.eval import evaluate
    from sdmatte_tpu.eval.synthetic import make_eval_set
    from sdmatte_tpu.models import sdmatte
    from sdmatte_tpu.pipeline import MattingPipeline, PipelineOptions

    cfg = SDMatteConfig.tiny() if args.tiny else SDMatteConfig()
    params = sdmatte.init(cfg, seed=0)
    if args.ckpt:
        from sdmatte_tpu.checkpoint.loader import load_sdmatte_checkpoint
        params, report = load_sdmatte_checkpoint(params, args.ckpt)
        print("checkpoint:", report.summary())
    pipe = MattingPipeline(params, cfg, policy=FP32 if args.tiny else BF16,
                           attn_impl="auto" if not args.tiny else "xla")

    pipes = {"bf16": pipe}
    if args.vae_int8:
        pipes["int8"] = MattingPipeline(
            params, cfg, policy=FP32 if args.tiny else BF16,
            attn_impl="auto" if not args.tiny else "xla", vae_int8=True)

    infer = args.infer_size or (64 if args.tiny else 512)
    opts = PipelineOptions(inference_size=infer, mask_refine=True)
    rows = []
    int8_mae = []
    for case in make_eval_set(args.size):
        alpha, _ = pipes["bf16"](case["image"], case["trimap"], options=opts)
        pred = np.asarray(alpha)[0]
        m = evaluate(pred, case["alpha_gt"], case["trimap"])
        m["case"] = case["name"]
        rows.append(m)
        if "int8" in pipes:
            a8, _ = pipes["int8"](case["image"], case["trimap"], options=opts)
            int8_mae.append(float(np.abs(np.asarray(a8)[0] - pred).mean()))

    hdr = f"{'case':16s} {'SAD':>9s} {'MSE':>9s} {'Grad':>9s} {'Conn':>9s}"
    print(hdr)
    print("-" * len(hdr))
    for r in rows:
        print(f"{r['case']:16s} {r['SAD']:9.3f} {r['MSE']:9.5f} "
              f"{r['Grad']:9.3f} {r['Conn']:9.3f}")
    mean = {k: float(np.mean([r[k] for r in rows]))
            for k in ("SAD", "MSE", "Grad", "Conn")}
    print("-" * len(hdr))
    print(f"{'mean':16s} {mean['SAD']:9.3f} {mean['MSE']:9.5f} "
          f"{mean['Grad']:9.3f} {mean['Conn']:9.3f}")
    out = {"metric": "matting_quality_mean", **mean,
           "weights": "real" if args.ckpt else "random"}
    if int8_mae:
        # gate: int8 must stay inside the bf16-vs-fp32 parity envelope
        # (alpha MAE <= 1e-2, docs/ROADMAP.md precision audit)
        out["int8_vs_bf16_alpha_mae"] = round(float(np.mean(int8_mae)), 5)
        print(f"int8 vs bf16 alpha MAE: {out['int8_vs_bf16_alpha_mae']:.5f} "
              f"(budget 0.01)")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
