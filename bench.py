"""Benchmark: 1024px mattes/sec/chip + p50 latency at 512/1024 (BASELINE.md).

Runs the full jit-fused pipeline (preprocess -> VAE encodes -> U-Net ->
decode -> refine -> composite) on the flagship full-size model, bf16, flash
attention.  Prints ONE JSON line.

vs_baseline: the reference publishes no numbers (BASELINE.md); the driver
target is p50 <= 150 ms per 1024px matte on one v5e chip, i.e. a baseline
throughput of 1/0.15 = 6.67 mattes/sec/chip.  vs_baseline = ours / 6.67
(>1.0 beats the target).

Timeout-proofing (VERDICT r4 item 1 — round 4's record was lost to rc=124):
  * The persistent XLA executable cache is enabled by `import sdmatte_tpu`
    (jax.config route — jax 0.9 silently ignores the
    JAX_COMPILATION_CACHE_DIR env var, which is why four rounds of runs
    recompiled every graph over the dev tunnel at ~4-5 min each).  The
    env-var setdefault below only picks the directory; the package init
    honors it.  A pre-warmed same-host cache turns this run ~30-60 min ->
    ~9 min.
  * Lanes run headline-first: 1024px b=1, then the b=8 throughput config,
    then everything else — an internal wall-clock budget
    (SDMATTE_BENCH_BUDGET_S, default 1500 s) skips remaining non-headline
    lanes when it nears, degrading their fields to null instead of losing
    the record.
  * The serving-path probe and the out-of-parity speed-mode lane are
    opt-in (SDMATTE_BENCH_EXTRAS=1): both are secondary, and together they
    added a full extra pipeline compile + a ~77 s first-D2H tunnel penalty
    to round 4's run (VERDICT r4 items 1/5).  The driver-path bench now
    compiles <=4 heavy graphs.

Roofline context (VERDICT r4 item 2, accounting in ARCHITECTURE.md
"Performance accounting"): one 1024px matte ~ 28 bf16 TFLOP; v5e peak
~197 TF/s, so the 6.67/s target requires ~95% sustained MFU — above the
measured per-stage attainable ceilings (e.g. the U-Net's d=64 attention
score contraction caps at ~98 TF/s).  The JSON carries
model_tflop_per_matte / achieved_tflops / mfu / mfu_required_for_target so
the record itself shows how close to the hardware the pipeline runs.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp_cache"))

import numpy as np

# Roofline constants — measured accounting, ARCHITECTURE.md "Performance
# accounting (v5e, 1024px)": VAE encode x2 ~9 + U-Net ~7 + decode ~12 TFLOP.
MODEL_TFLOP_PER_MATTE = 28.0
CHIP_PEAK_TFLOPS = 197.0           # v5e bf16 peak
BASELINE_THROUGHPUT = 1.0 / 0.150  # driver target: 150 ms p50 @ 1024px

_now = time.perf_counter  # monkeypatchable clock (tests/test_bench.py)


def main():
    import jax
    import jax.numpy as jnp
    from sdmatte_tpu.configs import SDMatteConfig
    from sdmatte_tpu.core.dtypes import BF16
    from sdmatte_tpu.models import sdmatte
    from sdmatte_tpu.pipeline import MattingPipeline, PipelineOptions

    t_start = _now()
    budget_s = float(os.environ.get("SDMATTE_BENCH_BUDGET_S", "1500"))
    # Margin so a lane doesn't START with seconds left and then overshoot the
    # external driver timeout mid-compile (SDMATTE_BENCH_MARGIN_S to tune).
    margin_s = float(os.environ.get("SDMATTE_BENCH_MARGIN_S", "45"))
    # strict flag parse: "0"/"false" means OFF (mirrors sdmatte_tpu.utils.env)
    extras = os.environ.get("SDMATTE_BENCH_EXTRAS", "").strip().lower() \
        in ("1", "true", "yes", "on")

    def within_budget(lane):
        """True if the lane may still start.  Skipped lanes degrade to null
        — only the 1024px headline is allowed to consume the whole budget."""
        left = budget_s - (_now() - t_start)
        if left <= margin_s:
            print(f"budget exhausted ({budget_s:.0f}s): skipping {lane}",
                  file=sys.stderr)
            return False
        return True

    cfg = SDMatteConfig()
    params = sdmatte.init(cfg, seed=0)
    pipe = MattingPipeline(params, cfg, policy=BF16, attn_impl="auto")
    del params

    rng = np.random.default_rng(0)

    def bench(size, batch, iters=8, warmup=2, output_mode="alpha_only",
              use_pipe=None):
        # inputs pre-staged on device: we measure chip compute, not the dev
        # tunnel's host->device bandwidth (irrelevant on a real v5e host)
        img = jnp.asarray(rng.uniform(0, 1, (batch, size, size, 3)).astype(np.float32))
        tri = jnp.asarray(rng.uniform(0, 1, (batch, size, size)).astype(np.float32))
        jax.block_until_ready((img, tri))
        opts = PipelineOptions(inference_size=size, output_mode=output_mode,
                               mask_refine=True)
        times = []
        p = use_pipe or pipe
        for i in range(warmup + iters):
            t0 = time.perf_counter()
            alpha, matted = p(img, tri, options=opts)
            # block_until_ready alone under-syncs on remote-tunnel backends;
            # a scalar device->host fetch forces the whole graph to finish.
            float(jnp.sum(alpha))
            dt = time.perf_counter() - t0
            if i >= warmup:
                times.append(dt)
        return float(np.percentile(times, 50))

    def try_bench(lane, *args, **kw):
        """A transient failure (tunnel flake, remote-compile 500) or an
        exhausted budget at a non-headline lane must not lose the round's
        bench record — measure what we can, null the rest."""
        if not within_budget(lane):
            return None
        try:
            return bench(*args, **kw)
        except Exception as e:
            print(f"bench[{lane}]{args} failed: {e}", file=sys.stderr)
            return None

    # --- headline lanes, most valuable first (VERDICT r4 item 1a) ---------
    p50_1024 = bench(1024, 1)  # the headline — a failure here IS a failed bench
    print(f"[{_now() - t_start:7.1f}s] 1024px b=1: {p50_1024 * 1e3:.1f} ms",
          file=sys.stderr)

    # throughput: best batch config next (b=8 is the known winner; b>=9
    # exceeds 16G HBM at 1024px — ab_b10.py measured b=9/10 OOM unchunked)
    best_tp, best_batch, per_batch = 1.0 / p50_1024, 1, {}
    for batch in (8, 4):
        t = try_bench(f"1024px b={batch}", 1024, batch, iters=3)
        if t is None:
            continue
        per_batch[batch] = round(batch / t, 3)
        print(f"[{_now() - t_start:7.1f}s] 1024px b={batch}: "
              f"{per_batch[batch]} mattes/s", file=sys.stderr)
        if batch / t > best_tp:
            best_tp, best_batch = batch / t, batch
    throughput = best_tp

    # --- secondary parity lanes -------------------------------------------
    p50_512 = try_bench("512px", 512, 1)
    p50_768 = try_bench("768px rgba", 768, 1, iters=4,
                        output_mode="matted_rgba")  # BASELINE cfg 2

    # --- opt-in extra lanes (off in the driver run; VERDICT r4 item 5) ----
    uv_p50 = None
    if extras and within_budget("user_visible"):
        # full serving path — base64+PNG decode, H2D, pipeline, D2H, PNG+
        # base64 encode — via the real MattingService.  On this dev host the
        # D2H leg rides the axon tunnel (~20 MB/s after a ~77 s first fetch),
        # so the number is tunnel-inflated; on a real v5e host the gap vs
        # the device-compute p50 is PNG codec + PCIe only.
        try:
            uv_p50 = _user_visible_p50(pipe, rng)
        except Exception as e:
            print(f"user-visible bench failed: {e}", file=sys.stderr)

    # OUT-OF-PARITY opt-in speed mode at the throughput config.  Never the
    # default; per-mode quality deltas measured by benchmarks/ab_speed_modes.py
    # (full table in docs/MIGRATING.md — random-weight upper bounds; re-measure
    # with --ckpt on real weights).  Shares the already-staged device params.
    fastest_tp = None
    if extras and within_budget("speed_mode"):
        try:
            fast_pipe = MattingPipeline(pipe.params, cfg, policy=BF16,
                                        attn_impl="auto",
                                        speed_mode="fastest")
            t = bench(1024, 8, iters=3, warmup=1, use_pipe=fast_pipe)
            fastest_tp = 8 / t
        except Exception as e:
            print(f"speed-mode bench failed: {e}", file=sys.stderr)

    achieved_tflops = throughput * MODEL_TFLOP_PER_MATTE
    result = {
        "metric": "1024px_mattes_per_sec_per_chip",
        "value": round(throughput, 3),
        "unit": "mattes/s",
        "vs_baseline": round(throughput / BASELINE_THROUGHPUT, 3),
        "p50_latency_512px_ms": round(p50_512 * 1e3, 1) if p50_512 else None,
        "p50_latency_768px_rgba_ms": round(p50_768 * 1e3, 1) if p50_768 else None,
        "p50_latency_1024px_ms": round(p50_1024 * 1e3, 1),
        "best_batch": best_batch,
        "throughput_per_batch": per_batch,
        # roofline context (ARCHITECTURE.md "Performance accounting"):
        # 28 bf16 TFLOP/matte against the ~197 TF/s v5e peak — the 6.67/s
        # target equals ~95% sustained MFU, above the measured per-stage
        # attainable ceilings (U-Net d=64 attention caps ~98 TF/s).
        "model_tflop_per_matte": MODEL_TFLOP_PER_MATTE,
        "achieved_tflops": round(achieved_tflops, 1),
        "mfu": round(achieved_tflops / CHIP_PEAK_TFLOPS, 3),
        "mfu_required_for_target": round(
            BASELINE_THROUGHPUT * MODEL_TFLOP_PER_MATTE / CHIP_PEAK_TFLOPS, 3),
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
    }
    if uv_p50 is not None:
        result["user_visible_p50_1024px_ms"] = round(uv_p50 * 1e3, 1)
    if fastest_tp is not None:
        result["speed_mode_fastest_mattes_per_sec"] = round(fastest_tp, 3)
    from sdmatte_tpu.core import nn as _nn
    if _nn.UPSAMPLE2X_MODE != "base":
        result["upsample2x_mode"] = _nn.UPSAMPLE2X_MODE
    print(json.dumps(result))


def _user_visible_p50(pipe, rng, size=1024, iters=3, warmup=1):
    import base64
    from io import BytesIO
    from PIL import Image
    from sdmatte_tpu.api.serve import MattingService
    svc = MattingService(pipe, window_ms=0.0)
    try:
        def png_b64(arr):
            buf = BytesIO()
            Image.fromarray(arr).save(buf, format="PNG")
            return base64.b64encode(buf.getvalue()).decode()
        req = {
            "image": png_b64(rng.integers(0, 255, (size, size, 3),
                                          dtype=np.uint8)),
            "trimap": png_b64(rng.integers(0, 255, (size, size),
                                           dtype=np.uint8)),
            "inference_size": size,
        }
        times = []
        for i in range(warmup + iters):
            t0 = time.perf_counter()
            svc.matte(req)
            if i >= warmup:
                times.append(time.perf_counter() - t0)
        return float(np.percentile(times, 50))
    finally:
        svc.batcher.shutdown()


if __name__ == "__main__":
    sys.exit(main())
