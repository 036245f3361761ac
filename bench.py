"""Benchmark: 1024px mattes/sec/chip + p50 latency at 512/1024 (BASELINE.md).

Runs the full jit-fused pipeline (preprocess -> VAE encodes -> U-Net ->
decode -> refine -> composite) on the flagship full-size model, bf16, flash
attention.  Prints ONE JSON line.

vs_baseline: the reference publishes no numbers (BASELINE.md); the driver
target is p50 <= 150 ms per 1024px matte on one v5e chip, i.e. a baseline
throughput of 1/0.15 = 6.67 mattes/sec/chip.  vs_baseline = ours / 6.67
(>1.0 beats the target).
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from sdmatte_tpu.configs import SDMatteConfig
    from sdmatte_tpu.core.dtypes import BF16
    from sdmatte_tpu.models import sdmatte
    from sdmatte_tpu.pipeline import MattingPipeline, PipelineOptions

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

    def try_bench(*args, **kw):
        """One transient failure (tunnel flake, remote-compile 500) must not
        lose the whole round's bench record — measure what we can."""
        try:
            return bench(*args, **kw)
        except Exception as e:
            print(f"bench{args} failed: {e}", file=sys.stderr)
            return None

    def user_visible_p50(size=1024, iters=3, warmup=1):
        """Secondary metric: the full serving path — base64+PNG decode,
        host->device, pipeline, device->host, PNG+base64 encode — via the
        real MattingService (api/serve.py).  On this dev host the D2H leg
        rides the axon tunnel (~20 MB/s after a ~77 s first-fetch), so the
        number is tunnel-inflated; on a real v5e host the gap vs the
        device-compute p50 is PNG codec + PCIe only.  Published so the
        latency conversation includes host costs (VERDICT r3 item 5)."""
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

    p50_512 = try_bench(512, 1)
    p50_768 = try_bench(768, 1, iters=4, output_mode="matted_rgba")  # BASELINE cfg 2
    p50_1024 = bench(1024, 1)  # the headline — a failure here IS a failed bench
    # throughput: sweep batch sizes — large batches can exceed HBM and spill
    best_tp, best_batch, per_batch = 1.0 / p50_1024, 1, {}
    for batch in (4, 8):  # b>=9 exceeds 16G HBM at 1024px (ab_b10.py measured
        #                   b=9/10 OOM unchunked; chunked b=12/16 is 2.2/s)
        try:
            t = bench(1024, batch, iters=3)
        except Exception as e:
            print(f"batch {batch} failed: {e}", file=sys.stderr)
            break
        per_batch[batch] = round(batch / t, 3)
        if batch / t > best_tp:
            best_tp, best_batch = batch / t, batch
    throughput = best_tp

    try:
        uv_p50 = user_visible_p50()
    except Exception as e:
        print(f"user-visible bench failed: {e}", file=sys.stderr)
        uv_p50 = None

    # Secondary, clearly-labeled OUT-OF-PARITY metric: best opt-in speed
    # mode at the throughput config.  Never the default; quality deltas per
    # mode/checkpoint are measured by benchmarks/ab_speed_modes.py and
    # tabulated in docs/MIGRATING.md.  Shares the already-staged device
    # params (pipe.params is the post-staging tree, so no second HBM copy).
    def speed_mode_tp(mode, batch=8, iters=3):
        fast_pipe = MattingPipeline(pipe.params, cfg, policy=BF16,
                                    attn_impl="auto", speed_mode=mode)
        return batch / bench(1024, batch, iters=iters, warmup=1,
                             use_pipe=fast_pipe)
    try:
        fastest_tp = speed_mode_tp("fastest")
    except Exception as e:
        print(f"speed-mode bench failed: {e}", file=sys.stderr)
        fastest_tp = None

    baseline_throughput = 1.0 / 0.150  # driver target: 150 ms p50 @ 1024px
    result = {
        "metric": "1024px_mattes_per_sec_per_chip",
        "value": round(throughput, 3),
        "unit": "mattes/s",
        "vs_baseline": round(throughput / baseline_throughput, 3),
        "p50_latency_512px_ms": round(p50_512 * 1e3, 1) if p50_512 else None,
        "p50_latency_768px_rgba_ms": round(p50_768 * 1e3, 1) if p50_768 else None,
        "p50_latency_1024px_ms": round(p50_1024 * 1e3, 1),
        # full serving path (PNG+b64 decode, H2D, pipeline, D2H, PNG encode);
        # tunnel-inflated on this dev host — see user_visible_p50 docstring
        "user_visible_p50_1024px_ms": round(uv_p50 * 1e3, 1) if uv_p50 else None,
        # OUT-OF-PARITY opt-in (speed_mode="fastest"): rgb+aux encoded at
        # S/2 + latent upsample, decode at half res — measured quality
        # deltas in docs/MIGRATING.md; never the default
        "speed_mode_fastest_mattes_per_sec":
            round(fastest_tp, 3) if fastest_tp else None,
        "best_batch": best_batch,
        "throughput_per_batch": per_batch,
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
    }
    from sdmatte_tpu.core import nn as _nn
    if _nn.UPSAMPLE2X_MODE != "base":
        result["upsample2x_mode"] = _nn.UPSAMPLE2X_MODE
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
