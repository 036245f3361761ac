"""Throughput past the HBM ceiling: pipeline at b=12/16 with VAE chunking.

b>=12 @1024px OOMs HBM unchunked (bench.py).  vae_chunk=N runs the
pixel-space VAE stages in N-image lax.map groups; early measurement at
chunk sizes ~2 said "2x slower", but large chunks (4/8) keep each group
efficient while capping peak memory — this measures the actual tradeoff
against the b=8 unchunked baseline.

Run: nohup python -u benchmarks/ab_bigbatch.py > /tmp/ab_big.log 2>&1 &
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp_cache"))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from sdmatte_tpu.configs import SDMatteConfig  # noqa: E402
from sdmatte_tpu.core.dtypes import BF16  # noqa: E402
from sdmatte_tpu.models import sdmatte  # noqa: E402
from sdmatte_tpu.pipeline import MattingPipeline, PipelineOptions  # noqa: E402


def bench(pipe, batch, iters=3, warmup=1):
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 1, (batch, 1024, 1024, 3)).astype(np.float32))
    tri = jnp.asarray(rng.uniform(0, 1, (batch, 1024, 1024)).astype(np.float32))
    jax.block_until_ready((img, tri))
    opts = PipelineOptions(inference_size=1024, output_mode="alpha_only",
                           mask_refine=True)
    times = []
    for i in range(warmup + iters):
        t0 = time.perf_counter()
        alpha, _ = pipe(img, tri, options=opts)
        float(jnp.sum(alpha))
        if i >= warmup:
            times.append(time.perf_counter() - t0)
    return float(np.median(times))


def main():
    print("backend:", jax.default_backend(), flush=True)
    cfg = SDMatteConfig()
    # ONE device-resident bf16 tree shared by every pipeline below —
    # MattingPipeline's asarray(x, bf16) is then a no-op, so 5 cases don't
    # stack 5 x 2.6 GB param copies in HBM (first version of this harness
    # OOM'd its own baseline that way)
    params = jax.tree_util.tree_map(
        lambda x: jnp.asarray(x, BF16.param_dtype), sdmatte.init(cfg, seed=0))

    cases = [
        (8, None),     # baseline (current best_batch)
        (12, 4),
        (12, 6),
        (16, 4),
        (8, None),     # re-measure baseline to bracket drift
    ]
    for batch, chunk in cases:
        pipe = MattingPipeline(params, cfg, policy=BF16, attn_impl="auto",
                               vae_chunk=chunk)
        try:
            t = bench(pipe, batch)
        except Exception as e:
            print(f"b={batch:3d} chunk={chunk}: FAIL {str(e)[-110:]}",
                  flush=True)
            del pipe
            jax.clear_caches()   # drop compiled graphs + their temp pins
            continue
        print(f"b={batch:3d} chunk={chunk}: {t*1e3:8.1f} ms  "
              f"{batch/t:6.3f} mattes/s", flush=True)
        del pipe
        jax.clear_caches()


if __name__ == "__main__":
    main()
