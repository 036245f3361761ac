"""Unchunked throughput probe between the known points: b=9/10 @1024px.

bench.py stops at b=8 because b>=12 OOMs 16 GB HBM unchunked and chunked
mode measured 2.2 mattes/s (ab_bigbatch.py).  b=9/10 unchunked sit in the
unmeasured gap — per-image activation cost ~1.4 GB puts b=10 right at the
HBM edge, so this is a cheap fit-or-OOM probe.

Run: nohup python -u benchmarks/ab_b10.py > /tmp/ab_b10.log 2>&1 &
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp_cache"))

import jax  # noqa: E402

from sdmatte_tpu.configs import SDMatteConfig  # noqa: E402
from sdmatte_tpu.core.dtypes import BF16  # noqa: E402
from sdmatte_tpu.models import sdmatte  # noqa: E402
from sdmatte_tpu.pipeline import MattingPipeline  # noqa: E402
from ab_bigbatch import bench  # noqa: E402


def main():
    print("backend:", jax.default_backend(), flush=True)
    cfg = SDMatteConfig()
    params = jax.tree_util.tree_map(
        lambda x: jax.numpy.asarray(x, BF16.param_dtype),
        sdmatte.init(cfg, seed=0))
    for batch in (8, 10, 9, 8):   # bracket the baseline around the probes
        pipe = MattingPipeline(params, cfg, policy=BF16, attn_impl="auto")
        try:
            t = bench(pipe, batch)
        except Exception as e:
            print(f"b={batch:3d}: FAIL {str(e)[-110:]}", flush=True)
            del pipe
            jax.clear_caches()
            continue
        print(f"b={batch:3d}: {t*1e3:8.1f} ms  {batch/t:6.3f} mattes/s",
              flush=True)
        del pipe
        jax.clear_caches()


if __name__ == "__main__":
    main()
