"""In-graph A/B: VAE encode at large batch with (B,...) dispatch entries.

Chain harnesses OOM HBM at b=16x1024^2 (the fori_loop keeps 2-3 full-size
buffers alive), so the throughput-path conv table is validated directly on
the real encode graph: inject (B, spatial, ci, co) entries mirroring the
b=2 winners and time encode with dispatch on vs off, interleaved.

Usage: ab_enc_batch.py [batch]   (default 16 = pipeline batch 8: image+aux)
Run: nohup python -u benchmarks/ab_enc_batch.py > /tmp/ab_enc16.log 2>&1 &
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
from sdmatte_tpu.models import vae  # noqa: E402
from sdmatte_tpu.ops import dispatch  # noqa: E402

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 16


def timeit(fn, *args, iters=6, warmup=2):
    times = []
    for i in range(warmup + iters):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jnp.sum(out[0][..., :1, :1] if isinstance(out, tuple) else
                      out[..., :1, :1]))
        if i >= warmup:
            times.append(time.perf_counter() - t0)
    return float(np.median(times))


def main():
    print(f"backend: {jax.default_backend()}  batch={BATCH}", flush=True)
    cfg = SDMatteConfig()
    pol = BF16
    params = jax.tree_util.tree_map(
        lambda x: jnp.asarray(x, pol.param_dtype), vae.init(cfg.vae, seed=0))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (BATCH, 1024, 1024, 3)), jnp.bfloat16)

    # mirror the measured b=2 winners onto this batch (same per-row-block
    # work; batch only multiplies the grid's outer dim)
    inject = {
        (BATCH, 1024, 128, 128): (9.9, 8, 128, True, False, 0),
        (BATCH, 512, 256, 256): (9.9, 8, 128, False, False, 0),
        (BATCH, 256, 512, 512): (9.9, 8, 128, False, False, 0),
        (BATCH, 512, 128, 256): (9.9, 8, 128, False, False, 0),
        (BATCH, 512, 256, 128): (9.9, 8, 128, False, False, 0),
    }
    saved = dict(dispatch.PALLAS_CONV_WINS)
    results = {}
    for tag in ("pallas", "xla", "pallas2", "xla2"):
        dispatch.PALLAS_CONV_WINS.clear()
        dispatch.PALLAS_CONV_WINS.update(saved)
        if tag.startswith("pallas"):
            dispatch.PALLAS_CONV_WINS.update(inject)
        enc = jax.jit(lambda p, x: vae.encode(p, x, cfg.vae, policy=pol,
                                              attn_impl="flash"))
        try:
            t = timeit(enc, params, x)
        except Exception as e:
            print(f"{tag:8s} FAIL {str(e)[-140:]}", flush=True)
            results[tag] = float("inf")
            continue
        results[tag] = t
        print(f"{tag:8s} encode(b{BATCH}@1024) {t*1e3:7.1f} ms", flush=True)
    dispatch.PALLAS_CONV_WINS.clear()
    dispatch.PALLAS_CONV_WINS.update(saved)

    p = min(results["pallas"], results["pallas2"])
    xx = min(results["xla"], results["xla2"])
    print(f"\nencode b{BATCH}: pallas {p*1e3:.1f} vs xla {xx*1e3:.1f} "
          f"({xx/p:.2f}x)", flush=True)


if __name__ == "__main__":
    main()
