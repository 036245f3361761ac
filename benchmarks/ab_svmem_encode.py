"""Same-session interleaved A/B: the raised-scoped-VMEM dispatch tier on
the b=2 1024px VAE encode (the graph its two overlay entries live in).

Three variants, interleaved twice (tunnel load drifts minutes apart):
  base     plain jax.jit               (default ~16 MB scoped VMEM)
  svopt    model_jit, overlay cleared  (isolates the 64 MB option's effect
                                        on XLA's own fusion decisions)
  overlay  model_jit, overlay active   (option + fgnres entries at
                                        512^2x256 / 256^2x512)

Micro-chains predicted overlay - svopt ~= -1.7 ms (fused_tune.py
2026-08-19: fgnres 4.83 vs conv 5.23 @512^2x256, 4.13 vs 4.30 @256^2x512,
~3 dispatched convs each); full-pipeline bench.py could not resolve it
(same-code 512px path drifted 27% between runs).

Run: nohup python -u benchmarks/ab_svmem_encode.py > /tmp/ab_sv.log 2>&1 &
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from sdmatte_tpu.configs import SDMatteConfig  # noqa: E402
from sdmatte_tpu.core.dtypes import BF16  # noqa: E402
from sdmatte_tpu.models import vae  # noqa: E402
from sdmatte_tpu.ops import dispatch  # noqa: E402


def timeit(fn, *args, iters=12, warmup=2):
    times = []
    for i in range(warmup + iters):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jnp.sum(out[..., :1, :1]))
        if i >= warmup:
            times.append(time.perf_counter() - t0)
    return float(np.median(times))


def main():
    print("backend:", jax.default_backend(), flush=True)
    cfg = SDMatteConfig()
    pol = BF16
    params = jax.tree_util.tree_map(
        lambda x: jnp.asarray(x, pol.param_dtype), vae.init(cfg.vae, seed=0))
    rng = np.random.default_rng(0)
    both = jnp.asarray(rng.uniform(-1, 1, (2, 1024, 1024, 3)), jnp.bfloat16)

    def enc(p, x):
        return vae.encode(p, x, cfg.vae, policy=pol, attn_impl="flash")

    saved = dict(dispatch.PALLAS_CONV_WINS_SVMEM)
    results = {}
    for rep in ("", "_2"):
        for mode in ("base", "svopt", "overlay"):
            dispatch.PALLAS_CONV_WINS_SVMEM.clear()
            if mode == "overlay":
                dispatch.PALLAS_CONV_WINS_SVMEM.update(saved)
            f = jax.jit(enc) if mode == "base" else dispatch.model_jit(enc)
            t = timeit(f, params, both)
            results[mode + rep] = t
            print(f"{mode + rep:10s} encode(b2@1024) {t*1e3:7.1f} ms",
                  flush=True)
    dispatch.PALLAS_CONV_WINS_SVMEM.update(saved)

    best = {m: min(results[m], results[m + "_2"])
            for m in ("base", "svopt", "overlay")}
    print(f"\nbase {best['base']*1e3:.1f}  svopt {best['svopt']*1e3:.1f}  "
          f"overlay {best['overlay']*1e3:.1f}  "
          f"(overlay vs base {best['base']/best['overlay']:.3f}x)",
          flush=True)


if __name__ == "__main__":
    main()
