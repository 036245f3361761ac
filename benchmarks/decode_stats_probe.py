"""Quantify the GroupNorm-stats ceiling in the decoder (VERDICT r2 item 6).

The decoder stays pure XLA (any Pallas custom call triggers ~256 MB NHWC
relayouts — ops/dispatch.py history), so the only remaining fusion idea is
folding the GN stats *reduction* into the producer's epilogue.  Before
building anything: measure the ceiling.  This times the real b=1 decode vs
a stats-free variant (every GroupNorm's (a, d) replaced by constants — the
apply/silu/conv work is unchanged, only the reduction passes disappear).
The delta IS the maximum any stats fusion could save.

NOTE: the first version of this probe jitted the nostats variant inside the
mock.patch block but first CALLED it after the block exited — jax.jit defers
tracing to the first call, so the "nostats" graph was identical to the base
and the recorded "5.1 ms ceiling" was base-vs-base noise.  Now the variant
is AOT-compiled (lower().compile()) inside the patch so the traced graph
really is stats-free; see RESULT below.

RESULT (TPU v5e, 2026-08-18, fixed probe, 3x-interleaved medians):
stats ceiling = 5.4 ms, 3.8% of b=1 decode (base ~143.5 ms vs nostats
~138.1 ms under probe overhead).  All decoder GN reductions combined are
worth at most 5.4 ms — producer-side stats fusion is closed negative.

Run: nohup python -u benchmarks/decode_stats_probe.py > /tmp/dec_stats.log 2>&1 &
"""

import os
import sys
import time
from unittest import mock

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp_cache"))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from sdmatte_tpu.configs import SDMatteConfig  # noqa: E402
from sdmatte_tpu.core.dtypes import BF16  # noqa: E402
from sdmatte_tpu.core import nn as F  # noqa: E402
from sdmatte_tpu.models import vae  # noqa: E402


def timeit(fn, *args, iters=6, warmup=2, label=""):
    times = []
    for i in range(warmup + iters):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        float(jnp.sum(out[..., :1, :1]))
        if i >= warmup:
            times.append(time.perf_counter() - t0)
    p50 = float(np.percentile(times, 50))
    print(f"{label:36s} {p50*1e3:8.2f} ms", flush=True)
    return p50


def main():
    print("backend:", jax.default_backend(), flush=True)
    cfg = SDMatteConfig()
    pol = BF16
    params = jax.tree_util.tree_map(
        lambda x: jnp.asarray(x, jnp.bfloat16), vae.init(cfg.vae, seed=0))
    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.standard_normal((1, 128, 128, 4)), jnp.bfloat16)

    dec = jax.jit(lambda p, z: vae.decode(p, z, cfg.vae, policy=pol,
                                          attn_impl="flash"))

    def const_stats(p, x, *, groups=32, eps=1e-5):
        b, _, _, c = x.shape
        return (jnp.ones((b, c), jnp.float32), jnp.zeros((b, c), jnp.float32))

    with mock.patch.object(F, "group_norm_stats", const_stats):
        # AOT-compile INSIDE the patch: jit defers tracing to first call,
        # so a plain jit() here would trace the unpatched function later.
        dec2 = jax.jit(lambda p, z: vae.decode(p, z, cfg.vae, policy=pol,
                                               attn_impl="flash")
                       ).lower(params, z).compile()
    base_hlo = dec.lower(params, z).compile().as_text()
    assert dec2.as_text() != base_hlo, \
        "nostats variant compiled to the same HLO as base — patch not applied"

    # Sequential base-then-variant timing confounds with warm-up drift
    # (first-measured graph reads ~10-16 ms slow; an A/B/A re-check measured
    # a "16 ms bf16-stats win" on an HLO-identical graph).  INTERLEAVE and
    # take medians.  (A bf16-input-stats variant is pointless here: decode
    # activations are already bf16, so the astype is a traced no-op.)
    timeit(dec, params, z, label="warm base")
    timeit(dec2, params, z, label="warm nostats")
    bs, ns = [], []
    for r in range(3):
        bs.append(timeit(dec, params, z, label=f"base #{r}"))
        ns.append(timeit(dec2, params, z, label=f"nostats #{r}"))
    t_base = float(np.median(bs))
    t_nostats = float(np.median(ns))
    print(f"\nstats ceiling: {1e3*(t_base - t_nostats):.1f} ms "
          f"({100*(t_base-t_nostats)/t_base:.1f}% of decode) — the maximum "
          f"a producer-side GN-stats fusion could save", flush=True)


if __name__ == "__main__":
    main()
