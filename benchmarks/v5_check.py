"""On-chip validation + timing of the v5 borderless-DMA conv kernel.

The v4 lesson (ops/conv3x3.py header): interpret-mode parity says nothing
about whether the remote Mosaic compiler ACCEPTS a DMA pattern.  v5's news
is (a) three pl.when-selected DMA cases with row-offset destinations on the
scratch's major axis, (b) no host-side pad.  This checks, per shape:

  1. parity vs XLA conv (exact same math, fp32 accumulate)
  2. per-conv time vs the padded v3 path (SDMATTE_CONV_V3=1 equivalent is
     not needed — both kernels are called directly) and vs XLA

Run: nohup python -u benchmarks/v5_check.py > /tmp/v5_check.log 2>&1 &
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
from jax import lax  # noqa: E402

from sdmatte_tpu.ops import conv3x3 as mod  # noqa: E402

SHAPES = [(16, 512, 256, 8, 128), (16, 1024, 128, 8, 128),
          (16, 256, 512, 8, 128), (16, 128, 512, 8, 128)]
if len(sys.argv) > 1:
    SHAPES = [tuple(int(v) for v in a.split(",")) for a in sys.argv[1:]]
REPS = 12


def overhead():
    x = jnp.ones((8, 128), jnp.float32)
    f = jax.jit(lambda x: x * 2.0)
    float(jnp.sum(f(x)))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter(); float(jnp.sum(f(x)))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def timed(f, oh):
    o = f(); float(jnp.sum(o[..., :1, :1]))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter(); o = f(); float(jnp.sum(o[..., :1, :1]))
        ts.append(time.perf_counter() - t0)
    return (float(np.median(ts)) - oh) / REPS


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    fn_unjit = mod.conv3x3_same.__wrapped__
    for b, s, c, bh, coN in SHAPES:
        oh = overhead()
        # generate ON DEVICE: jnp.asarray of a host fp32 array stages the
        # full fp32 copy in HBM before converting (8.6 GB at b=16x1024^2,
        # OOMs next to the bf16 target + weights)
        kx, kw = jax.random.split(jax.random.key(b * 1000 + s))
        x = (jax.random.normal(kx, (b, s, s, c), jnp.bfloat16) * 0.1)
        x = jax.block_until_ready(x)
        w = jax.random.normal(kw, (3, 3, c, c), jnp.bfloat16) * 0.02
        bias = jnp.asarray(rng.standard_normal(c), jnp.float32)
        fl = 2 * b * s * s * c * c * 9

        # parity: v5 vs XLA — small shapes only (two fp32 copies of a
        # b=16 tensor OOM 16 GB; the kernel math is batch-invariant)
        if b <= 2:
            try:
                v5 = jax.jit(lambda x: fn_unjit(x, w, bias, block_rows=bh,
                                                cout_block=coN))
                got = v5(x)
            except Exception as e:
                print(f"{b}x{s}^2 {c}ch: v5 COMPILE FAIL {str(e)[-200:]}",
                      flush=True)
                continue
            ref = lax.conv_general_dilated(
                x, w, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32).astype(
                    jnp.float32) + bias
            err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - ref)))
            scale = float(jnp.max(jnp.abs(ref)))
            print(f"{b}x{s}^2 {c}ch: v5 parity rel-err {err/scale:.2e}",
                  flush=True)
            del got, ref

        # timing: self-feeding chains v5 vs v3 vs XLA
        def chain(conv):
            return jax.jit(lambda x: lax.fori_loop(
                0, REPS, lambda i, y: conv(y).astype(jnp.bfloat16), x))

        def run(tag, conv, env=None):
            if env:
                os.environ["SDMATTE_CONV_V3"] = "1"
            fj = chain(conv)   # ONE jit object: trace/compile once, reuse
            try:
                t = timed(lambda: fj(x), oh)
                print(f"    {tag:3s} {t*1e3:6.2f} ms {fl/t/1e12:5.1f} TF/s",
                      flush=True)
            except Exception as e:
                print(f"    {tag:3s} FAIL {str(e)[-140:]}", flush=True)
            finally:
                os.environ.pop("SDMATTE_CONV_V3", None)

        run("v5", lambda y: fn_unjit(y, w, bias, block_rows=bh,
                                     cout_block=coN))
        run("v3", lambda y: fn_unjit(y, w, bias, block_rows=bh,
                                     cout_block=coN), env=True)
        run("xla", lambda y: lax.conv_general_dilated(
            y, w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32) + bias)


if __name__ == "__main__":
    main()
