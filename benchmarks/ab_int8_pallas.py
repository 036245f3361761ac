"""A/B: int8 through the Pallas im2col kernel vs bf16 Pallas vs XLA.

VERDICT round-2 item 4: XLA's int8 conv lowering measured 0.34x (the
toolchain inserts layout/convert passes, ops/quant.py header), but the MXU's
2x int8 MAC rate was never tried through our own kernel.  This harness runs
self-feeding resnet-pattern chains (conv_clean.py methodology: overhead
subtracted) on the hottest encode shapes:

  bf16   silu(gn(y)) -> pallas bf16 conv          (current dispatch winner)
  int8   silu(gn(y)) -> dyn-quant (XLA epilogue) -> pallas int8 conv
  xla    silu(gn(y)) -> XLA bf16 conv             (baseline)

and first checks on-chip numeric agreement of the int8 kernel against the
XLA int8 conv (identical integer math -> must match to fp32 dequant
rounding).  Keep-if >1.2x per the VERDICT bar; else record as a dead end.

Run: nohup python -u benchmarks/ab_int8_pallas.py > /tmp/ab_int8_pallas.log 2>&1 &
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

from sdmatte_tpu.ops.conv3x3 import conv3x3_same, conv3x3_same_int8  # noqa: E402
from sdmatte_tpu.ops.quant import quantize_weights_int8  # noqa: E402

SHAPES = [
    (2, 1024, 128),    # encoder stage-0 (b=1 matte)
    (2, 512, 256),     # encoder stage-1
    (16, 1024, 128),   # encoder stage-0 (b=8 throughput config)
]
if len(sys.argv) > 1:
    SHAPES = [tuple(int(v) for v in arg.split(",")) for arg in sys.argv[1:]]
REPS = 24


def measure_overhead():
    x = jnp.ones((8, 128), jnp.float32)
    f = jax.jit(lambda x: x * 2.0)
    o = f(x); float(jnp.sum(o))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter(); o = f(x); float(jnp.sum(o))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def timed(f, overhead=0.0):
    o = f(); float(jnp.sum(o[..., :1, :1]))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter(); o = f(); float(jnp.sum(o[..., :1, :1]))
        ts.append(time.perf_counter() - t0)
    return (float(np.median(ts)) - overhead) / REPS


def gn_like(y, a, d):
    yf = y.astype(jnp.float32) * a[:, None, None] + d[:, None, None]
    return (yf * jax.nn.sigmoid(yf)).astype(y.dtype)


def quant_act(x):
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf))
    s = jnp.where(amax == 0, 1.0, amax / 127.0)
    xq = jnp.clip(jnp.round(xf / s), -127, 127).astype(jnp.int8)
    return xq, s


def parity_check():
    """Pallas int8 kernel vs XLA int8 conv: identical integer math."""
    rng = np.random.default_rng(0)
    b, s, c = 1, 128, 128
    x = jnp.asarray(rng.standard_normal((b, s, s, c)) * 0.5, jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((3, 3, c, c)) * 0.05, jnp.bfloat16)
    wq, ws = quantize_weights_int8(w)
    xq, sx = quant_act(x)
    ours = conv3x3_same_int8(xq, wq, sx * ws, out_dtype=jnp.float32)
    ref = lax.conv_general_dilated(
        xq, wq, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32).astype(jnp.float32) * (sx * ws)
    err = float(jnp.max(jnp.abs(ours - np.asarray(ref))))
    rel = err / float(jnp.max(jnp.abs(ref)) + 1e-9)
    print(f"parity (pallas-int8 vs xla-int8): max abs {err:.3e} rel {rel:.3e}",
          flush=True)
    assert rel < 1e-5, "int8 kernel disagrees with XLA int8 conv"


def main():
    print("backend:", jax.default_backend(), flush=True)
    parity_check()
    rng = np.random.default_rng(0)
    for b, s, c in SHAPES:
        oh = measure_overhead()
        x = jnp.asarray(rng.standard_normal((b, s, s, c)) * 0.1, jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((3, 3, c, c)) * 0.02, jnp.bfloat16)
        a = jnp.asarray(rng.uniform(0.8, 1.2, (b, c)), jnp.float32)
        d = jnp.asarray(rng.uniform(-0.1, 0.1, (b, c)), jnp.float32)
        wq, ws = quantize_weights_int8(w)
        fl = 2 * b * s * s * c * c * 9

        def xla_step(y):
            h = lax.conv_general_dilated(
                gn_like(y, a, d), w, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32).astype(jnp.bfloat16)
            return (h + y).astype(jnp.bfloat16) * 0.7

        def bf16_step(y, bh=8, coN=128):
            h = conv3x3_same(gn_like(y, a, d), w, block_rows=bh,
                             cout_block=coN)
            return (h + y).astype(jnp.bfloat16) * 0.7

        def int8_step(y, bh=8, coN=128):
            z = gn_like(y, a, d)
            zq, sx = quant_act(z)
            h = conv3x3_same_int8(zq, wq, sx * ws, block_rows=bh,
                                  cout_block=coN)
            return (h + y).astype(jnp.bfloat16) * 0.7

        results = {}
        for name, step in (("xla", xla_step), ("bf16", bf16_step),
                           ("int8", int8_step)):
            fj = jax.jit(lambda x, step=step: lax.fori_loop(
                0, REPS, lambda i, y: step(y), x))
            try:
                t = timed(lambda: fj(x), overhead=oh)
            except Exception as e:
                print(f"  {name}: FAIL {str(e)[-160:]}", flush=True)
                continue
            results[name] = t
            print(f"  {b}x{s}^2 {c}ch {name:5s}: {t*1e3:6.2f} ms "
                  f"{fl/t/1e12:6.1f} TF/s", flush=True)
        if "int8" in results and "bf16" in results:
            print(f"  => int8 speedup vs bf16-pallas: "
                  f"{results['bf16']/results['int8']:.2f}x, vs xla: "
                  f"{results['xla']/results['int8']:.2f}x", flush=True)


if __name__ == "__main__":
    main()
