"""On-TPU flash-attention validation at production shapes.

CI's interpret-mode tests only cover tiny shapes (tests/test_flash_attention
.py); this script Mosaic-compiles the kernel on a real chip and checks parity
against the XLA path at every shape the model family actually hits:

  * U-Net self-attn @1024px: 16,384 tokens, 5 heads, d=64
  * U-Net cross-attn: 4,096 q x 16,384 kv aux tokens, per-key bias
  * VAE mid-block: 16,384 tokens, single head, d=512
  * ragged 640px stages: 6,400 tokens

Run: python benchmarks/flash_check.py
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

from sdmatte_tpu.ops.attention import attention_xla  # noqa: E402
from sdmatte_tpu.ops.flash_attention import flash_attention  # noqa: E402

CASES = [
    # (b, h, lq, lk, d, bias?)
    (2, 2, 256, 512, 64, True),
    (1, 5, 16384, 16384, 64, True),      # unet self @1024px
    (1, 1, 16384, 16384, 512, False),    # vae mid-block
    (2, 10, 4096, 16384, 64, True),      # unet cross, batch 2
    (1, 3, 6400, 6400, 64, True),        # ragged 640px
]


def measure_overhead():
    x = jnp.ones((8, 128), jnp.float32)
    f = jax.jit(lambda x: x * 2.0)
    o = f(x); float(jnp.sum(o))
    ts = []
    for _ in range(5):
        t0 = time.time(); o = f(x); float(jnp.sum(o))
        ts.append(time.time() - t0)
    return float(np.median(ts))


def main():
    rng = np.random.default_rng(0)
    print("backend:", jax.default_backend())
    oh = measure_overhead()
    print(f"per-call overhead: {oh*1e3:.1f} ms")
    fails = 0
    for b, h, lq, lk, d, use_bias in CASES:
        q = jnp.asarray(rng.standard_normal((b, h, lq, d)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((b, h, lk, d)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((b, h, lk, d)), jnp.bfloat16)
        bias = None
        if use_bias:
            bias = jnp.asarray((rng.uniform(0, 1, (b, lk)) < 0.5) * -10000.0,
                               jnp.float32)
        scale = 1.0 / np.sqrt(d)
        t0 = time.time()
        out = flash_attention(q, k, v, scale=scale, bias=bias)
        out.block_until_ready()
        t_compile = time.time() - t0
        # self-feeding in-graph chain (out -> next q) + overhead subtraction:
        # a bare dispatch+fetch costs ~32 ms on the dev tunnel and would
        # dominate per-call timing (see benchmarks/conv_clean.py)
        REPS = 8 if lq * lk >= 16384 * 16384 else 32
        if lq == lk:
            import jax.lax as lax
            fj = jax.jit(lambda q, k, v: lax.fori_loop(
                0, REPS, lambda i, y: flash_attention(
                    y, k, v, scale=scale, bias=bias), q))
        else:
            import jax.lax as lax
            fj = jax.jit(lambda q, k, v: lax.fori_loop(
                0, REPS, lambda i, y: flash_attention(
                    q + 1e-6 * i.astype(q.dtype) * y, k, v, scale=scale,
                    bias=bias), q))
        o = fj(q, k, v); float(jnp.sum(o[..., :1, :1]))
        ts = []
        for _ in range(3):
            t0 = time.time()
            o = fj(q, k, v); float(jnp.sum(o[..., :1, :1]))
            ts.append(time.time() - t0)
        t_run = (float(np.median(ts)) - oh) / REPS
        # parity on a query slice (full XLA ref would OOM at 16k x 16k x heads)
        ref = attention_xla(q[:, :, :256], k, v, scale=scale, bias=bias)
        err = float(jnp.abs(out[:, :, :256].astype(jnp.float32)
                            - ref.astype(jnp.float32)).max())
        ok = err < 0.05  # bf16 inputs
        fails += (not ok)
        flops = 4 * b * h * lq * lk * d
        print(f"b{b} h{h} {lq}x{lk} d{d} bias={use_bias}: "
              f"compile {t_compile:.1f}s run {t_run*1e3:.2f}ms "
              f"({flops/t_run/1e12:.1f} TFLOP/s) maxerr {err:.4f} "
              f"{'OK' if ok else 'FAIL'}")
    if fails:
        raise SystemExit(f"{fails} case(s) failed parity")
    print("all cases OK")


if __name__ == "__main__":
    main()
