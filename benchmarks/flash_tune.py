"""Variant sweep for the d=64 flash kernel on the U-Net production shapes.

Compares v1 (fused-denominator) vs v2 (bias-in-dot + split softmax chains)
across block/halves configs, interleaved in one process.  VERDICT round-1
target: >= 70 TF/s on the (B*H, 16384, 64) self-attention shape (v1
measured ~40).

Run: nohup python -u benchmarks/flash_tune.py > /tmp/flash_tune.log 2>&1 &
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp_cache"))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.lax as lax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from sdmatte_tpu.ops.flash_attention import flash_attention  # noqa: E402

CASES = [
    # (b, h, lq, lk, d, bias?)  — U-Net hot shapes
    (1, 5, 16384, 16384, 64, True),      # self @1024px
    (2, 10, 4096, 16384, 64, True),      # cross stage-2
    (1, 3, 6400, 6400, 64, True),        # ragged 640px
]
CONFIGS = [
    # (variant, block_q, block_k, halves)
    ("v1", 0, 0, 2),          # current auto blocks (512/2048)
    ("v2", 512, 2048, 1),
    ("v2", 512, 2048, 2),
    ("v2", 512, 2048, 4),
    ("v2", 1024, 1024, 4),
    ("v2", 512, 1024, 2),
    ("v1", 0, 0, 2),          # re-measure to bracket drift
]
if len(sys.argv) > 1 and sys.argv[1] == "r4":
    # VERDICT r3 item 3: decide v2-per-site dispatch on the PRODUCTION self
    # shapes (bias present, lq == lk) at both b=1 latency and b=8 throughput
    CASES = [
        (1, 5, 16384, 16384, 64, True),   # self @1024px, b=1
        (8, 5, 16384, 16384, 64, True),   # self @1024px, b=8 (headline)
        (8, 10, 4096, 4096, 64, True),    # self @64^2 tokens, b=8
    ]
    CONFIGS = [
        ("v1", 0, 0, 2),
        ("v2", 512, 2048, 1),             # round-3 winner on self b=1 (+4%)
        ("v2", 512, 2048, 2),
        ("v1", 0, 0, 2),
    ]
REPS = 8


def measure_overhead():
    x = jnp.ones((8, 128), jnp.float32)
    f = jax.jit(lambda x: x * 2.0)
    o = f(x); float(jnp.sum(o))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter(); o = f(x); float(jnp.sum(o))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    rng = np.random.default_rng(0)
    print("backend:", jax.default_backend(), flush=True)
    oh = measure_overhead()
    print(f"per-call overhead: {oh*1e3:.1f} ms", flush=True)
    for b, h, lq, lk, d, use_bias in CASES:
        q = jnp.asarray(rng.standard_normal((b, h, lq, d)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((b, h, lk, d)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((b, h, lk, d)), jnp.bfloat16)
        bias = None
        if use_bias:
            bias = jnp.asarray((rng.uniform(0, 1, (b, lk)) < 0.5) * -10000.0,
                               jnp.float32)
        scale = 1.0 / np.sqrt(d)
        flops = 4 * b * h * lq * lk * d
        print(f"b{b} h{h} {lq}x{lk} d{d}:", flush=True)
        ref = None
        for variant, bq, bk, halves in CONFIGS:
            def one(y, kk, vv, variant=variant, bq=bq, bk=bk, halves=halves):
                return flash_attention(y, kk, vv, scale=scale, bias=bias,
                                       block_q=bq, block_k=bk,
                                       variant=variant, halves=halves)
            if lq == lk:
                fj = jax.jit(lambda q, k, v, one=one: lax.fori_loop(
                    0, REPS, lambda i, y: one(y, k, v), q))
            else:
                fj = jax.jit(lambda q, k, v, one=one: lax.fori_loop(
                    0, REPS, lambda i, y: one(
                        q + 1e-6 * i.astype(q.dtype) * y, k, v), q))
            try:
                o = fj(q, k, v); float(jnp.sum(o[..., :1, :1]))
                ts = []
                for _ in range(3):
                    t0 = time.perf_counter()
                    o = fj(q, k, v); float(jnp.sum(o[..., :1, :1]))
                    ts.append(time.perf_counter() - t0)
                t = (float(np.median(ts)) - oh) / REPS
            except Exception as e:
                print(f"  {variant} bq={bq} bk={bk} hv={halves}: FAIL "
                      f"{str(e)[-90:]}", flush=True)
                continue
            # parity spot-check between variants (first config = reference)
            single = one(q, k, v)
            if ref is None:
                ref = single
                perr = 0.0
            else:
                perr = float(jnp.abs(single.astype(jnp.float32)
                                     - ref.astype(jnp.float32)).max())
            print(f"  {variant} bq={bq or 'auto'} bk={bk or 'auto'} "
                  f"hv={halves}: {t*1e3:7.2f} ms {flops/t/1e12:6.1f} TF/s "
                  f"xverr {perr:.4f}", flush=True)


if __name__ == "__main__":
    main()
