"""Conv formulation shootout on the VAE hot shapes (v5e).

XLA's native conv sustains only 25-55 TF/s on the shapes that dominate the
matte (benchmarks/conv_check.py round-2 run) — far under MXU speed-of-light
for what is a dense GEMM.  This sweeps alternative formulations:

  xla_f32   native conv, fp32 accumulation output then cast (production today)
  xla_bf16  native conv, bf16 output (halves output HBM traffic)
  shift9    conv as 9 shifted (B*H*W, C) @ (C, Cout) matmuls on the padded
            input, accumulated fp32 — hands XLA pure GEMMs it tiles well
  shift9_b  shift9 with bf16 accumulation tree (cheapest; numerics checked)

Run: nohup python -u benchmarks/conv_variants.py > /tmp/conv_variants.log 2>&1 &
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

SHAPES = [
    (2, 1024, 128, 128),
    (2, 512, 256, 256),
    (2, 512, 128, 256),
    (2, 256, 512, 512),
    (2, 256, 256, 512),
    (2, 128, 512, 512),
    (1, 1024, 128, 128),
    (1, 1024, 256, 256),
    (1, 1024, 256, 128),
    (1, 512, 256, 256),
    (1, 512, 512, 256),
    (1, 512, 512, 512),
    (1, 256, 512, 512),
    (1, 128, 512, 512),
]
REPS = 8


def xla_f32(x, w):
    return lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(jnp.bfloat16)


def xla_bf16(x, w):
    return lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.bfloat16)


def shift9(x, w, accum=jnp.float32):
    B, H, W, C = x.shape
    Cout = w.shape[3]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = None
    for dy in range(3):
        for dx in range(3):
            xs = lax.dynamic_slice(xp, (0, dy, dx, 0), (B, H, W, C))
            d = jnp.dot(xs.reshape(B * H * W, C), w[dy, dx],
                        preferred_element_type=accum)
            acc = d if acc is None else acc + d
    return acc.reshape(B, H, W, Cout).astype(jnp.bfloat16)


def shift9_b(x, w):
    return shift9(x, w, accum=jnp.bfloat16)


def chain(f, out_shape):
    def body(x, w):
        def step(i, acc):
            xi = x * (1.0 + 1e-6 * i.astype(x.dtype))
            return acc + f(xi, w).astype(jnp.float32)
        return lax.fori_loop(0, REPS, step, jnp.zeros(out_shape, jnp.float32))
    return jax.jit(body)


def main():
    rng = np.random.default_rng(0)
    print("backend:", jax.default_backend(), flush=True)
    table = {}
    for b, s, ci, co in SHAPES:
        x = jnp.asarray(rng.standard_normal((b, s, s, ci)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((3, 3, ci, co)) * 0.05, jnp.bfloat16)
        fl = 2 * b * s * s * ci * co * 9
        ref = np.asarray(xla_f32(x, w), np.float32)
        scale = max(1e-6, np.abs(ref).max())
        row = {}
        for name, f in [("xla_f32", xla_f32), ("xla_bf16", xla_bf16),
                        ("shift9", shift9), ("shift9_b", shift9_b)]:
            try:
                fj = chain(f, (b, s, s, co))
                o = fj(x, w); float(jnp.sum(o[..., :1, :1]))
                t0 = time.perf_counter()
                o = fj(x, w); float(jnp.sum(o[..., :1, :1]))
                t = (time.perf_counter() - t0) / REPS
                err = float(np.abs(np.asarray(f(x, w), np.float32) - ref).max() / scale)
            except Exception as e:
                print(f"  {name:9s} {b}x{s}^2 {ci}->{co}: FAILED {str(e)[:80]}",
                      flush=True)
                continue
            row[name] = t
            print(f"  {name:9s} {b}x{s}^2 {ci}->{co}: {t*1e3:7.2f} ms "
                  f"{fl/t/1e12:6.1f} TF/s  relerr {err:.4f}", flush=True)
        table[(b, s, ci, co)] = row
    print("\nbest-per-shape:")
    for k, row in table.items():
        best = min(row, key=row.get)
        print(f"  {k}: {best} ({row[best]*1e3:.2f} ms, "
              f"{row['xla_f32']/row[best]:.2f}x vs xla_f32)")


if __name__ == "__main__":
    main()
