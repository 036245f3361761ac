"""Conv-as-(3,1)-over-concat formulation shootout (v5e).

The 3x3 conv decomposes exactly as: concat the three dx-shifted inputs
along channels (B, H+?, W, 3C), then a (3,1) conv with kernel reshaped
(3, 1, 3C, Cout).  The concat is one HBM-level relayout XLA does once;
the (3,1) conv is then a row-banded GEMM with K=3C, which XLA may tile far
better than its native 3x3 schedule (25-57 TF/s measured).  Also tries the
full im2col: concat 9 shifts -> 1x1 conv (pure GEMM, K=9C).

Run: nohup python -u benchmarks/conv_cat.py > /tmp/conv_cat.log 2>&1 &
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
    (2, 256, 512, 512),
    (2, 128, 512, 512),
    (1, 1024, 128, 128),
    (1, 1024, 256, 256),
    (1, 512, 512, 512),
    (1, 512, 512, 256),
    (1, 256, 512, 512),
]
REPS = 8


def conv_native(x, w):
    return lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(jnp.bfloat16)


def conv_cat31(x, w):
    """concat dx shifts -> (3,1) conv with K=3C."""
    B, H, W, C = x.shape
    xp = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (0, 0)))
    xcat = jnp.concatenate([xp[:, :, d:d + W] for d in range(3)], axis=-1)
    w31 = w.transpose(0, 1, 2, 3).reshape(3, 1, 3 * C, w.shape[3])
    return lax.conv_general_dilated(
        xcat, w31, (1, 1), [(1, 1), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(jnp.bfloat16)


def conv_cat9(x, w):
    """full im2col concat -> 1x1 conv (pure GEMM, K=9C)."""
    B, H, W, C = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    parts = [xp[:, dy:dy + H, dx:dx + W] for dy in range(3) for dx in range(3)]
    xcat = jnp.concatenate(parts, axis=-1)
    wk = w.reshape(9 * C, w.shape[3])
    y = jnp.einsum("bhwk,kn->bhwn", xcat, wk,
                   preferred_element_type=jnp.float32)
    return y.astype(jnp.bfloat16)


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
    for b, s, ci, co in SHAPES:
        x = jnp.asarray(rng.standard_normal((b, s, s, ci)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((3, 3, ci, co)) * 0.05, jnp.bfloat16)
        fl = 2 * b * s * s * ci * co * 9
        ref = np.asarray(conv_native(x, w), np.float32)
        scale = max(1e-6, np.abs(ref).max())
        for name, f in [("native", conv_native), ("cat31", conv_cat31),
                        ("cat9", conv_cat9)]:
            try:
                fj = chain(f, (b, s, s, co))
                o = fj(x, w); float(jnp.sum(o[..., :1, :1]))
                t0 = time.perf_counter()
                o = fj(x, w); float(jnp.sum(o[..., :1, :1]))
                t = (time.perf_counter() - t0) / REPS
                err = float(np.abs(np.asarray(f(x, w), np.float32) - ref).max() / scale)
                print(f"  {name:7s} {b}x{s}^2 {ci}->{co}: {t*1e3:7.2f} ms "
                      f"{fl/t/1e12:6.1f} TF/s  relerr {err:.4f}", flush=True)
            except Exception as e:
                print(f"  {name:7s} {b}x{s}^2 {ci}->{co}: FAILED {str(e)[:90]}",
                      flush=True)


if __name__ == "__main__":
    main()
