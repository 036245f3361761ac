"""A/B: XLA native conv vs matmul formulations on the slow U-Net resnet shapes.

unet_profile.py (round 3) attributed the U-Net's non-attention time and
found the up-path concat resnets run far below the chip's conv rates:
up_blocks.1 (32^2, 2560->1280) sustains ~43 TF/s x3 blocks, up_blocks.2
(64^2, 1920/1280->640) ~68-71 TF/s — these are dense GEMMs that XLA's
small-spatial conv lowering tiles poorly.  Candidates:

  xla      production form (lax.conv_general_dilated, fp32 accum)
  shift9   9 shifted (B*H*W, Ci) @ (Ci, Co) matmuls on the padded input,
           fp32 accumulated — pure GEMMs, no conv lowering
  im2col   one (B*H*W, 9*Ci) @ (9*Ci, Co) GEMM over concatenated shifted
           views (9x activation HBM, single biggest-possible matmul)

Methodology: lax.scan chains over stacked independent inputs (see
benchmarks/unet_profile.py:chain — DCE/CSE-proof), overhead-corrected.

Run: nohup python -u benchmarks/ab_unet_conv.py > /tmp/ab_unet_conv.log 2>&1 &
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



# (batch, spatial, cin, cout) — the profiled slow resnet convs (conv1 of the
# concat resnets; their conv2/shortcut shapes ride the same dispatch) at
# b=1 (latency path) and b=8 (throughput path).
SHAPES = [
    (1, 32, 2560, 1280),
    (1, 64, 1920, 640),
    (1, 64, 1280, 640),
    (1, 128, 960, 320),
    (1, 32, 1280, 1280),
    (1, 64, 640, 640),
    (8, 32, 2560, 1280),
    (8, 64, 1920, 640),
    (8, 64, 1280, 640),
]


def overhead():
    x = jnp.ones((8, 128), jnp.float32)
    f = jax.jit(lambda x: x * 2.0)
    float(jnp.sum(f(x)))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter(); float(jnp.sum(f(x)))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def chain(step, *stacked_arrays):
    """stacked_arrays: already (reps,)+shape, with DISTINCT random slices —
    identical broadcast slices measured above-peak rates even with the
    abs-reduce (448-2650 "TF/s" at b=1), so no value-level shortcut is
    left possible."""

    def body(acc, xs):
        # abs() before the reduction: a LINEAR reduce lets XLA fold
        # sum(conv(x)) into a pooled dot and skip the conv entirely
        # (measured "4562 TF/s" on a bare conv); abs blocks the rewrite.
        return acc + jnp.sum(jnp.abs(step(*xs).astype(jnp.float32))), None

    fj = jax.jit(lambda st: lax.scan(body, jnp.float32(0.0), st)[0])
    return lambda: fj(stacked_arrays)


def timed(f, oh, reps):
    float(f())
    ts = []
    for _ in range(3):
        t0 = time.perf_counter(); float(f())
        ts.append(time.perf_counter() - t0)
    return (float(np.median(ts)) - oh) / reps


def conv_xla(x, w):
    y = lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    return y.astype(jnp.bfloat16)


def conv_shift9(x, w):
    b, h, wd, ci = x.shape
    co = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = None
    for dy in range(3):
        for dx in range(3):
            t = lax.dot_general(
                xp[:, dy:dy + h, dx:dx + wd, :].reshape(b * h * wd, ci),
                w[dy, dx], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc = t if acc is None else acc + t
    return acc.reshape(b, h, wd, co).astype(jnp.bfloat16)


def conv_im2col(x, w):
    b, h, wd, ci = x.shape
    co = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    cols = jnp.concatenate(
        [xp[:, dy:dy + h, dx:dx + wd, :]
         for dy in range(3) for dx in range(3)], axis=-1)
    y = lax.dot_general(cols.reshape(b * h * wd, 9 * ci),
                        w.reshape(9 * ci, co), (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
    return y.reshape(b, h, wd, co).astype(jnp.bfloat16)


def main():
    print("backend:", jax.default_backend(), flush=True)
    oh = overhead()
    print(f"overhead {oh*1e3:.1f} ms", flush=True)
    rng = np.random.default_rng(0)
    variants = [("xla", conv_xla), ("shift9", conv_shift9),
                ("im2col", conv_im2col)]
    for b, s, ci, co in SHAPES:
        # distinct slices, reps sized so chain compute >> per-call noise
        # (~1 ms) while the stacked input stays <= ~1 GB
        nbytes = b * s * s * ci * 2
        reps = int(min(48, max(12, (1 << 30) // max(nbytes, 1))))
        xs = jnp.asarray(rng.standard_normal((reps, b, s, s, ci)) * 0.1,
                         jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((3, 3, ci, co)) * 0.02,
                        jnp.bfloat16)
        fl = 2 * b * s * s * 9 * ci * co
        row = [f"{b}x{s}^2 {ci:4d}->{co:4d} r{reps}:"]
        for name, fn in variants:
            t = timed(chain(lambda y, w=w, fn=fn: fn(y, w), xs), oh, reps)
            row.append(f"{name} {t*1e3:6.2f} ms {fl/(t+1e-12)/1e12:5.1f} TF/s")
        print("  ".join(row), flush=True)


if __name__ == "__main__":
    main()
