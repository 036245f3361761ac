"""A/B: nearest-2x-upsample + conv3x3 vs algebraically-equivalent cheap forms.

The decoder's three upsamplers (and the U-Net's two) are `nearest x2 ->
conv3x3(pad 1)` (diffusers Upsample2D semantics; reference replace.py builds
them via diffusers get_up_block).  Because nearest x2 duplicates pixels, the
3x3 window over the upsampled tensor touches at most 2x2 DISTINCT input
pixels — the op is exactly a stride-2 transposed conv with a combined 4-tap
kernel per dim:

    y[2p+a] = sum_dm W[dm] * x[p + floor((a+dm)/2)]
    K4 = [W0, W0+W1, W1+W2, W2]   (per spatial dim, outer product in 2D)

That is 16 MACs per input pixel instead of 36 (2.25x FLOP cut on ~2.8 TFLOP
of decode) and never materializes the upsampled tensor (512 MB at
1024^2 x 256 bf16).  Candidate forms, all pure XLA (decode is a no-Pallas
zone — ops/dispatch.py history):

  base     production form: jnp.repeat x2 + conv3x3 pad1
  dilated  lax.conv_general_dilated(lhs_dilation=2, K4 4x4, pad (2,2)) —
           one op; whether XLA rewrites base dilation into polyphase form
           (vs convolving the inserted zeros at 64 MACs/px) is the question
  poly4    four 2x2 convs (one per output parity) + stack/transpose
           interleave — guaranteed 16 MACs/px, pays an explicit relayout
  poly1    one 2x2-valid conv to 4*C channels on the (1,1)-padded input,
           then 4 parity slices + interleave — biggest single GEMM form

Methodology: lax.scan chains over stacked distinct inputs (DCE/CSE-proof,
see benchmarks/unet_profile.py), overhead-corrected, interleaved variants.
`--check` runs a CPU numeric equivalence pass (do this before TPU time).

Run: nohup python -u benchmarks/ab_upsample.py > /tmp/ab_upsample.log 2>&1 &
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp_cache"))

import numpy as np  # noqa: E402
import jax  # noqa: E402

if "--check" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402


# (batch, spatial_in, channels) — decoder upsamplers at 1024px for b=1
# (latency path) and b=8 (throughput path); U-Net upsamplers are <=0.13
# TFLOP total and excluded.
SHAPES = [
    (1, 128, 512),
    (1, 256, 512),
    (1, 512, 256),
    (8, 128, 512),
    (8, 256, 512),
    (8, 512, 256),
]

_T4 = np.array([[1, 0, 0], [1, 1, 0], [0, 1, 1], [0, 0, 1]], np.float32)
_S0 = np.array([[1, 0, 0], [0, 1, 1]], np.float32)   # parity 0: taps (p-1, p)
_S1 = np.array([[1, 1, 0], [0, 0, 1]], np.float32)   # parity 1: taps (p, p+1)


def k4_from_w(w):
    """(3,3,ci,co) -> (4,4,ci,co) combined transposed-conv kernel (fp32)."""
    return jnp.einsum("ai,bj,ijco->abco", _T4, _T4, w.astype(jnp.float32))


def k2_from_w(w, a, b):
    sa = jnp.asarray(_S0 if a == 0 else _S1)
    sb = jnp.asarray(_S0 if b == 0 else _S1)
    return jnp.einsum("ui,vj,ijco->uvco", sa, sb, w.astype(jnp.float32))


def _conv(x, w, pad, *, lhs_dilation=None):
    return lax.conv_general_dilated(
        x, w, (1, 1), pad, lhs_dilation=lhs_dilation,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)


def up_base(x, w):
    u = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
    return _conv(u, w, [(1, 1), (1, 1)]).astype(jnp.bfloat16)


def up_dilated(x, w):
    k4 = k4_from_w(w).astype(x.dtype)
    return _conv(x, k4, [(2, 2), (2, 2)],
                 lhs_dilation=(2, 2)).astype(jnp.bfloat16)


def _interleave(y00, y01, y10, y11):
    n, h, w, c = y00.shape
    t = jnp.stack([y00, y01, y10, y11]).reshape(2, 2, n, h, w, c)
    return t.transpose(2, 3, 0, 4, 1, 5).reshape(n, 2 * h, 2 * w, c)


def up_poly4(x, w):
    ys = {}
    for a in (0, 1):
        for b in (0, 1):
            k = k2_from_w(w, a, b).astype(x.dtype)
            pad = [(1 - a, a), (1 - b, b)]
            ys[(a, b)] = _conv(x, k, pad)
    return _interleave(ys[(0, 0)], ys[(0, 1)], ys[(1, 0)],
                       ys[(1, 1)]).astype(jnp.bfloat16)


def up_poly1(x, w):
    n, h, wd, ci = x.shape
    co = w.shape[-1]
    k = jnp.concatenate(
        [k2_from_w(w, a, b).astype(x.dtype)
         for a in (0, 1) for b in (0, 1)], axis=-1)      # (2,2,ci,4co)
    yf = _conv(x, k, [(1, 1), (1, 1)])                   # (n, h+1, w+1, 4co)
    ys = []
    for i, (a, b) in enumerate([(0, 0), (0, 1), (1, 0), (1, 1)]):
        ys.append(yf[:, a:a + h, b:b + wd, i * co:(i + 1) * co])
    return _interleave(*ys).astype(jnp.bfloat16)


VARIANTS = [("base", up_base), ("dilated", up_dilated),
            ("poly4", up_poly4), ("poly1", up_poly1)]


def check():
    rng = np.random.default_rng(0)
    for h, wd, ci, co in [(6, 6, 8, 8), (5, 7, 4, 12)]:
        x = jnp.asarray(rng.standard_normal((2, h, wd, ci)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((3, 3, ci, co)) * 0.1, jnp.float32)
        ref = np.asarray(up_base(x, w), np.float32)
        for name, fn in VARIANTS[1:]:
            got = np.asarray(fn(x, w), np.float32)
            err = float(np.abs(got - ref).max())
            assert got.shape == ref.shape, (name, got.shape, ref.shape)
            assert err < 2e-2, (name, err)   # bf16 output rounding
            print(f"check {name} ({h}x{wd} {ci}->{co}): max|d|={err:.2e} OK",
                  flush=True)
    print("all equivalence checks passed", flush=True)


def overhead():
    x = jnp.ones((8, 128), jnp.float32)
    f = jax.jit(lambda x: x * 2.0)
    float(jnp.sum(f(x)))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter(); float(jnp.sum(f(x)))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def chain(step, stacked):
    def body(acc, xs):
        return acc + jnp.sum(jnp.abs(step(xs).astype(jnp.float32))), None
    fj = jax.jit(lambda st: lax.scan(body, jnp.float32(0.0), st)[0])
    return lambda: fj(stacked)


def timed(f, oh, reps):
    float(f())
    ts = []
    for _ in range(3):
        t0 = time.perf_counter(); float(f())
        ts.append(time.perf_counter() - t0)
    return (float(np.median(ts)) - oh) / reps


def main():
    print("backend:", jax.default_backend(), flush=True)
    oh = overhead()
    print(f"overhead {oh*1e3:.1f} ms", flush=True)
    rng = np.random.default_rng(0)
    for b, s, c in SHAPES:
        nbytes = b * s * s * c * 2
        # Cap the staged scan-chain input at ~3 GB: the base variant's
        # upsampled temp (4.3 GB at 8x1024^2x256 bf16) + fp32 conv output
        # must coexist with it in 16 GB HBM when run unattended.
        reps = int(min(32, max(3, (3 << 30) // max(nbytes, 1))))
        key = jax.random.PRNGKey(b * 1000 + s)
        xs = jax.random.normal(key, (reps, b, s, s, c), jnp.bfloat16) * 0.1
        w = jnp.asarray(rng.standard_normal((3, 3, c, c)) * 0.02,
                        jnp.bfloat16)
        fl_base = 2 * b * (2 * s) * (2 * s) * 9 * c * c
        fl_poly = 2 * b * s * s * 16 * c * c
        row = [f"{b}x{s}^2 c{c:4d} r{reps}:"]
        for name, fn in VARIANTS:
            t = timed(chain(lambda y, w=w, fn=fn: fn(y, w), xs), oh, reps)
            fl = fl_base if name == "base" else fl_poly
            row.append(f"{name} {t*1e3:7.2f} ms ({fl/(t+1e-12)/1e12:5.1f} TF/s)")
        print("  ".join(row), flush=True)


if __name__ == "__main__":
    if "--check" in sys.argv:
        check()
    else:
        main()
