"""On-TPU comparison: Pallas conv3x3 (ops/conv3x3.py) vs XLA's native conv,
across ALL the VAE hot shapes at 1024px (VERDICT round 1, item 1).

Each timing chains 8 convs in one jit graph; for ci != co the input is
perturbed per step (x * (1 + eps*i)) so XLA cannot CSE the repeats.  Prints
a winner table; the production dispatch table (ops/dispatch.py) is updated
from these measurements.

Run: nohup python benchmarks/conv_check.py > /tmp/conv_check.log 2>&1 &
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

from sdmatte_tpu.ops.conv3x3 import conv3x3_same  # noqa: E402

# (batch, spatial, cin, cout) — the full VAE conv population at 1024px
# (encoder runs b=2 per matte: rgb+aux batched; decoder b=1)
SHAPES = [
    (2, 1024, 128, 128),   # encoder stage-0 resnets (hot: 2.5 TF/matte)
    (2, 512, 256, 256),    # encoder stage-1
    (2, 512, 128, 256),    # encoder stage-1 entry
    (2, 256, 512, 512),    # encoder stage-2
    (2, 256, 256, 512),    # encoder stage-2 entry
    (2, 128, 512, 512),    # encoder stage-3 + mid
    (1, 1024, 128, 128),   # decoder stage-3 resnets (hot: 1.9 TF/matte)
    (1, 1024, 256, 256),   # decoder stage-2->3 upsample conv (1.2 TF)
    (1, 1024, 256, 128),   # decoder stage-3 entry
    (1, 512, 256, 256),    # decoder stage-2 resnets
    (1, 512, 512, 256),    # decoder stage-2 entry
    (1, 512, 512, 512),    # decoder stage-1->2 upsample conv (1.2 TF)
    (1, 256, 512, 512),    # decoder stage-1
    (1, 128, 512, 512),    # decoder stage-0 + mid
]

REPS = 8


def chain(f):
    """8 dependent convs; input perturbed per step to defeat CSE."""
    def body(x, w):
        def step(i, acc):
            xi = x * (1.0 + 1e-6 * i.astype(x.dtype))
            return acc + f(xi, w).astype(jnp.float32)
        return lax.fori_loop(0, REPS, step, jnp.zeros(f_shape, jnp.float32))
    return jax.jit(body)


def main():
    rng = np.random.default_rng(0)
    print("backend:", jax.default_backend(), flush=True)
    global f_shape
    wins = {}
    for b, s, ci, co in SHAPES:
        x = jnp.asarray(rng.standard_normal((b, s, s, ci)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((3, 3, ci, co)) * 0.02, jnp.bfloat16)
        fl = 2 * b * s * s * ci * co * 9 * REPS
        f_shape = (b, s, s, co)

        def xla_conv(x, w):
            return lax.conv_general_dilated(
                x, w, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32).astype(jnp.bfloat16)

        results = {}
        variants = [("xla", xla_conv),
                    ("pallas", lambda x, w: conv3x3_same(x, w))]
        for name, f in variants:
            try:
                fj = chain(f)
                o = fj(x, w)
                float(jnp.sum(o[..., :1, :1]))
                t0 = time.perf_counter()
                o = fj(x, w)
                float(jnp.sum(o[..., :1, :1]))
                t = (time.perf_counter() - t0) / REPS
            except Exception as e:
                print(f"{name:7s} {b}x{s}^2 {ci}->{co}: FAILED {type(e).__name__}: {str(e)[:120]}",
                      flush=True)
                continue
            results[name] = t
            print(f"{name:7s} {b}x{s}^2 {ci}->{co}: {t*1e3:7.2f} ms/conv "
                  f"{fl/REPS/t/1e12:5.1f} TF/s", flush=True)
        if len(results) == 2:
            speedup = results["xla"] / results["pallas"]
            winner = "pallas" if speedup > 1.0 else "xla"
            wins[(b, s, ci, co)] = (winner, round(speedup, 3))
            try:  # parity check (never abort the sweep)
                got = conv3x3_same(x, w)
                ref = xla_conv(x, w)
                err = float(jnp.abs(got.astype(jnp.float32)
                                    - ref.astype(jnp.float32)).max())
                print(f"  -> {winner} (pallas speedup {speedup:.2f}x), "
                      f"parity maxerr {err:.5f}", flush=True)
            except Exception as e:
                print(f"  -> parity check failed: {str(e)[:100]}", flush=True)

    print("\nwinner table (for ops/dispatch.py):")
    for k, v in wins.items():
        print(f"  {k}: {v}")


if __name__ == "__main__":
    main()
