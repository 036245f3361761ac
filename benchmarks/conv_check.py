"""On-TPU comparison: Pallas conv3x3 (ops/conv3x3.py) vs XLA's native conv.

Round-1 measurements (v5e, bf16, chained in-graph, block_rows=8):

    shape               pallas      xla      winner
    2x1024^2x128        11.25ms    12.20ms   pallas (+8%)
    2x512^2x256          8.37ms     8.45ms   par
    2x256^2x512          7.30ms     6.92ms   xla
    2x128^2x512          4.09ms     2.84ms   xla

=> XLA's conv stays the production path (core/nn.conv2d); the Pallas kernel
is kept as the starting point for a double-buffered / K-chunked version
(docs/ROADMAP.md).  Run: python benchmarks/conv_check.py
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

SHAPES = [(2, 1024, 128), (2, 512, 256), (2, 256, 512)]


def main():
    rng = np.random.default_rng(0)
    print("backend:", jax.default_backend())
    for b, s, c in SHAPES:
        x = jnp.asarray(rng.standard_normal((b, s, s, c)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((3, 3, c, c)) * 0.02, jnp.bfloat16)
        fl = 2 * b * s * s * c * c * 9 * 8

        def chain(f):
            return jax.jit(lambda x, w: lax.fori_loop(
                0, 8, lambda i, xx: f(xx, w).astype(jnp.bfloat16), x))

        def xla_conv(x, w):
            return lax.conv_general_dilated(
                x, w, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32)

        def pallas_conv(x, w):
            return conv3x3_same(x, w, block_rows=8)

        results = {}
        for name, f in (("xla", xla_conv), ("pallas", pallas_conv)):
            fj = chain(f)
            o = fj(x, w)
            float(jnp.sum(o))
            t0 = time.perf_counter()
            o = fj(x, w)
            float(jnp.sum(o))
            t = (time.perf_counter() - t0) / 8
            results[name] = t
            print(f"{name:7s} {b}x{s}^2x{c}: {t*1e3:.2f}ms/conv "
                  f"{fl/8/t/1e12:.1f} TF/s", flush=True)
        # parity
        got = conv3x3_same(x, w, block_rows=8)
        ref = xla_conv(x, w).astype(jnp.bfloat16)
        err = float(jnp.abs(got.astype(jnp.float32) - ref.astype(jnp.float32)).max())
        print(f"  parity maxerr {err:.5f}")


if __name__ == "__main__":
    main()
