"""Measured kernel dispatch: per-shape winner table for the 3x3 conv.

XLA's native conv sustains only ~30-60 TF/s on the VAE's hot shapes at
1024px (benchmarks/stage_profile.py), and the VAE is where most of the
matte's FLOPs live (docs/ARCHITECTURE.md accounting) — so conv is the one
op where a hand kernel (ops/conv3x3.py, implicit GEMM with double-buffered
halo DMA) is dispatched per shape when it measured faster on hardware.

The table below is GENERATED from benchmarks/conv_check.py runs on a real
v5e chip (values = measured pallas-over-XLA speedup).  Entries are exact
(batch, spatial, cin, cout) shapes; anything not listed falls back to XLA.
Interpolation is deliberately avoided: conv performance on TPU is not
monotone in shape, and a mispredicted dispatch is a silent regression.

The reference has no analogue — its conv choice is whatever cuDNN picks
(torch conv2d inside diffusers blocks).
"""

from __future__ import annotations

import jax

# (batch, spatial, cin, cout) -> measured pallas speedup over XLA (>1 wins).
# Measured on TPU v5e (benchmarks/conv_check.py, bf16, 8-conv chains).
# Populated from the round-2 measurement run; keep in sync with the log in
# docs/ROADMAP.md.
PALLAS_CONV_WINS: dict[tuple[int, int, int, int], float] = {}

_MIN_SPEEDUP = 1.05  # dispatch only on a clear win


def use_pallas_conv3x3(b: int, h: int, w: int, cin: int, cout: int,
                       *, stride: int = 1, dtype_ok: bool = True) -> bool:
    """True when the Pallas conv3x3 kernel should take this shape."""
    if stride != 1 or not dtype_ok or h != w:
        return False
    if jax.default_backend() != "tpu":
        return False
    speedup = PALLAS_CONV_WINS.get((b, h, cin, cout), 0.0)
    return speedup >= _MIN_SPEEDUP
