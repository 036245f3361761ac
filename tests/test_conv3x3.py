"""Pallas conv3x3 kernel parity (interpret mode; on-TPU perf in
benchmarks/conv_check.py)."""

import numpy as np
import jax.numpy as jnp
from jax import lax
from jax.experimental.pallas import tpu as pltpu

from sdmatte_tpu.ops.conv3x3 import conv3x3_same


def _ref(x, w, b=None):
    o = lax.conv_general_dilated(x, w, (1, 1), [(1, 1), (1, 1)],
                                 dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return o if b is None else o + b


def test_conv3x3_parity(rng):
    x = jnp.asarray(rng.standard_normal((1, 16, 24, 8)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 8, 16)) * 0.1, jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        got = conv3x3_same(x, w, block_rows=8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(_ref(x, w)),
                               atol=2e-5, rtol=1e-4)


def test_conv3x3_ragged_rows_and_bias(rng):
    x = jnp.asarray(rng.standard_normal((2, 13, 24, 8)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 8, 8)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal(8), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        got = conv3x3_same(x, w, b, block_rows=8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(_ref(x, w, b)),
                               atol=2e-5, rtol=1e-4)


def test_conv3x3_cout_tiling(rng):
    """Cout split across the third grid dimension (v3): window reuse across
    weight column blocks must not change results."""
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 8)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 8, 16)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal(16), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        got = conv3x3_same(x, w, b, block_rows=8, cout_block=8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(_ref(x, w, b)),
                               atol=2e-5, rtol=1e-4)
