"""Round-5 deep-review fixes: pin the corrected behaviors.

Each test guards one finding from the high-effort core-path review
(conv3x3 grid truncation, _chunked divisor fallback, aux-less forward,
output_mode validation, vae_int8 + int8-storage composition).
"""

import dataclasses

import numpy as np
import pytest
import jax.numpy as jnp

from sdmatte_tpu.configs import SDMatteConfig
from sdmatte_tpu.models import sdmatte
from sdmatte_tpu.pipeline import MattingPipeline, PipelineOptions


@pytest.fixture(scope="module")
def tiny_pipe():
    cfg = SDMatteConfig.tiny()
    params = sdmatte.init(cfg, seed=0)
    return MattingPipeline(params, cfg, attn_impl="xla")


def test_conv3x3_rejects_non_divisor_cout_block():
    """A cout_block that doesn't divide Cout would silently leave trailing
    output channels as uninitialized Pallas memory — must raise instead."""
    from sdmatte_tpu.ops.conv3x3 import conv3x3_same
    x = jnp.zeros((1, 16, 16, 8), jnp.bfloat16)
    w = jnp.zeros((3, 3, 8, 320), jnp.bfloat16)
    with pytest.raises(ValueError, match="must divide"):
        conv3x3_same(x, w, cout_block=256)


def test_chunked_falls_back_to_divisor_not_full_batch():
    """b=6 with vae_chunk=4: the old code silently ran UNchunked (defeating
    the memory cap the user asked for); now the largest divisor <= chunk
    (3) is used and the result is identical math."""
    calls = []

    def fn(x):
        calls.append(x.shape[0])
        return x * 2.0

    x = jnp.arange(6 * 2, dtype=jnp.float32).reshape(6, 2)
    out = sdmatte._chunked(fn, x, 4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x) * 2.0)
    assert calls and all(c == 3 for c in calls)   # chunked at divisor 3, not 6


def test_use_aux_input_false_raises_clearly():
    """Reference parity: meta_arch.py:145-146,244 crashes on the same
    config; we fail loudly with the explanation instead of a trace-time
    concat TypeError."""
    cfg = dataclasses.replace(SDMatteConfig.tiny(), use_aux_input=False)
    params = sdmatte.init(SDMatteConfig.tiny(), seed=0)
    data = {
        "image": jnp.zeros((1, 64, 64, 3)),
        "trimap": jnp.zeros((1, 64, 64, 1)),
        "trimap_coords": jnp.zeros((1, 4)),
        "is_trans": jnp.zeros((1,)),
    }
    with pytest.raises(NotImplementedError, match="use_aux_input"):
        sdmatte.forward(params, cfg, data)


def test_unknown_output_mode_rejected(tiny_pipe, rng):
    """A typo like 'rgba' must not silently alpha-blend (the reference UI
    dropdown can't produce one; programmatic callers can)."""
    img = rng.uniform(0, 1, (1, 40, 40, 3)).astype(np.float32)
    tri = rng.uniform(0, 1, (1, 40, 40)).astype(np.float32)
    with pytest.raises(ValueError, match="output_mode"):
        tiny_pipe(img, tri, options=PipelineOptions(
            inference_size=64, output_mode="rgba"))


def test_vae_int8_composes_with_int8_storage(rng):
    """vae_int8 (int8 COMPUTE on big 3x3 VAE convs) must survive
    weight_storage='int8' (int8 STORAGE): the compute quantization runs
    first, so every eligible conv carries kernel_q."""
    cfg = SDMatteConfig.tiny()
    params = sdmatte.init(cfg, seed=0)

    def count_q(node, key):
        if isinstance(node, dict):
            return (key in node) + sum(count_q(v, key) for v in node.values())
        return 0

    pipe = MattingPipeline(params, cfg, attn_impl="xla",
                           weight_storage="int8", vae_int8=True)
    ref = MattingPipeline(params, cfg, attn_impl="xla", vae_int8=True)
    n_combined = count_q(pipe.params["vae"], "kernel_q")
    n_alone = count_q(ref.params["vae"], "kernel_q")
    assert n_combined == n_alone and n_combined > 0
    # and the combined pipeline still mattes
    img = rng.uniform(0, 1, (1, 40, 40, 3)).astype(np.float32)
    tri = rng.uniform(0, 1, (1, 40, 40)).astype(np.float32)
    alpha, _ = pipe(img, tri, options=PipelineOptions(inference_size=64))
    assert np.asarray(alpha).shape == (1, 40, 40)
