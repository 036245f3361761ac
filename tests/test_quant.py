"""Int8 VAE conv path: quantization correctness and pipeline integration."""

import numpy as np
import jax.numpy as jnp
import pytest

from sdmatte_tpu.configs import SDMatteConfig
from sdmatte_tpu.core import nn as F
from sdmatte_tpu.core.dtypes import FP32
from sdmatte_tpu.models import sdmatte
from sdmatte_tpu.ops import quant
from sdmatte_tpu.pipeline import MattingPipeline, PipelineOptions


def test_weight_quant_roundtrip(rng):
    w = jnp.asarray(rng.standard_normal((3, 3, 8, 16)) * 0.3, jnp.float32)
    wq, scale = quant.quantize_weights_int8(w)
    assert wq.dtype == jnp.int8 and scale.shape == (16,)
    back = wq.astype(jnp.float32) * scale
    # symmetric per-channel int8: error bounded by half a step per channel
    step = np.asarray(scale)
    assert (np.abs(np.asarray(back - w)) <= 0.5 * step[None, None, None] + 1e-7).all()


def test_conv2d_int8_close_to_fp(rng):
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 8)), jnp.float32)
    p = {"kernel": jnp.asarray(rng.standard_normal((3, 3, 8, 8)) * 0.2,
                               jnp.float32),
         "bias": jnp.asarray(rng.standard_normal(8) * 0.1, jnp.float32)}
    ref = np.asarray(F.conv2d(p, x, policy=FP32))
    pq = quant.quantize_conv_params(p)
    got = np.asarray(quant.conv2d_int8(x, pq["kernel_q"], pq["kernel_scale"],
                                       pq["bias"], out_dtype=jnp.float32))
    # int8 dynamic-per-tensor: relative error a few percent of the range
    scale = np.abs(ref).max()
    assert np.abs(got - ref).max() / scale < 0.05


def test_conv2d_dispatches_on_quantized_params(rng):
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 8)), jnp.float32)
    p = {"kernel": jnp.asarray(rng.standard_normal((3, 3, 8, 8)) * 0.2,
                               jnp.float32),
         "bias": jnp.zeros((8,), jnp.float32)}
    pq = quant.quantize_conv_params(p)
    y_fp = np.asarray(F.conv2d(p, x, policy=FP32))
    y_q = np.asarray(F.conv2d(pq, x, policy=FP32))
    assert not np.array_equal(y_q, y_fp)          # int8 path actually taken
    assert np.abs(y_q - y_fp).max() / max(1e-6, np.abs(y_fp).max()) < 0.05


def test_quantize_vae_tree_scope():
    """Only 3x3 convs gain int8 fields; 1x1 and norms stay fp."""
    from sdmatte_tpu.models import vae
    cfg = SDMatteConfig.tiny()
    params = vae.init(cfg.vae, seed=0)
    q = quant.quantize_vae_tree(params)
    assert "kernel_q" in q["encoder"]["conv_in"]
    assert "kernel_q" not in q["quant_conv"]              # 1x1 stays fp
    assert "kernel_q" not in q["post_quant_conv"]
    assert "scale" in q["encoder"]["conv_norm_out"]       # norms untouched


def test_pipeline_vae_int8_runs_and_stays_close(rng):
    cfg = SDMatteConfig.tiny()
    params = sdmatte.init(cfg, seed=0)
    img = rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)
    tri = rng.uniform(0, 1, (1, 64, 64)).astype(np.float32)
    opts = PipelineOptions(inference_size=64, mask_refine=False)

    ref_pipe = MattingPipeline(params, cfg, attn_impl="xla")
    q_pipe = MattingPipeline(params, cfg, attn_impl="xla", vae_int8=True)
    a_ref, _ = ref_pipe(img, tri, options=opts)
    a_q, _ = q_pipe(img, tri, options=opts)
    mae = float(np.abs(np.asarray(a_ref) - np.asarray(a_q)).mean())
    assert np.isfinite(np.asarray(a_q)).all()
    # random-weight tiny model: int8 alpha stays within a loose envelope;
    # the real quality gate is benchmarks/quality.py on the full model
    assert mae < 0.1, mae
