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


# ----------------------------------------------- int8 weight STORAGE ---


def test_compress_kernel_int8_error_bound(rng):
    w = rng.standard_normal((3, 3, 16, 32)).astype(np.float32) * 0.2
    wq, s = quant.compress_kernel_int8(w)
    assert wq.dtype == np.int8 and s.shape == (32,) and s.dtype == np.float32
    back = wq.astype(np.float32) * s
    assert (np.abs(back - w) <= 0.5 * s[None, None, None] + 1e-7).all()


def test_compress_tree_int8_scope():
    """Big kernels compress; small/1x1/norm/bias leaves stay fp; the int8
    COMPUTE fields (kernel_q) are never double-compressed."""
    rng = np.random.default_rng(0)
    tree = {
        "big": {"kernel": rng.standard_normal((256, 512)).astype(np.float32),
                "bias": np.zeros((512,), np.float32)},
        "small": {"kernel": rng.standard_normal((3, 3, 4, 8)).astype(np.float32)},
        "norm": {"scale": np.ones((8,), np.float32),
                 "bias": np.zeros((8,), np.float32)},
        "qcompute": quant.quantize_conv_params(
            {"kernel": rng.standard_normal((3, 3, 128, 256)).astype(np.float32)}),
    }
    out = quant.compress_tree_int8(tree)
    assert "kernel" not in out["big"]
    assert out["big"]["kernel_i8"].shape == (256, 512)
    assert out["big"]["kernel_s"].shape == (512,)
    assert "bias" in out["big"]
    assert "kernel" in out["small"] and "kernel_i8" not in out["small"]
    assert "scale" in out["norm"]
    assert "kernel" in out["qcompute"] and "kernel_i8" not in out["qcompute"]
    # the source tree is not mutated
    assert "kernel" in tree["big"]


def test_kernel_of_dequantizes_storage(rng):
    w = rng.standard_normal((128, 640)).astype(np.float32) * 0.1
    p = quant.compress_tree_int8({"kernel": w})
    got = np.asarray(F.kernel_of(p, jnp.float32))
    assert np.abs(got - w).max() <= 0.5 * np.abs(w).max() / 127 + 1e-7
    # fp params pass through with only the dtype cast
    assert np.array_equal(np.asarray(F.kernel_of({"kernel": jnp.asarray(w)},
                                                 jnp.float32)), w)


def test_linear_and_conv_accept_int8_storage(rng):
    x2 = jnp.asarray(rng.standard_normal((2, 700)), jnp.float32)
    pl = {"kernel": rng.standard_normal((700, 128)).astype(np.float32) * 0.05,
          "bias": rng.standard_normal(128).astype(np.float32) * 0.1}
    ref = np.asarray(F.linear(pl, x2, FP32))
    got = np.asarray(F.linear(quant.compress_tree_int8(pl), x2, FP32))
    assert np.abs(got - ref).max() / np.abs(ref).max() < 0.02

    x4 = jnp.asarray(rng.standard_normal((1, 16, 16, 64)), jnp.float32)
    pc = {"kernel": rng.standard_normal((3, 3, 64, 64)).astype(np.float32) * 0.05,
          "bias": np.zeros((64,), np.float32)}
    ref = np.asarray(F.conv2d(pc, x4, policy=FP32))
    got = np.asarray(F.conv2d(quant.compress_tree_int8(pc), x4, policy=FP32))
    assert np.abs(got - ref).max() / np.abs(ref).max() < 0.02

    # gn_silu_conv2d reads the kernel shape from the compressed dict
    pn = {"scale": np.ones((64,), np.float32),
          "bias": np.zeros((64,), np.float32)}
    ref = np.asarray(F.gn_silu_conv2d(pn, pc, x4, groups=8, policy=FP32))
    got = np.asarray(F.gn_silu_conv2d(pn, quant.compress_tree_int8(pc), x4,
                                      groups=8, policy=FP32))
    assert np.abs(got - ref).max() / max(1e-6, np.abs(ref).max()) < 0.02


def test_pipeline_weight_storage_int8(rng):
    cfg = SDMatteConfig.tiny()
    params = sdmatte.init(cfg, seed=0)
    img = rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)
    tri = rng.uniform(0, 1, (1, 64, 64)).astype(np.float32)
    opts = PipelineOptions(inference_size=64, mask_refine=False)

    ref_pipe = MattingPipeline(params, cfg, attn_impl="xla")
    q_pipe = MattingPipeline(params, cfg, attn_impl="xla",
                             weight_storage="int8")
    # the compressed tree actually holds int8 leaves for the big kernels
    import jax
    dtypes = {l.dtype for l in jax.tree_util.tree_leaves(q_pipe.params)}
    assert np.dtype(np.int8) in dtypes
    a_ref, _ = ref_pipe(img, tri, options=opts)
    a_q, _ = q_pipe(img, tri, options=opts)
    mae = float(np.abs(np.asarray(a_ref) - np.asarray(a_q)).mean())
    assert np.isfinite(np.asarray(a_q)).all()
    # weight-only int8 (bf16/fp32 activations) must sit well inside the
    # full-int8 envelope; the production gate is benchmarks/quality.py
    assert mae < 0.05, mae


def test_pipeline_drops_unused_text_tower():
    """Default all-aux gating: the CLIP tower must not be staged on device
    (reference computes-and-discards it, meta_arch.py:225-234; we skip both
    the compute and the ~0.7 GB residency)."""
    import jax
    cfg = SDMatteConfig.tiny()
    assert all(cfg.unet.use_encoder_hidden_states_list)
    params = sdmatte.init(cfg, seed=0)
    pipe = MattingPipeline(params, cfg, attn_impl="xla")
    assert jax.tree_util.tree_leaves(pipe.params["text_encoder"]) == []
    # a text-gated config keeps the tower
    import dataclasses
    unet_cfg = dataclasses.replace(
        cfg.unet, use_encoder_hidden_states_list=(True, False, True))
    cfg2 = dataclasses.replace(cfg, unet=unet_cfg)
    pipe2 = MattingPipeline(params, cfg2, attn_impl="xla")
    assert jax.tree_util.tree_leaves(pipe2.params["text_encoder"]) != []


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
