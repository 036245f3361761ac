"""Parity tests for core numerics against torch CPU (the fp32 parity ref).

These anchor the hard parts ranked in SURVEY.md §7: resize parity (#3) and
embedding construction, plus norm/linear/conv primitive parity.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F
import jax.numpy as jnp

from sdmatte_tpu.core import imaging, embeddings, nn as jnn


# ---------------------------------------------------------------- resize ---

@pytest.mark.parametrize("in_hw,out_hw", [
    ((64, 64), (32, 32)),      # exact /2 downscale
    ((100, 80), (64, 64)),     # ragged downscale
    ((33, 47), (64, 64)),      # upscale
    ((64, 48), (64, 64)),      # mixed: same H, upscale W
    ((512, 512), (96, 96)),    # big downscale (preprocess path)
])
def test_bilinear_antialias_matches_torch(rng, in_hw, out_hw):
    x = rng.standard_normal((2, *in_hw, 3), dtype=np.float32)
    ours = imaging.resize_bilinear(jnp.asarray(x), *out_hw, antialias=True)
    ref = F.interpolate(
        torch.from_numpy(x).permute(0, 3, 1, 2), size=out_hw,
        mode="bilinear", antialias=True,
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("in_hw,out_hw", [
    ((64, 64), (32, 32)),
    ((33, 47), (64, 64)),
    ((100, 80), (64, 64)),
])
def test_bilinear_no_antialias_matches_torch(rng, in_hw, out_hw):
    x = rng.standard_normal((1, *in_hw, 2), dtype=np.float32)
    ours = imaging.resize_bilinear(jnp.asarray(x), *out_hw, antialias=False)
    ref = F.interpolate(
        torch.from_numpy(x).permute(0, 3, 1, 2), size=out_hw,
        mode="bilinear", antialias=False,
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("in_hw,out_hw", [
    ((128, 128), (16, 16)),    # the 1/8 attention-mask downsample
    ((128, 128), (64, 64)),
    ((16, 16), (8, 8)),
    ((17, 23), (9, 13)),
])
def test_nearest_matches_torch(rng, in_hw, out_hw):
    x = rng.standard_normal((1, *in_hw, 1), dtype=np.float32)
    ours = imaging.resize_nearest(jnp.asarray(x), *out_hw)
    ref = F.interpolate(
        torch.from_numpy(x).permute(0, 3, 1, 2), size=out_hw, mode="nearest",
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_array_equal(np.asarray(ours), ref)


def test_resize_identity_is_noop(rng):
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 3), dtype=np.float32))
    np.testing.assert_array_equal(np.asarray(imaging.resize_bilinear(x, 8, 8)), np.asarray(x))


# ----------------------------------------------------------- embeddings ---

def _torch_timestep_embedding(t, dim, flip_sin_to_cos=True, shift=0.0):
    """Reference formula of diffusers.get_timestep_embedding, in torch."""
    half = dim // 2
    exponent = -np.log(10000.0) * torch.arange(half, dtype=torch.float32) / (half - shift)
    emb = t.float()[:, None] * torch.exp(exponent)[None, :]
    emb = torch.cat([torch.sin(emb), torch.cos(emb)], dim=-1)
    if flip_sin_to_cos:
        emb = torch.cat([emb[:, half:], emb[:, :half]], dim=-1)
    if dim % 2 == 1:
        emb = F.pad(emb, (0, 1))
    return emb


@pytest.mark.parametrize("dim", [320, 1280, 16, 21])
def test_sinusoidal_embedding(dim):
    # Values in [0,1] — what the model actually embeds (opacity flag and
    # normalized coords); tight bound here.
    t = np.array([0.0, 1.0, 0.5, 0.25, 0.8], dtype=np.float32)
    ours = embeddings.sinusoidal_embedding(jnp.asarray(t), dim)
    ref = _torch_timestep_embedding(torch.from_numpy(t), dim).numpy()
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5, rtol=1e-5)


def test_sinusoidal_embedding_large_t():
    # Large timesteps: fp32 sin range-reduction differs across libs by ~1 ulp
    # of the argument; loose bound (the inference path never embeds t > 1).
    t = np.array([999.0, 123.0], dtype=np.float32)
    ours = embeddings.sinusoidal_embedding(jnp.asarray(t), 320)
    ref = _torch_timestep_embedding(torch.from_numpy(t), 320).numpy()
    np.testing.assert_allclose(np.asarray(ours), ref, atol=3e-4)


def test_point_coords_padding():
    # N=2 coords: smallest i>=2 dividing 1680 is 2 -> 840 channels
    assert embeddings.point_coords_padding(2) == (2, 840)
    assert embeddings.point_coords_padding(7) == (7, 240)
    assert embeddings.point_coords_padding(11) == (12, 140)   # 11 doesn't divide
    assert embeddings.point_coords_padding(1680) == (1680, 1)


# ------------------------------------------------------------ primitives ---

def test_group_norm_matches_torch(rng):
    x = rng.standard_normal((2, 8, 8, 64), dtype=np.float32)
    scale = rng.standard_normal(64, dtype=np.float32)
    bias = rng.standard_normal(64, dtype=np.float32)
    ours = jnn.group_norm({"scale": jnp.asarray(scale), "bias": jnp.asarray(bias)},
                          jnp.asarray(x), groups=32, eps=1e-6)
    ref = F.group_norm(torch.from_numpy(x).permute(0, 3, 1, 2), 32,
                       torch.from_numpy(scale), torch.from_numpy(bias), eps=1e-6)
    ref = ref.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5, rtol=1e-5)


def test_layer_norm_matches_torch(rng):
    x = rng.standard_normal((2, 7, 96), dtype=np.float32)
    scale = rng.standard_normal(96, dtype=np.float32)
    bias = rng.standard_normal(96, dtype=np.float32)
    ours = jnn.layer_norm({"scale": jnp.asarray(scale), "bias": jnp.asarray(bias)},
                          jnp.asarray(x), eps=1e-5)
    ref = F.layer_norm(torch.from_numpy(x), (96,), torch.from_numpy(scale),
                       torch.from_numpy(bias), eps=1e-5).numpy()
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("stride,pad", [(1, 1), (2, 1), (1, 0)])
def test_conv2d_matches_torch(rng, stride, pad):
    x = rng.standard_normal((2, 9, 9, 8), dtype=np.float32)
    w = rng.standard_normal((16, 8, 3, 3), dtype=np.float32) * 0.1  # OIHW
    b = rng.standard_normal(16, dtype=np.float32)
    p = {"kernel": jnp.asarray(w.transpose(2, 3, 1, 0)), "bias": jnp.asarray(b)}
    ours = jnn.conv2d(p, jnp.asarray(x), stride=stride, padding=pad)
    ref = F.conv2d(torch.from_numpy(x).permute(0, 3, 1, 2), torch.from_numpy(w),
                   torch.from_numpy(b), stride=stride, padding=pad)
    ref = ref.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-4, rtol=1e-4)


def test_conv2d_asymmetric_padding_matches_torch(rng):
    # VAE encoder downsample: F.pad (0,1,0,1) then stride-2 conv pad 0
    x = rng.standard_normal((1, 8, 8, 4), dtype=np.float32)
    w = rng.standard_normal((8, 4, 3, 3), dtype=np.float32) * 0.1
    b = np.zeros(8, dtype=np.float32)
    p = {"kernel": jnp.asarray(w.transpose(2, 3, 1, 0)), "bias": jnp.asarray(b)}
    ours = jnn.conv2d(p, jnp.asarray(x), stride=2, padding=((0, 1), (0, 1)))
    xt = F.pad(torch.from_numpy(x).permute(0, 3, 1, 2), (0, 1, 0, 1))
    ref = F.conv2d(xt, torch.from_numpy(w), torch.from_numpy(b), stride=2)
    ref = ref.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-4, rtol=1e-4)


def test_geglu_matches_torch(rng):
    x = rng.standard_normal((2, 5, 32), dtype=np.float32)
    w = rng.standard_normal((128, 32), dtype=np.float32) * 0.1
    b = rng.standard_normal(128, dtype=np.float32)
    p = {"kernel": jnp.asarray(w.T), "bias": jnp.asarray(b)}
    ours = jnn.geglu(p, jnp.asarray(x))
    y = torch.from_numpy(x) @ torch.from_numpy(w).T + torch.from_numpy(b)
    a, g = y.chunk(2, dim=-1)
    ref = (a * F.gelu(g)).numpy()
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("mode", ["base", "dilated", "poly1"])
def test_upsample2x_conv_matches_torch(rng, mode):
    """All upsample2x formulations == torch nearest-x2 + conv3x3 (diffusers
    Upsample2D semantics; reference decoder/U-Net upsamplers)."""
    x = rng.standard_normal((2, 7, 5, 8), dtype=np.float32)
    w = rng.standard_normal((12, 8, 3, 3), dtype=np.float32) * 0.1
    b = rng.standard_normal(12, dtype=np.float32)
    p = {"kernel": jnp.asarray(w.transpose(2, 3, 1, 0)), "bias": jnp.asarray(b)}
    ours = jnn.upsample2x_conv(p, jnp.asarray(x), mode=mode)
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    ref = F.conv2d(F.interpolate(xt, scale_factor=2, mode="nearest"),
                   torch.from_numpy(w), torch.from_numpy(b), padding=1)
    ref = ref.permute(0, 2, 3, 1).numpy()
    assert np.asarray(ours).shape == ref.shape
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-4, rtol=1e-4)
