"""Shape/behavior tests for the model stack on tiny configs (SURVEY.md §4.3).

Everything runs under jit — eager per-op dispatch is pathologically slow on
the 1-core CI host, and jit is the only mode that matters on TPU anyway.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sdmatte_tpu.configs import SDMatteConfig, UNetConfig
from sdmatte_tpu.models import vae, unet, sdmatte


@pytest.fixture(scope="module")
def tiny_cfg():
    return SDMatteConfig.tiny()


@pytest.fixture(scope="module")
def tiny_params(tiny_cfg):
    return sdmatte.init(tiny_cfg, seed=0)


def test_vae_encode_decode_shapes(tiny_cfg, tiny_params):
    x = jnp.zeros((2, 64, 64, 3), jnp.float32)
    enc = jax.jit(lambda p, x: vae.encode(p, x, tiny_cfg.vae, attn_impl="xla"))
    z = enc(tiny_params["vae"], x)
    assert z.shape == (2, 8, 8, 4)
    dec = jax.jit(lambda p, z: vae.decode(p, z, tiny_cfg.vae, attn_impl="xla"))
    y = dec(tiny_params["vae"], z)
    assert y.shape == (2, 64, 64, 3)


@pytest.fixture(scope="module")
def unet_fn(tiny_cfg):
    cfg = tiny_cfg.unet

    @jax.jit
    def fn(params, sample, trans, ctx, coords_emb, mask):
        return unet.apply(params, cfg, sample=sample, trans=trans,
                          encoder_hidden_states=ctx,
                          coords_embed={"bbox_mask_coords": coords_emb},
                          attention_mask=mask, attn_impl="xla")
    return fn


def test_unet_forward_and_mask_effect(tiny_cfg, tiny_params, unet_fn):
    cfg = tiny_cfg.unet
    rng = np.random.default_rng(1)
    b, h = 1, 8
    sample = jnp.asarray(rng.standard_normal((b, h, h, 8)), jnp.float32)
    aux_lat = jnp.asarray(rng.standard_normal((b, h, h, 4)), jnp.float32)
    ctx = jax.jit(lambda p, a: unet.aux_tokens(p, a, cfg))(tiny_params["unet"], aux_lat)
    assert ctx.shape == (b, h * h, cfg.aux_token_dim)
    coords = jnp.zeros((b, 1280), jnp.float32)
    trans = jnp.ones((b,), jnp.float32)

    m_full = jnp.ones((b, h * h), jnp.float32)
    m_half = np.ones((b, h * h), np.float32)
    m_half[:, : h * h // 2] = 0.0

    o_full = unet_fn(tiny_params["unet"], sample, trans, ctx, coords, m_full)
    assert o_full.shape == (b, h, h, cfg.out_channels)
    assert np.isfinite(np.asarray(o_full)).all()
    # the additive attention bias must actually steer attention
    o_half = unet_fn(tiny_params["unet"], sample, trans, ctx, coords,
                     jnp.asarray(m_half))
    assert float(jnp.abs(o_full - o_half).max()) > 1e-6


def test_unet_encoder_attention_mask(tiny_cfg, tiny_params):
    """Masking ctx tokens via encoder_attention_mask changes the output
    (reference use_encoder_attention_mask path, replace.py:405-407)."""
    cfg = tiny_cfg.unet
    rng = np.random.default_rng(3)
    b, h = 1, 8
    sample = jnp.asarray(rng.standard_normal((b, h, h, 8)), jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((b, h * h, cfg.aux_token_dim)), jnp.float32)
    coords = {"bbox_mask_coords": jnp.zeros((b, 1280), jnp.float32)}

    @jax.jit
    def fn(params, enc_mask):
        return unet.apply(params, cfg, sample=sample, trans=jnp.ones((b,)),
                          encoder_hidden_states=ctx, coords_embed=coords,
                          attention_mask=None,
                          encoder_attention_mask=enc_mask, attn_impl="xla")

    full = fn(tiny_params["unet"], jnp.ones((b, h * h)))
    m = np.ones((b, h * h), np.float32)
    m[:, : h * h // 2] = 0.0
    half = fn(tiny_params["unet"], jnp.asarray(m))
    assert float(jnp.abs(full - half).max()) > 1e-6


def test_unet_point_branch(tiny_cfg, tiny_params):
    cfg = tiny_cfg.unet
    b, h = 1, 8
    sample = jnp.zeros((b, h, h, 8), jnp.float32)
    ctx = jnp.zeros((b, h * h, cfg.aux_token_dim), jnp.float32)

    @jax.jit
    def fn(params, sample, ctx, pe):
        return unet.apply(params, cfg, sample=sample, trans=jnp.zeros((b,)),
                          encoder_hidden_states=ctx,
                          coords_embed={"point_coords": pe},
                          attention_mask=None, attn_impl="xla")

    pe = jnp.zeros((b, cfg.point_embeddings_input_dim), jnp.float32)
    out = fn(tiny_params["unet"], sample, ctx, pe)
    assert out.shape == (b, h, h, cfg.out_channels)


def test_sdmatte_forward_jits_and_bounds(tiny_cfg, tiny_params):
    rng = np.random.default_rng(0)
    b, s = 1, 64
    data = {
        "image": jnp.asarray(rng.uniform(-1, 1, (b, s, s, 3)), jnp.float32),
        "trimap": jnp.asarray(rng.uniform(-1, 1, (b, s, s, 1)), jnp.float32),
        "trimap_coords": jnp.tile(jnp.asarray([[0.0, 0.0, 1.0, 1.0]]), (b, 1)),
        "is_trans": jnp.zeros((b,), jnp.float32),
    }
    fwd = jax.jit(lambda p, d: sdmatte.forward(p, tiny_cfg, d, attn_impl="xla"))
    alpha = fwd(tiny_params, data)
    assert alpha.shape == (b, s, s, 1)
    a = np.asarray(alpha)
    assert np.all(a >= 0.0) and np.all(a <= 1.0)
    assert np.isfinite(a).all()


def test_sdmatte_text_gating_uses_clip(tiny_params):
    """With gating [True, False, True] the mid stage consumes CLIP tokens."""
    base = SDMatteConfig.tiny()
    cfg = SDMatteConfig(
        vae=base.vae,
        unet=UNetConfig(
            **{**{f.name: getattr(base.unet, f.name)
                  for f in base.unet.__dataclass_fields__.values()},
               "use_encoder_hidden_states_list": (True, False, True)}),
        clip=base.clip,
    )
    b, s = 1, 64
    data = {
        "image": jnp.zeros((b, s, s, 3), jnp.float32),
        "trimap": jnp.zeros((b, s, s, 1), jnp.float32),
        "trimap_coords": jnp.tile(jnp.asarray([[0.0, 0.0, 1.0, 1.0]]), (b, 1)),
        "is_trans": jnp.zeros((b,), jnp.float32),
        "text_ids": jnp.zeros((b, 77), jnp.int32),
    }
    alpha = jax.jit(lambda p, d: sdmatte.forward(p, cfg, d, attn_impl="xla"))(
        tiny_params, data)
    assert alpha.shape == (b, s, s, 1)
