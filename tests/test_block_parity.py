"""Block-level cross-checks against independently-written torch modules.

Real SDMatte weights aren't available in CI, so beyond primitive parity
(test_core) we verify the block WIRING — pre-LN transformer ordering, GEGLU
feed-forward, resnet time-embedding injection, VAE downsample padding — by
loading identical weights into a from-scratch torch implementation of each
block and comparing outputs in fp32.
"""

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as TF
import jax.numpy as jnp
import pytest

from sdmatte_tpu.configs import UNetConfig, VAEConfig
from sdmatte_tpu.core.dtypes import FP32
from sdmatte_tpu.models import unet as junet
from sdmatte_tpu.models import vae as jvae


# --------------------------------------------------- torch reference blocks

class TorchTransformerBlock(nn.Module):
    """Transformer2DModel w/ linear projection: GN -> proj_in ->
    [preLN attn1, preLN cross-attn2, preLN GEGLU-FF] -> proj_out + residual."""

    def __init__(self, c, heads, ctx_dim, groups):
        super().__init__()
        self.heads = heads
        self.norm = nn.GroupNorm(groups, c, eps=1e-6)
        self.proj_in = nn.Linear(c, c)
        self.norm1 = nn.LayerNorm(c)
        self.q1 = nn.Linear(c, c, bias=False)
        self.k1 = nn.Linear(c, c, bias=False)
        self.v1 = nn.Linear(c, c, bias=False)
        self.o1 = nn.Linear(c, c)
        self.norm2 = nn.LayerNorm(c)
        self.q2 = nn.Linear(c, c, bias=False)
        self.k2 = nn.Linear(ctx_dim, c, bias=False)
        self.v2 = nn.Linear(ctx_dim, c, bias=False)
        self.o2 = nn.Linear(c, c)
        self.norm3 = nn.LayerNorm(c)
        self.ff_proj = nn.Linear(c, 8 * c)
        self.ff_out = nn.Linear(4 * c, c)
        self.proj_out = nn.Linear(c, c)

    def attn(self, q, k, v, bias):
        b, lq, c = q.shape
        h = self.heads
        d = c // h
        q = q.view(b, lq, h, d).transpose(1, 2)
        k = k.view(b, k.shape[1], h, d).transpose(1, 2)
        v = v.view(b, v.shape[1], h, d).transpose(1, 2)
        s = q @ k.transpose(-1, -2) / np.sqrt(d)
        if bias is not None:
            s = s + bias[:, None, None, :]
        p = s.softmax(-1)
        return (p @ v).transpose(1, 2).reshape(b, lq, c)

    def forward(self, x_nchw, ctx, bias_self, bias_cross):
        b, c, hh, ww = x_nchw.shape
        res = x_nchw
        y = self.norm(x_nchw).permute(0, 2, 3, 1).reshape(b, hh * ww, c)
        y = self.proj_in(y)
        n1 = self.norm1(y)
        y = y + self.o1(self.attn(self.q1(n1), self.k1(n1), self.v1(n1), bias_self))
        n2 = self.norm2(y)
        y = y + self.o2(self.attn(self.q2(n2), self.k2(ctx), self.v2(ctx), bias_cross))
        z = self.ff_proj(self.norm3(y))
        a, g = z.chunk(2, -1)
        y = y + self.ff_out(a * TF.gelu(g))
        y = self.proj_out(y)
        return res + y.reshape(b, hh, ww, c).permute(0, 3, 1, 2)


class TorchResnet(nn.Module):
    def __init__(self, cin, cout, temb, groups):
        super().__init__()
        self.norm1 = nn.GroupNorm(groups, cin, eps=1e-5)
        self.conv1 = nn.Conv2d(cin, cout, 3, padding=1)
        self.time_emb_proj = nn.Linear(temb, cout)
        self.norm2 = nn.GroupNorm(groups, cout, eps=1e-5)
        self.conv2 = nn.Conv2d(cout, cout, 3, padding=1)
        self.shortcut = nn.Conv2d(cin, cout, 1) if cin != cout else None

    def forward(self, x, emb):
        h = self.conv1(TF.silu(self.norm1(x)))
        h = h + self.time_emb_proj(TF.silu(emb))[:, :, None, None]
        h = self.conv2(TF.silu(self.norm2(h)))
        sc = self.shortcut(x) if self.shortcut is not None else x
        return sc + h


def _t2j_linear(m):
    p = {"kernel": jnp.asarray(m.weight.detach().numpy().T)}
    if m.bias is not None:
        p["bias"] = jnp.asarray(m.bias.detach().numpy())
    return p


def _t2j_conv(m):
    return {"kernel": jnp.asarray(m.weight.detach().numpy().transpose(2, 3, 1, 0)),
            "bias": jnp.asarray(m.bias.detach().numpy())}


def _t2j_norm(m):
    return {"scale": jnp.asarray(m.weight.detach().numpy()),
            "bias": jnp.asarray(m.bias.detach().numpy())}


# ------------------------------------------------------------------- tests

def test_transformer_block_wiring(rng):
    torch.manual_seed(0)
    c, heads, ctx_dim, groups = 32, 4, 48, 8
    tb = TorchTransformerBlock(c, heads, ctx_dim, groups).eval()

    params = {
        "norm": _t2j_norm(tb.norm),
        "proj_in": _t2j_linear(tb.proj_in),
        "transformer_blocks": {"0": {
            "norm1": _t2j_norm(tb.norm1),
            "attn1": {"to_q": _t2j_linear(tb.q1), "to_k": _t2j_linear(tb.k1),
                      "to_v": _t2j_linear(tb.v1), "to_out": {"0": _t2j_linear(tb.o1)}},
            "norm2": _t2j_norm(tb.norm2),
            "attn2": {"to_q": _t2j_linear(tb.q2), "to_k": _t2j_linear(tb.k2),
                      "to_v": _t2j_linear(tb.v2), "to_out": {"0": _t2j_linear(tb.o2)}},
            "norm3": _t2j_norm(tb.norm3),
            "ff": {"net": {"0": {"proj": _t2j_linear(tb.ff_proj)},
                           "2": _t2j_linear(tb.ff_out)}},
        }},
        "proj_out": _t2j_linear(tb.proj_out),
    }

    cfg = UNetConfig.tiny()
    b, hh, ww = 2, 8, 8
    x = rng.standard_normal((b, hh, ww, c), dtype=np.float32)
    ctx = rng.standard_normal((b, hh * ww, ctx_dim), dtype=np.float32)
    mask = (rng.uniform(0, 1, (b, hh * ww)) < 0.5).astype(np.float32)
    bias_self = (1.0 - mask) * -10000.0
    bias_cross = bias_self  # ctx length == hw here

    ours = junet._transformer(params, jnp.asarray(x), jnp.asarray(ctx),
                              heads=heads, bias_self=jnp.asarray(bias_self),
                              bias_cross=jnp.asarray(bias_cross), cfg=cfg,
                              policy=FP32, attn_impl="xla")
    with torch.no_grad():
        ref = tb(torch.from_numpy(x).permute(0, 3, 1, 2),
                 torch.from_numpy(ctx),
                 torch.from_numpy(bias_self), torch.from_numpy(bias_cross))
    np.testing.assert_allclose(np.asarray(ours),
                               ref.permute(0, 2, 3, 1).numpy(),
                               atol=5e-5, rtol=1e-4)


def test_resnet_block_wiring(rng):
    torch.manual_seed(1)
    cin, cout, temb, groups = 24, 32, 64, 8
    tr = TorchResnet(cin, cout, temb, groups).eval()
    params = {
        "norm1": _t2j_norm(tr.norm1), "conv1": _t2j_conv(tr.conv1),
        "time_emb_proj": _t2j_linear(tr.time_emb_proj),
        "norm2": _t2j_norm(tr.norm2), "conv2": _t2j_conv(tr.conv2),
        "conv_shortcut": _t2j_conv(tr.shortcut),
    }
    cfg = UNetConfig.tiny()
    x = rng.standard_normal((2, 8, 8, cin), dtype=np.float32)
    emb = rng.standard_normal((2, temb), dtype=np.float32)
    ours = junet._resnet(params, jnp.asarray(x), jnp.asarray(emb), cfg, FP32)
    with torch.no_grad():
        ref = tr(torch.from_numpy(x).permute(0, 3, 1, 2), torch.from_numpy(emb))
    np.testing.assert_allclose(np.asarray(ours),
                               ref.permute(0, 2, 3, 1).numpy(),
                               atol=5e-5, rtol=1e-4)


def test_vae_attention_block_wiring(rng):
    """VAE mid-block single-head attention with residual."""
    torch.manual_seed(2)
    c, groups = 16, 4
    gn = nn.GroupNorm(groups, c, eps=1e-6).eval()
    q = nn.Linear(c, c)
    k = nn.Linear(c, c)
    v = nn.Linear(c, c)
    o = nn.Linear(c, c)
    for m in (gn, q, k, v, o):
        for p in m.parameters():
            p.data.normal_(0, 0.5)
    params = {"group_norm": _t2j_norm(gn), "to_q": _t2j_linear(q),
              "to_k": _t2j_linear(k), "to_v": _t2j_linear(v),
              "to_out": {"0": _t2j_linear(o)}}
    cfg = VAEConfig.tiny()
    x = rng.standard_normal((1, 8, 8, c), dtype=np.float32)
    ours = jvae._attn(params, jnp.asarray(x), cfg, FP32, "xla")
    with torch.no_grad():
        xt = torch.from_numpy(x).permute(0, 3, 1, 2)
        y = gn(xt).permute(0, 2, 3, 1).reshape(1, 64, c)
        s = (q(y) @ k(y).transpose(-1, -2)) / np.sqrt(c)
        att = s.softmax(-1) @ v(y)
        ref = xt + o(att).reshape(1, 8, 8, c).permute(0, 3, 1, 2)
    np.testing.assert_allclose(np.asarray(ours),
                               ref.permute(0, 2, 3, 1).numpy(),
                               atol=5e-5, rtol=1e-4)


def test_unet_odd_spatial_sizes(rng):
    """640px-style path: odd latent sizes exercise the skip-size-matched
    nearest upsampling (reference handles via forward_upsample_size)."""
    from sdmatte_tpu.models import sdmatte
    from sdmatte_tpu.configs import SDMatteConfig
    import jax
    cfg = SDMatteConfig.tiny()
    params = sdmatte.init(cfg, seed=0)
    b, s = 1, 80   # latent 10 -> 5 -> 3 -> 2 (odd at two stages)
    data = {
        "image": jnp.asarray(rng.uniform(-1, 1, (b, s, s, 3)), jnp.float32),
        "trimap": jnp.asarray(rng.uniform(-1, 1, (b, s, s, 1)), jnp.float32),
        "trimap_coords": jnp.tile(jnp.asarray([[0.0, 0.0, 1.0, 1.0]]), (b, 1)),
        "is_trans": jnp.zeros((b,), jnp.float32),
    }
    alpha = jax.jit(lambda p, d: sdmatte.forward(p, cfg, d, attn_impl="xla"))(
        params, data)
    assert alpha.shape == (b, s, s, 1)
    assert np.isfinite(np.asarray(alpha)).all()
