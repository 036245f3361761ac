"""SD2.1 VAE (AutoencoderKL equivalent), pure-functional JAX.

Rebuilds the external diffusers component the reference leans on for all
pixel<->latent transport (reference meta_arch.py:88,100,142-145,209-212,
254-256).  Encode is deterministic: moments -> mean only, no sampling
(meta_arch.py:144,211).

Param-tree structure mirrors the torch checkpoint key paths under the
``vae.`` prefix so checkpoint loading is mechanical (see checkpoint/loader).

TPU notes: activations NHWC; the mid-block single-head attention over
(S/8)^2 tokens (16,384 at 1024px) routes through ops.attention and hence the
Pallas flash kernel; norms compute fp32.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..configs import VAEConfig
from ..core import nn as F
from ..core.dtypes import Policy, FP32
from ..ops.attention import attention


# ----------------------------------------------------------------- blocks ---

def _resnet(p, x, cfg: VAEConfig, policy: Policy):
    # norm+silu+conv pairs run fused in the Pallas conv kernel on shapes
    # where it wins (core/nn.gn_silu_conv2d; norm apply, SiLU, and the
    # residual add never round-trip HBM there)
    h = F.gn_silu_conv2d(p["norm1"], p["conv1"], x,
                         groups=cfg.norm_num_groups, eps=cfg.norm_eps,
                         policy=policy)
    if "conv_shortcut" in p:
        res = F.conv2d(p["conv_shortcut"], x, padding=0, policy=policy)
    else:
        res = x
    return F.gn_silu_conv2d(p["norm2"], p["conv2"], h,
                            groups=cfg.norm_num_groups, eps=cfg.norm_eps,
                            policy=policy, residual=res)


def _attn(p, x, cfg: VAEConfig, policy: Policy, attn_impl: str):
    """Single-head spatial self-attention (diffusers VAE mid-block style)."""
    b, h, w, c = x.shape
    res = x
    y = F.group_norm(p["group_norm"], x, groups=cfg.norm_num_groups, eps=cfg.norm_eps)
    y = y.reshape(b, h * w, c)
    q = F.linear(p["to_q"], y, policy).astype(policy.compute_dtype)
    k = F.linear(p["to_k"], y, policy).astype(policy.compute_dtype)
    v = F.linear(p["to_v"], y, policy).astype(policy.compute_dtype)
    # one head of width c
    o = attention(q[:, None], k[:, None], v[:, None], scale=1.0 / np.sqrt(c),
                  policy=policy, impl=attn_impl)[:, 0]
    o = F.linear(p["to_out"]["0"], o, policy).astype(x.dtype)
    return res + o.reshape(b, h, w, c)


def _mid_block(p, x, cfg: VAEConfig, policy: Policy, attn_impl: str):
    x = _resnet(p["resnets"]["0"], x, cfg, policy)
    x = _attn(p["attentions"]["0"], x, cfg, policy, attn_impl)
    x = _resnet(p["resnets"]["1"], x, cfg, policy)
    return x


# ---------------------------------------------------------------- encoder ---

def encode_moments(params, x, cfg: VAEConfig, *, policy: Policy = FP32,
                   attn_impl: str = "auto"):
    """NHWC image in [-1,1] -> (mean, logvar) moments, each latent_channels."""
    p = params["encoder"]
    h = F.conv2d(p["conv_in"], x, policy=policy)
    n_blocks = len(cfg.block_out_channels)
    for i in range(n_blocks):
        blk = p["down_blocks"][str(i)]
        for j in range(cfg.layers_per_block):
            h = _resnet(blk["resnets"][str(j)], h, cfg, policy)
        if i < n_blocks - 1:
            # stride-2 conv with asymmetric (0,1)x(0,1) padding — diffusers
            # Downsample2D(pad=0) + F.pad semantics
            h = F.conv2d(blk["downsamplers"]["0"]["conv"], h, stride=2,
                         padding=((0, 1), (0, 1)), policy=policy)
    h = _mid_block(p["mid_block"], h, cfg, policy, attn_impl)
    h = F.group_norm(p["conv_norm_out"], h, groups=cfg.norm_num_groups, eps=cfg.norm_eps)
    h = F.silu(h)
    h = F.conv2d(p["conv_out"], h, policy=policy)
    moments = F.conv2d(params["quant_conv"], h, padding=0, policy=policy)
    mean, logvar = jnp.split(moments, 2, axis=-1)
    return mean, logvar


def encode(params, x, cfg: VAEConfig, *, policy: Policy = FP32,
           attn_impl: str = "auto"):
    """Deterministic latent: mean * scaling_factor (reference meta_arch.py:144)."""
    mean, _ = encode_moments(params, x, cfg, policy=policy, attn_impl=attn_impl)
    return mean * jnp.asarray(cfg.scaling_factor, mean.dtype)


# ---------------------------------------------------------------- decoder ---

def decode(params, z, cfg: VAEConfig, *, policy: Policy = FP32,
           attn_impl: str = "auto"):
    """Latent (already divided by scaling_factor) -> NHWC image in [-1,1]."""
    p = params["decoder"]
    h = F.conv2d(params["post_quant_conv"], z, padding=0, policy=policy)
    h = F.conv2d(p["conv_in"], h, policy=policy)
    h = _mid_block(p["mid_block"], h, cfg, policy, attn_impl)
    n_blocks = len(cfg.block_out_channels)
    for i in range(n_blocks):
        blk = p["up_blocks"][str(i)]
        for j in range(cfg.layers_per_block + 1):
            h = _resnet(blk["resnets"][str(j)], h, cfg, policy)
        if i < n_blocks - 1:
            # nearest 2x + conv (diffusers Upsample2D) — formulation picked
            # by the measured A/B (core/nn.py:upsample2x_conv)
            h = F.upsample2x_conv(blk["upsamplers"]["0"]["conv"], h,
                                  policy=policy)
    h = F.group_norm(p["conv_norm_out"], h, groups=cfg.norm_num_groups, eps=cfg.norm_eps)
    h = F.silu(h)
    return F.conv2d(p["conv_out"], h, policy=policy)


# ------------------------------------------------------------------- init ---
# shared leaf layouts: one definition across vae/unet/clip (core/init.py)
from ..core.init import conv_p as _conv_p      # noqa: E402
from ..core.init import lin_p as _lin_p        # noqa: E402
from ..core.init import norm_p as _norm_p      # noqa: E402


def _resnet_p(rng, cin, cout):
    p = {"norm1": _norm_p(cin), "conv1": _conv_p(rng, cin, cout),
         "norm2": _norm_p(cout), "conv2": _conv_p(rng, cout, cout)}
    if cin != cout:
        p["conv_shortcut"] = _conv_p(rng, cin, cout, k=1)
    return p


def _attn_p(rng, c):
    return {"group_norm": _norm_p(c), "to_q": _lin_p(rng, c, c),
            "to_k": _lin_p(rng, c, c), "to_v": _lin_p(rng, c, c),
            "to_out": {"0": _lin_p(rng, c, c)}}


def _mid_p(rng, c):
    return {"resnets": {"0": _resnet_p(rng, c, c), "1": _resnet_p(rng, c, c)},
            "attentions": {"0": _attn_p(rng, c)}}


def init(cfg: VAEConfig, seed: int = 0):
    """Random-init param tree with checkpoint-compatible shapes."""
    rng = np.random.default_rng(seed)
    ch = list(cfg.block_out_channels)
    lat = cfg.latent_channels

    enc_down = {}
    cin = ch[0]
    for i, cout in enumerate(ch):
        blk = {"resnets": {}}
        for j in range(cfg.layers_per_block):
            blk["resnets"][str(j)] = _resnet_p(rng, cin if j == 0 else cout, cout)
        if i < len(ch) - 1:
            blk["downsamplers"] = {"0": {"conv": _conv_p(rng, cout, cout)}}
        enc_down[str(i)] = blk
        cin = cout
    encoder = {
        "conv_in": _conv_p(rng, cfg.in_channels, ch[0]),
        "down_blocks": enc_down,
        "mid_block": _mid_p(rng, ch[-1]),
        "conv_norm_out": _norm_p(ch[-1]),
        "conv_out": _conv_p(rng, ch[-1], 2 * lat),
    }

    rev = list(reversed(ch))
    dec_up = {}
    cin = rev[0]
    for i, cout in enumerate(rev):
        blk = {"resnets": {}}
        for j in range(cfg.layers_per_block + 1):
            blk["resnets"][str(j)] = _resnet_p(rng, cin if j == 0 else cout, cout)
        if i < len(rev) - 1:
            blk["upsamplers"] = {"0": {"conv": _conv_p(rng, cout, cout)}}
        dec_up[str(i)] = blk
        cin = cout
    decoder = {
        "conv_in": _conv_p(rng, lat, rev[0]),
        "mid_block": _mid_p(rng, rev[0]),
        "up_blocks": dec_up,
        "conv_norm_out": _norm_p(rev[-1]),
        "conv_out": _conv_p(rng, rev[-1], cfg.out_channels),
    }

    return {
        "encoder": encoder,
        "decoder": decoder,
        "quant_conv": _conv_p(rng, 2 * lat, 2 * lat, k=1),
        "post_quant_conv": _conv_p(rng, lat, lat, k=1),
    }
