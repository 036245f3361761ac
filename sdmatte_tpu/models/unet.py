"""MatteUNet: SD2.1 U-Net re-designed with SDMatte conditioning built in.

The reference constructs a stock diffusers ``UNet2DConditionModel`` and then
performs network surgery: widened 8-ch conv_in (reference utils.py:13-30),
injected ``aux_conv_in`` (utils.py:33-41), monkeypatched attention mask/score
methods (replace.py:20-122), opacity-as-timestep + bbox/point embedding heads
(replace.py:188-200,419-459) and per-stage gating (replace.py:367-377,413-416).

Here the final architecture is simply *defined* (SURVEY.md §7): 8-ch conv_in,
aux token projection, embedding heads, per-stage gated cross-attention context
and a per-resolution additive per-key attention bias — no surgery, no
monkeypatching.  Param tree mirrors torch checkpoint keys under ``unet.``.

TPU notes: all attention via ops.attention (Pallas flash on long sequences);
the spatial mask pyramid is built once per forward with static-shape nearest
gathers; everything traces to a single XLA graph.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..configs import UNetConfig
from ..core import nn as F
from ..core.dtypes import Policy, FP32
from ..core.embeddings import sinusoidal_embedding
from ..core.imaging import resize_nearest
from ..ops.attention import attention

NEG_BIAS = -10000.0  # reference replace.py:402 mask bias magnitude


# ------------------------------------------------------------- sub-layers ---

def _time_mlp(p, x, policy: Policy):
    """diffusers TimestepEmbedding: linear -> silu -> linear."""
    h = F.linear(p["linear_1"], x, policy)
    h = F.silu(h)
    return F.linear(p["linear_2"], h, policy)


def _mha(p, x, ctx, *, heads: int, bias, policy: Policy, attn_impl: str,
         residual: bool = False):
    """Multi-head attention, q from x, k/v from ctx; per-key bias (B, Lk).

    ``residual`` mirrors diffusers ``Attention.residual_connection`` (the
    reference toggles it on cross_attention_dim==320 modules, utils.py:49-50):
    the module's own input is added back *inside* the attention module, on
    top of the transformer block's outer residual."""
    b, lq, c = x.shape
    d = c // heads
    q = F.linear(p["to_q"], x, policy).reshape(b, lq, heads, d).transpose(0, 2, 1, 3)
    k = F.linear(p["to_k"], ctx, policy).reshape(b, ctx.shape[1], heads, d).transpose(0, 2, 1, 3)
    v = F.linear(p["to_v"], ctx, policy).reshape(b, ctx.shape[1], heads, d).transpose(0, 2, 1, 3)
    o = attention(q.astype(policy.compute_dtype), k.astype(policy.compute_dtype),
                  v.astype(policy.compute_dtype), scale=1.0 / np.sqrt(d),
                  bias=bias, policy=policy, impl=attn_impl)
    o = o.transpose(0, 2, 1, 3).reshape(b, lq, c)
    out = F.linear(p["to_out"]["0"], o, policy)
    return out + x.astype(out.dtype) if residual else out


def _transformer(p, x, ctx, *, heads: int, bias_self, bias_cross,
                 cfg: UNetConfig, policy: Policy, attn_impl: str):
    """Transformer2DModel with use_linear_projection=True (SD2.1)."""
    b, h, w, c = x.shape
    res = x
    y = F.group_norm(p["norm"], x, groups=cfg.norm_num_groups,
                     eps=cfg.transformer_norm_eps)
    y = y.reshape(b, h * w, c)
    y = F.linear(p["proj_in"], y, policy).astype(x.dtype)
    tb = p["transformer_blocks"]["0"]
    # reference utils.py:49-50: residual_connection applies to Attention
    # modules with cross_attention_dim == 320 — the self-attention (attn1)
    # sites at the 320-channel stages (attn1's cross_attention_dim defaults
    # to its query dim; attn2's is the 1024 text/aux dim)
    res_attn1 = cfg.residual_connection and c == 320
    n1 = F.layer_norm(tb["norm1"], y)
    y = y + _mha(tb["attn1"], n1, n1, heads=heads, bias=bias_self,
                 policy=policy, attn_impl=attn_impl,
                 residual=res_attn1).astype(y.dtype)
    y = y + _mha(tb["attn2"], F.layer_norm(tb["norm2"], y), ctx,
                 heads=heads, bias=bias_cross, policy=policy, attn_impl=attn_impl).astype(y.dtype)
    z = F.layer_norm(tb["norm3"], y)
    z = F.geglu(tb["ff"]["net"]["0"]["proj"], z, policy)
    y = y + F.linear(tb["ff"]["net"]["2"], z, policy).astype(y.dtype)
    y = F.linear(p["proj_out"], y, policy).astype(x.dtype)
    return res + y.reshape(b, h, w, c)


def _resnet(p, x, emb, cfg: UNetConfig, policy: Policy):
    h = F.group_norm(p["norm1"], x, groups=cfg.norm_num_groups, eps=cfg.norm_eps)
    h = F.silu(h)
    h = F.conv2d(p["conv1"], h, policy=policy)
    t = F.linear(p["time_emb_proj"], F.silu(emb), policy).astype(h.dtype)
    h = h + t[:, None, None, :]
    h = F.group_norm(p["norm2"], h, groups=cfg.norm_num_groups, eps=cfg.norm_eps)
    h = F.silu(h)
    h = F.conv2d(p["conv2"], h, policy=policy)
    if "conv_shortcut" in p:
        x = F.conv2d(p["conv_shortcut"], x, padding=0, policy=policy)
    return x + h


# Rematerialized block variants for memory-bound training (jax.checkpoint):
# the backward pass recomputes each block's interior instead of keeping its
# activations live across the whole U-Net — the standard TPU trade of ~1/3
# more block FLOPs for O(depth) less activation HBM.  Selected per-call via
# ``apply(..., remat=True)``; inference paths never pay the wrapper.
_resnet_remat = jax.checkpoint(_resnet, static_argnums=(3, 4))


def _transformer_positional(p, x, ctx, bias_self, bias_cross, heads, cfg,
                            policy, attn_impl):
    return _transformer(p, x, ctx, heads=heads, bias_self=bias_self,
                        bias_cross=bias_cross, cfg=cfg, policy=policy,
                        attn_impl=attn_impl)


_transformer_remat = jax.checkpoint(_transformer_positional,
                                    static_argnums=(5, 6, 7, 8))


# ---------------------------------------------------------------- forward ---

def _stage_pick(use_list, true_val, false_val):
    """Per-stage [down, mid, up] gating (reference replace.py:367-377)."""
    return tuple(true_val if u else false_val for u in use_list)


class _BiasPyramid:
    """Lazily nearest-resizes the latent-resolution mask to each attention
    resolution, caching per (h, w).  Mirrors reference replace.py:56-63 but
    hoisted out of the per-layer hot path: each resolution is built once per
    forward and fused by XLA."""

    def __init__(self, mask, h0: int, w0: int):
        # mask: (B, L0) in [0,1] at latent resolution (h0, w0), or None
        self._grid = None if mask is None else mask.reshape(mask.shape[0], h0, w0, 1)
        self._cache = {}

    @staticmethod
    def _bias_of(m):
        return ((1.0 - m.astype(jnp.float32)) * NEG_BIAS)

    def at(self, h: int, w: int):
        if self._grid is None:
            return None
        if (h, w) not in self._cache:
            m = resize_nearest(self._grid, h, w)
            self._cache[(h, w)] = self._bias_of(m.reshape(m.shape[0], h * w))
        return self._cache[(h, w)]


def apply(
    params,
    cfg: UNetConfig,
    *,
    sample: jnp.ndarray,                 # (B, h, w, 8) rgb||aux latents, NHWC
    trans: Optional[jnp.ndarray],        # (B,) opacity class label (1 - is_trans)
    encoder_hidden_states,               # (B, L0, aux_token_dim) aux tokens
    encoder_hidden_states_2=None,        # (B, 77, cross_dim) text tokens
    coords_embed: Optional[dict] = None, # {"bbox_mask_coords": (B,1280)} or {"point_coords": (B,1680)}
    attention_mask=None,                 # (B, L0) raw mask values in [0,1]
    encoder_attention_mask=None,         # (B, L_ctx) raw mask over ctx tokens
    timestep=None,                       # optional (scalar/B,) — None in node path
    policy: Policy = FP32,
    attn_impl: str = "auto",
    return_features: bool = False,       # distillation hooks (replace.py:465,490,506,538)
    remat: bool = False,                 # jax.checkpoint each resnet/transformer block
):
    """Single U-Net pass (reference replace.py:379-549 semantics).

    With ``return_features`` (the reference's ``use_dis_loss`` path) returns
    ``(out, features)`` where features are the NHWC activations captured
    after the down path, after the mid block, and after the up path —
    mirroring the reference's ``self.feature_map`` side list."""
    b, h0, w0, _ = sample.shape
    ch = list(cfg.block_out_channels)

    # -- conditioning embeddings ------------------------------------------
    emb = None
    if timestep is not None:
        t = jnp.broadcast_to(jnp.asarray(timestep, jnp.float32).reshape(-1), (b,))
        t_emb = sinusoidal_embedding(t, ch[0], flip_sin_to_cos=cfg.flip_sin_to_cos,
                                     downscale_freq_shift=cfg.freq_shift)
        emb = _time_mlp(params["time_embedding"], t_emb.astype(policy.compute_dtype), policy)
    if trans is not None:
        tr = jnp.broadcast_to(jnp.asarray(trans, jnp.float32).reshape(-1), (b,))
        op = sinusoidal_embedding(tr, ch[0], flip_sin_to_cos=cfg.flip_sin_to_cos,
                                  downscale_freq_shift=cfg.freq_shift)
        op_emb = _time_mlp(params["time_embedding"], op.astype(policy.compute_dtype), policy)
        emb = op_emb if emb is None else emb + op_emb
    if emb is None:
        raise ValueError("need timestep and/or trans conditioning")

    if coords_embed:
        if "point_coords" in coords_embed:
            ce = coords_embed["point_coords"].reshape(b, -1)
            aug = _time_mlp(params["point_embedding"], ce.astype(policy.compute_dtype), policy)
        elif "bbox_mask_coords" in coords_embed:
            ce = coords_embed["bbox_mask_coords"].reshape(b, -1)
            aug = _time_mlp(params["bbox_embedding"], ce.astype(policy.compute_dtype), policy)
        else:
            raise ValueError("coords_embed must contain point_coords or bbox_mask_coords")
        emb = emb + aug
    emb = emb.astype(policy.compute_dtype)

    # -- per-stage gating --------------------------------------------------
    biases = _BiasPyramid(attention_mask, h0, w0)
    mask_on = _stage_pick(cfg.use_attention_mask_list, True, False)
    ctx_aux = _stage_pick(cfg.use_encoder_hidden_states_list,
                          encoder_hidden_states, encoder_hidden_states_2)

    # optional mask over encoder (ctx) tokens — reference replace.py:405-407
    enc_bias = None
    if encoder_attention_mask is not None:
        enc_bias = (1.0 - encoder_attention_mask.astype(jnp.float32)) * NEG_BIAS

    def stage_bias(stage_idx, hh, ww, ctx):
        """(bias_self, bias_cross) for a transformer at resolution (hh, ww).

        diffusers semantics (BasicTransformerBlock, diffusers>=0.25 per the
        reference's pin): ``attention_mask`` biases ONLY self-attention
        (attn1) — nearest-resized to each resolution by the reference's
        custom_prepare_attention_mask (replace.py:56-63); cross-attention
        (attn2) is biased ONLY by ``encoder_attention_mask`` (None in the
        reference node path).  Round 1 also applied the spatial mask to
        cross-attention keys — that was a parity bug, fixed here."""
        if not mask_on[stage_idx] or attention_mask is None:
            bias_self = None
        else:
            bias_self = biases.at(hh, ww)
        bias_cross = None
        if enc_bias is not None and ctx is not None \
                and enc_bias.shape[1] == ctx.shape[1]:
            bias_cross = enc_bias
        return bias_self, bias_cross

    heads = list(cfg.attention_head_dim)

    def resnet_f(p, x, emb):
        if remat:
            return _resnet_remat(p, x, emb, cfg, policy)
        return _resnet(p, x, emb, cfg, policy)

    def transformer_f(p, x, ctx, heads_i, bs, bc):
        if remat:
            return _transformer_remat(p, x, ctx, bs, bc, heads_i, cfg,
                                      policy, attn_impl)
        return _transformer(p, x, ctx, heads=heads_i, bias_self=bs,
                            bias_cross=bc, cfg=cfg, policy=policy,
                            attn_impl=attn_impl)

    # -- down path ---------------------------------------------------------
    x = F.conv2d(params["conv_in"], sample, policy=policy)
    skips = [x]
    n_blocks = len(ch)
    for i in range(n_blocks):
        blk = params["down_blocks"][str(i)]
        for j in range(cfg.layers_per_block):
            x = resnet_f(blk["resnets"][str(j)], x, emb)
            if cfg.down_has_attn[i]:
                bs, bc = stage_bias(0, x.shape[1], x.shape[2], ctx_aux[0])
                x = transformer_f(blk["attentions"][str(j)], x, ctx_aux[0],
                                  heads[i], bs, bc)
            skips.append(x)
        if i < n_blocks - 1:
            x = F.conv2d(blk["downsamplers"]["0"]["conv"], x, stride=2, policy=policy)
            skips.append(x)

    features = [x] if return_features else None   # after down (replace.py:490)

    # -- mid ---------------------------------------------------------------
    mid = params["mid_block"]
    x = resnet_f(mid["resnets"]["0"], x, emb)
    bs, bc = stage_bias(1, x.shape[1], x.shape[2], ctx_aux[1])
    x = transformer_f(mid["attentions"]["0"], x, ctx_aux[1], heads[-1], bs, bc)
    x = resnet_f(mid["resnets"]["1"], x, emb)
    if return_features:
        features.append(x)                        # after mid (replace.py:506)

    # -- up path -----------------------------------------------------------
    for i in range(n_blocks):
        blk = params["up_blocks"][str(i)]
        for j in range(cfg.layers_per_block + 1):
            skip = skips.pop()
            x = jnp.concatenate([x, skip], axis=-1)
            x = resnet_f(blk["resnets"][str(j)], x, emb)
            if cfg.up_has_attn[i]:
                bs, bc = stage_bias(2, x.shape[1], x.shape[2], ctx_aux[2])
                x = transformer_f(blk["attentions"][str(j)], x, ctx_aux[2],
                                  heads[n_blocks - 1 - i], bs, bc)
        if i < n_blocks - 1:
            # nearest 2x to the next skip's spatial size, then conv.  The
            # target is static at trace time; when it is exactly 2x the
            # cheap transposed-conv form applies (core/nn.py), otherwise
            # (odd upstream sizes, replace.py:515-516 size forwarding)
            # fall back to resize + conv.
            th, tw = (skips[-1].shape[1], skips[-1].shape[2]) if skips else \
                     (x.shape[1] * 2, x.shape[2] * 2)
            if (th, tw) == (x.shape[1] * 2, x.shape[2] * 2):
                x = F.upsample2x_conv(blk["upsamplers"]["0"]["conv"], x,
                                      policy=policy)
            else:
                x = resize_nearest(x, th, tw)
                x = F.conv2d(blk["upsamplers"]["0"]["conv"], x, policy=policy)

    if return_features:
        features.append(x)                        # after up (replace.py:538)

    # -- head --------------------------------------------------------------
    x = F.group_norm(params["conv_norm_out"], x, groups=cfg.norm_num_groups,
                     eps=cfg.norm_eps)
    x = F.silu(x)
    out = F.conv2d(params["conv_out"], x, policy=policy)
    return (out, features) if return_features else out


def aux_tokens(params, aux_latent, cfg: UNetConfig, *, policy: Policy = FP32):
    """aux latent (B, h, w, 4) -> cross-attention context (B, h*w, 1024) via
    aux_conv_in (reference meta_arch.py:215-218; conv + flatten + transpose
    fuse into one XLA op here; token order matches torch's CHW flatten)."""
    t = F.conv2d(params["aux_conv_in"], aux_latent, policy=policy)
    b, h, w, c = t.shape
    return t.reshape(b, h * w, c)


# ------------------------------------------------------------------- init ---
# shared leaf layouts: one definition across vae/unet/clip (core/init.py)
from ..core.init import conv_p as _conv_p      # noqa: E402
from ..core.init import lin_p as _lin_p        # noqa: E402
from ..core.init import norm_p as _norm_p      # noqa: E402


def _attn_p(rng, c, ctx_dim):
    return {"to_q": _lin_p(rng, c, c, bias=False),
            "to_k": _lin_p(rng, ctx_dim, c, bias=False),
            "to_v": _lin_p(rng, ctx_dim, c, bias=False),
            "to_out": {"0": _lin_p(rng, c, c)}}


def _transformer_p(rng, c, cfg: UNetConfig):
    ff_inner = 4 * c
    return {
        "norm": _norm_p(c),
        "proj_in": _lin_p(rng, c, c),
        "transformer_blocks": {"0": {
            "norm1": _norm_p(c),
            "attn1": _attn_p(rng, c, c),
            "norm2": _norm_p(c),
            "attn2": _attn_p(rng, c, cfg.cross_attention_dim),
            "norm3": _norm_p(c),
            "ff": {"net": {"0": {"proj": _lin_p(rng, c, 2 * ff_inner)},
                           "2": _lin_p(rng, ff_inner, c)}},
        }},
        "proj_out": _lin_p(rng, c, c),
    }


def _resnet_p(rng, cin, cout, temb_dim):
    p = {"norm1": _norm_p(cin), "conv1": _conv_p(rng, cin, cout),
         "time_emb_proj": _lin_p(rng, temb_dim, cout),
         "norm2": _norm_p(cout), "conv2": _conv_p(rng, cout, cout)}
    if cin != cout:
        p["conv_shortcut"] = _conv_p(rng, cin, cout, k=1)
    return p


def init(cfg: UNetConfig, seed: int = 0):
    rng = np.random.default_rng(seed)
    ch = list(cfg.block_out_channels)
    ted = cfg.time_embed_dim
    n_blocks = len(ch)

    params = {
        "conv_in": _conv_p(rng, cfg.in_channels, ch[0]),
        "aux_conv_in": _conv_p(rng, cfg.aux_in_channels, cfg.aux_token_dim),
        "time_embedding": {"linear_1": _lin_p(rng, ch[0], ted),
                           "linear_2": _lin_p(rng, ted, ted)},
        "point_embedding": {"linear_1": _lin_p(rng, cfg.point_embeddings_input_dim, ted),
                            "linear_2": _lin_p(rng, ted, ted)},
        "bbox_embedding": {"linear_1": _lin_p(rng, cfg.bbox_embeddings_input_dim, ted),
                           "linear_2": _lin_p(rng, ted, ted)},
        "conv_norm_out": _norm_p(ch[0]),
        "conv_out": _conv_p(rng, ch[0], cfg.out_channels),
    }

    # down path; track skip channels for the up path
    skip_ch = [ch[0]]
    down = {}
    cin = ch[0]
    for i, cout in enumerate(ch):
        blk = {"resnets": {}}
        if cfg.down_has_attn[i]:
            blk["attentions"] = {}
        for j in range(cfg.layers_per_block):
            blk["resnets"][str(j)] = _resnet_p(rng, cin if j == 0 else cout, cout, ted)
            if cfg.down_has_attn[i]:
                blk["attentions"][str(j)] = _transformer_p(rng, cout, cfg)
            skip_ch.append(cout)
        if i < n_blocks - 1:
            blk["downsamplers"] = {"0": {"conv": _conv_p(rng, cout, cout)}}
            skip_ch.append(cout)
        down[str(i)] = blk
        cin = cout
    params["down_blocks"] = down

    params["mid_block"] = {
        "resnets": {"0": _resnet_p(rng, ch[-1], ch[-1], ted),
                    "1": _resnet_p(rng, ch[-1], ch[-1], ted)},
        "attentions": {"0": _transformer_p(rng, ch[-1], cfg)},
    }

    rev = list(reversed(ch))
    up = {}
    prev = rev[0]
    for i, cout in enumerate(rev):
        blk = {"resnets": {}}
        if cfg.up_has_attn[i]:
            blk["attentions"] = {}
        for j in range(cfg.layers_per_block + 1):
            rin = (prev if j == 0 else cout) + skip_ch.pop()
            blk["resnets"][str(j)] = _resnet_p(rng, rin, cout, ted)
            if cfg.up_has_attn[i]:
                blk["attentions"][str(j)] = _transformer_p(rng, cout, cfg)
        if i < n_blocks - 1:
            blk["upsamplers"] = {"0": {"conv": _conv_p(rng, cout, cout)}}
        up[str(i)] = blk
        prev = cout
    params["up_blocks"] = up
    return params
