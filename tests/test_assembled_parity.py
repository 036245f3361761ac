"""FULL-MODEL assembled cross-check vs an independent torch implementation.

Block-level wiring is covered by test_block_parity; this file verifies the
ASSEMBLY — the places a real-weight run would be the only other way to catch
(VERDICT round 2, missing item 2):

  * skip-stack push/pop ordering across down/up paths
    (reference src/utils/replace.py:462-538)
  * per-stage mask / context gating ([down, mid, up] lists,
    replace.py:367-377,413-416)
  * the mask bias pyramid applied to SELF-attention only, nearest-resized
    per resolution (replace.py:56-63), encoder mask to cross-attention
    (replace.py:405-407)
  * upsample-size forwarding to odd skip sizes (replace.py:515-516)
  * conditioning plumbing: opacity-as-timestep, bbox vs point coordinate
    branches, aux-token projection (meta_arch.py:127-261)

Method: a from-scratch FUNCTIONAL torch implementation of the whole model
(below) consumes the torch-layout state dict exported from our param tree
(checkpoint/toy.tree_to_torch_state_dict — itself round-trip tested) and is
written directly from the reference call-stack semantics, NOT from our JAX
code.  fp32, tiny configs; agreement asserted at MAE <= 1e-4 end-to-end.
The text-tower variant embeds the real ``transformers`` CLIPTextModel in
the torch model, so that path is independent down to the library.
"""

import dataclasses

import numpy as np
import pytest
import torch
import torch.nn.functional as TF

import jax
import jax.numpy as jnp

from sdmatte_tpu.configs import (AUX_INPUT_COORDS, CLIPTextConfig,
                                 SDMatteConfig, UNetConfig, VAEConfig)
from sdmatte_tpu.checkpoint.toy import tree_to_torch_state_dict
from sdmatte_tpu.core.embeddings import point_coords_padding
from sdmatte_tpu.models import sdmatte


# ============================ torch reference implementation ================
# Functional: every op reads the flat torch-layout state dict by key (the
# same key paths a diffusers/reference state_dict would use).

def _T(sd, key):
    return torch.from_numpy(np.asarray(sd[key], np.float32))


def t_conv(sd, p, x, stride=1, padding=1):
    return TF.conv2d(x, _T(sd, p + ".weight"), _T(sd, p + ".bias"),
                     stride=stride, padding=padding)


def t_lin(sd, p, x):
    b = _T(sd, p + ".bias") if (p + ".bias") in sd else None
    return TF.linear(x, _T(sd, p + ".weight"), b)


def t_gn(sd, p, x, groups, eps):
    return TF.group_norm(x, groups, _T(sd, p + ".weight"),
                         _T(sd, p + ".bias"), eps)


def t_ln(sd, p, x):
    return TF.layer_norm(x, (x.shape[-1],), _T(sd, p + ".weight"),
                         _T(sd, p + ".bias"), 1e-5)


def t_sinusoid(t, dim):
    """diffusers get_timestep_embedding, flip_sin_to_cos=True, shift=0."""
    half = dim // 2
    freqs = torch.exp(-np.log(10000.0) * torch.arange(half, dtype=torch.float32) / half)
    emb = t.float().reshape(-1)[:, None] * freqs[None, :]
    return torch.cat([torch.cos(emb), torch.sin(emb)], dim=-1)


def t_time_mlp(sd, p, x):
    return t_lin(sd, p + ".linear_2", TF.silu(t_lin(sd, p + ".linear_1", x)))


# ------------------------------- VAE ---------------------------------------

def t_vae_resnet(sd, p, x, groups, eps=1e-6):
    h = t_conv(sd, p + ".conv1", TF.silu(t_gn(sd, p + ".norm1", x, groups, eps)))
    h = t_conv(sd, p + ".conv2", TF.silu(t_gn(sd, p + ".norm2", h, groups, eps)))
    if (p + ".conv_shortcut.weight") in sd:
        x = t_conv(sd, p + ".conv_shortcut", x, padding=0)
    return x + h


def t_vae_attn(sd, p, x, groups, eps=1e-6):
    b, c, hh, ww = x.shape
    y = t_gn(sd, p + ".group_norm", x, groups, eps)
    y = y.permute(0, 2, 3, 1).reshape(b, hh * ww, c)
    q, k, v = (t_lin(sd, p + s, y) for s in (".to_q", ".to_k", ".to_v"))
    att = ((q @ k.transpose(-1, -2)) / np.sqrt(c)).softmax(-1) @ v
    o = t_lin(sd, p + ".to_out.0", att)
    return x + o.reshape(b, hh, ww, c).permute(0, 3, 1, 2)


def t_vae_mid(sd, p, x, groups):
    x = t_vae_resnet(sd, p + ".resnets.0", x, groups)
    x = t_vae_attn(sd, p + ".attentions.0", x, groups)
    return t_vae_resnet(sd, p + ".resnets.1", x, groups)


def t_vae_encode(sd, cfg: VAEConfig, x):
    """Deterministic: moments -> mean * scaling (ref meta_arch.py:142-147)."""
    g = cfg.norm_num_groups
    h = t_conv(sd, "vae.encoder.conv_in", x)
    n = len(cfg.block_out_channels)
    for i in range(n):
        p = f"vae.encoder.down_blocks.{i}"
        for j in range(cfg.layers_per_block):
            h = t_vae_resnet(sd, f"{p}.resnets.{j}", h, g)
        if i < n - 1:  # diffusers Downsample2D(pad=0): asymmetric (0,1),(0,1)
            h = t_conv(sd, f"{p}.downsamplers.0.conv", TF.pad(h, (0, 1, 0, 1)),
                       stride=2, padding=0)
    h = t_vae_mid(sd, "vae.encoder.mid_block", h, g)
    h = TF.silu(t_gn(sd, "vae.encoder.conv_norm_out", h, g, 1e-6))
    h = t_conv(sd, "vae.encoder.conv_out", h)
    moments = t_conv(sd, "vae.quant_conv", h, padding=0)
    mean = moments.chunk(2, dim=1)[0]
    return mean * cfg.scaling_factor


def t_vae_decode(sd, cfg: VAEConfig, z):
    g = cfg.norm_num_groups
    h = t_conv(sd, "vae.post_quant_conv", z, padding=0)
    h = t_conv(sd, "vae.decoder.conv_in", h)
    h = t_vae_mid(sd, "vae.decoder.mid_block", h, g)
    n = len(cfg.block_out_channels)
    for i in range(n):
        p = f"vae.decoder.up_blocks.{i}"
        for j in range(cfg.layers_per_block + 1):
            h = t_vae_resnet(sd, f"{p}.resnets.{j}", h, g)
        if i < n - 1:
            h = TF.interpolate(h, scale_factor=2, mode="nearest")
            h = t_conv(sd, f"{p}.upsamplers.0.conv", h)
    h = TF.silu(t_gn(sd, "vae.decoder.conv_norm_out", h, g, 1e-6))
    return t_conv(sd, "vae.decoder.conv_out", h)


# ------------------------------- U-Net -------------------------------------

def t_attn(sd, p, x, ctx, heads, bias, residual):
    b, lq, c = x.shape
    d = c // heads
    q = t_lin(sd, p + ".to_q", x).view(b, lq, heads, d).transpose(1, 2)
    k = t_lin(sd, p + ".to_k", ctx).view(b, ctx.shape[1], heads, d).transpose(1, 2)
    v = t_lin(sd, p + ".to_v", ctx).view(b, ctx.shape[1], heads, d).transpose(1, 2)
    s = q @ k.transpose(-1, -2) / np.sqrt(d)
    if bias is not None:                    # per-key additive bias, pre-softmax
        s = s + bias[:, None, None, :]      # (ref replace.py:93-106 baddbmm beta=1)
    o = (s.softmax(-1) @ v).transpose(1, 2).reshape(b, lq, c)
    o = t_lin(sd, p + ".to_out.0", o)
    # diffusers Attention.residual_connection (ref utils.py:49-50)
    return o + x if residual else o


def t_transformer(sd, p, x, ctx, heads, bias_self, bias_cross, groups,
                  residual_attn1):
    b, c, hh, ww = x.shape
    res = x
    y = t_gn(sd, p + ".norm", x, groups, 1e-6)
    y = y.permute(0, 2, 3, 1).reshape(b, hh * ww, c)
    y = t_lin(sd, p + ".proj_in", y)
    tb = p + ".transformer_blocks.0"
    n1 = t_ln(sd, tb + ".norm1", y)
    y = y + t_attn(sd, tb + ".attn1", n1, n1, heads, bias_self, residual_attn1)
    y = y + t_attn(sd, tb + ".attn2", t_ln(sd, tb + ".norm2", y), ctx, heads,
                   bias_cross, False)
    z = t_lin(sd, tb + ".ff.net.0.proj", t_ln(sd, tb + ".norm3", y))
    a, gate = z.chunk(2, -1)
    y = y + t_lin(sd, tb + ".ff.net.2", a * TF.gelu(gate))
    y = t_lin(sd, p + ".proj_out", y)
    return res + y.reshape(b, hh, ww, c).permute(0, 3, 1, 2)


def t_unet_resnet(sd, p, x, emb, groups, eps=1e-5):
    h = t_conv(sd, p + ".conv1", TF.silu(t_gn(sd, p + ".norm1", x, groups, eps)))
    h = h + t_lin(sd, p + ".time_emb_proj", TF.silu(emb))[:, :, None, None]
    h = t_conv(sd, p + ".conv2", TF.silu(t_gn(sd, p + ".norm2", h, groups, eps)))
    if (p + ".conv_shortcut.weight") in sd:
        x = t_conv(sd, p + ".conv_shortcut", x, padding=0)
    return x + h


def t_unet(sd, cfg: UNetConfig, sample, trans, ehs, ehs2, coords_embed,
           attention_mask, enc_mask):
    """Reference CustomUNet.forward transcription (replace.py:379-549):
    opacity drives the time embedding (timestep=None), aug = bbox/point
    embedding, [down,mid,up] gating picks mask & context per stage, the
    spatial mask nearest-resizes to each attention resolution and biases
    self-attention only, skips push per layer + per downsample and pop in
    up order, upsample targets the next skip's spatial size."""
    ch = list(cfg.block_out_channels)
    g = cfg.norm_num_groups
    b, _, h0, w0 = sample.shape
    heads_l = list(cfg.attention_head_dim)
    n = len(ch)

    # conditioning: op_emb (+ aug); timestep stays None in the node path
    emb = t_time_mlp(sd, "unet.time_embedding", t_sinusoid(trans, ch[0]))
    if "point_coords" in coords_embed:
        emb = emb + t_time_mlp(sd, "unet.point_embedding",
                               coords_embed["point_coords"])
    else:
        emb = emb + t_time_mlp(sd, "unet.bbox_embedding",
                               coords_embed["bbox_mask_coords"])

    mask2d = None
    if attention_mask is not None:
        mask2d = attention_mask.reshape(b, 1, h0, w0)

    enc_bias = None if enc_mask is None else (1.0 - enc_mask) * -10000.0

    def stage_bias(stage, hh, ww, ctx):
        bias_self = None
        if cfg.use_attention_mask_list[stage] and mask2d is not None:
            m = TF.interpolate(mask2d, size=(hh, ww), mode="nearest")
            bias_self = (1.0 - m.reshape(b, hh * ww)) * -10000.0
        bias_cross = None
        if enc_bias is not None and ctx is not None \
                and enc_bias.shape[1] == ctx.shape[1]:
            bias_cross = enc_bias
        return bias_self, bias_cross

    def ctx_for(stage):
        return ehs if cfg.use_encoder_hidden_states_list[stage] else ehs2

    x = t_conv(sd, "unet.conv_in", sample)
    skips = [x]
    for i in range(n):
        p = f"unet.down_blocks.{i}"
        for j in range(cfg.layers_per_block):
            x = t_unet_resnet(sd, f"{p}.resnets.{j}", x, emb, g)
            if cfg.down_has_attn[i]:
                ctx = ctx_for(0)
                bs, bc = stage_bias(0, x.shape[2], x.shape[3], ctx)
                x = t_transformer(sd, f"{p}.attentions.{j}", x, ctx,
                                  heads_l[i], bs, bc, g,
                                  cfg.residual_connection and ch[i] == 320)
            skips.append(x)
        if i < n - 1:
            x = t_conv(sd, f"{p}.downsamplers.0.conv", x, stride=2)
            skips.append(x)

    p = "unet.mid_block"
    x = t_unet_resnet(sd, p + ".resnets.0", x, emb, g)
    ctx = ctx_for(1)
    bs, bc = stage_bias(1, x.shape[2], x.shape[3], ctx)
    x = t_transformer(sd, p + ".attentions.0", x, ctx, heads_l[-1], bs, bc, g,
                      cfg.residual_connection and ch[-1] == 320)
    x = t_unet_resnet(sd, p + ".resnets.1", x, emb, g)

    rev = list(reversed(ch))
    for i in range(n):
        p = f"unet.up_blocks.{i}"
        for j in range(cfg.layers_per_block + 1):
            skip = skips.pop()
            x = torch.cat([x, skip], dim=1)
            x = t_unet_resnet(sd, f"{p}.resnets.{j}", x, emb, g)
            if cfg.up_has_attn[i]:
                ctx = ctx_for(2)
                bs, bc = stage_bias(2, x.shape[2], x.shape[3], ctx)
                x = t_transformer(sd, f"{p}.attentions.{j}", x, ctx,
                                  heads_l[n - 1 - i], bs, bc, g,
                                  cfg.residual_connection and rev[i] == 320)
        if i < n - 1:
            # forward_upsample_size: match the NEXT skip's spatial size
            # (replace.py:515-516 — odd sizes break naive 2x)
            th, tw = skips[-1].shape[2], skips[-1].shape[3]
            x = TF.interpolate(x, size=(th, tw), mode="nearest")
            x = t_conv(sd, f"{p}.upsamplers.0.conv", x)

    x = TF.silu(t_gn(sd, "unet.conv_norm_out", x, g, 1e-5))
    return t_conv(sd, "unet.conv_out", x)


# ------------------------------ meta-arch ----------------------------------

def t_sdmatte_forward(sd, cfg: SDMatteConfig, data, text_model=None):
    """Reference SDMatte.forward transcription (meta_arch.py:127-261)."""
    aux_type = cfg.aux_input
    rgb = torch.from_numpy(data["image"]).permute(0, 3, 1, 2)
    aux = torch.from_numpy(data[aux_type]).permute(0, 3, 1, 2)
    b, _, s, _ = rgb.shape

    rgb_latent = t_vae_encode(sd, cfg.vae, rgb)
    aux_latent = t_vae_encode(sd, cfg.vae, aux.repeat(1, 3, 1, 1))

    coords = torch.from_numpy(data[AUX_INPUT_COORDS[aux_type]])
    if AUX_INPUT_COORDS[aux_type] == "point_coords":
        padded, channels = point_coords_padding(
            coords.shape[1], cfg.unet.point_embeddings_input_dim)
        coor = TF.pad(coords, (0, padded - coords.shape[1]))
        ce = {"point_coords": t_sinusoid(coor.reshape(-1), channels).reshape(b, -1)}
    else:
        ce = {"bbox_mask_coords": t_sinusoid(coords.reshape(-1), 320).reshape(b, -1)}

    latent_mask = None
    if aux_type in cfg.attn_mask_aux_input and (
            cfg.use_attention_mask or cfg.use_encoder_attention_mask):
        m = (aux + 1.0) * 0.5
        m = TF.interpolate(m, size=(s // 8, s // 8), mode="nearest")
        latent_mask = m.reshape(b, -1)

    # aux tokens: aux_conv_in -> flatten -> (B, hw, C) (meta_arch.py:215-218)
    t = t_conv(sd, "unet.aux_conv_in", aux_latent)
    ehs = t.flatten(2).permute(0, 2, 1)

    ehs2 = None
    if not all(cfg.unet.use_encoder_hidden_states_list):
        ids = torch.from_numpy(data["text_ids"].astype(np.int64))
        with torch.no_grad():
            ehs2 = text_model(ids)[0].float()

    trans = 1.0 - torch.from_numpy(data["is_trans"]).float().reshape(-1)
    sample = torch.cat([rgb_latent, aux_latent], dim=1)
    out = t_unet(sd, cfg.unet, sample, trans, ehs, ehs2, ce,
                 latent_mask if cfg.use_attention_mask else None,
                 latent_mask if cfg.use_encoder_attention_mask else None)

    decoded = t_vae_decode(sd, cfg.vae, out / cfg.vae.scaling_factor)
    alpha = decoded.mean(dim=1, keepdim=True).clamp(-1, 1)
    return ((alpha + 1.0) * 0.5).permute(0, 2, 3, 1)


# ================================ harness ===================================

def _randomized_params(cfg, seed=0):
    """init() weights are tiny (std .02) and biases zero — inflate to get
    O(1) activations everywhere so agreement is non-trivial."""
    params = sdmatte.init(cfg, seed=seed)
    rng = np.random.default_rng(seed + 100)

    def bump(x):
        x = np.asarray(x)
        if x.ndim == 0:
            return x
        if x.ndim == 1 and np.all(x == 1.0):      # norm scale
            return rng.uniform(0.7, 1.3, x.shape).astype(np.float32)
        if x.ndim == 1:                            # biases
            return rng.normal(0, 0.05, x.shape).astype(np.float32)
        fan_in = int(np.prod(x.shape[:-1])) if x.ndim > 1 else 1
        return rng.normal(0, 1.0 / np.sqrt(fan_in),
                          x.shape).astype(np.float32)

    return jax.tree_util.tree_map(bump, params)


def _make_data(cfg, rng, b=2, s=64, aux_type="trimap", n_points=4):
    data = {
        "image": rng.uniform(-1, 1, (b, s, s, 3)).astype(np.float32),
        aux_type: rng.choice([-1.0, 0.0, 1.0],
                             (b, s, s, 1)).astype(np.float32),
        "is_trans": np.array([0.0, 1.0] * (b // 2 + 1),
                             np.float32)[:b],
    }
    ckey = AUX_INPUT_COORDS[aux_type]
    if ckey == "point_coords":
        data[ckey] = rng.uniform(0, 1, (b, 2 * n_points)).astype(np.float32)
    else:
        data[ckey] = rng.uniform(0, 1, (b, 4)).astype(np.float32)
    return data


def _assert_parity(cfg, data, text_model=None, tol_mae=1e-4, tol_max=2e-3):
    params = _randomized_params(cfg)
    sd = tree_to_torch_state_dict(params)
    jdata = {k: jnp.asarray(v) for k, v in data.items()}
    ours = np.asarray(jax.jit(
        lambda p, d: sdmatte.forward(p, cfg, d, attn_impl="xla"))(
            params, jdata))
    with torch.no_grad():
        ref = t_sdmatte_forward(sd, cfg, data, text_model=text_model).numpy()
    mae = float(np.abs(ours - ref).mean())
    mx = float(np.abs(ours - ref).max())
    assert mae <= tol_mae and mx <= tol_max, (mae, mx)


# ================================= tests ====================================

def test_assembled_default_gating_with_mask(rng):
    """Default node config: [T,T,T] gating, mask on, trimap/bbox branch."""
    cfg = SDMatteConfig.tiny()
    _assert_parity(cfg, _make_data(cfg, rng, b=2, s=64))


def test_assembled_odd_spatial_size(rng):
    """s=80: latent 10 -> 5 -> 3 -> 2; exercises upsample-size forwarding."""
    cfg = SDMatteConfig.tiny()
    _assert_parity(cfg, _make_data(cfg, rng, b=1, s=80))


def test_assembled_mask_off(rng):
    cfg = dataclasses.replace(SDMatteConfig.tiny(), use_attention_mask=False)
    _assert_parity(cfg, _make_data(cfg, rng, b=2, s=64))


def test_assembled_point_branch(rng):
    """point_mask aux: point-coordinate padding + point_embedding head."""
    cfg = dataclasses.replace(SDMatteConfig.tiny(), aux_input="point_mask")
    _assert_parity(cfg, _make_data(cfg, rng, b=2, s=64,
                                   aux_type="point_mask"))


def test_assembled_encoder_attention_mask(rng):
    """ctx-token masking over the aux tokens (cross-attention bias)."""
    cfg = dataclasses.replace(SDMatteConfig.tiny(),
                              use_encoder_attention_mask=True)
    _assert_parity(cfg, _make_data(cfg, rng, b=2, s=64))


def test_assembled_mixed_gating_with_text(rng):
    """[T, F, T] gating: the mid stage consumes TEXT tokens — the torch side
    runs the real transformers CLIPTextModel loaded with our exported params,
    so the text path is independent down to the library."""
    transformers = pytest.importorskip("transformers")
    base = SDMatteConfig.tiny()
    unet_cfg = dataclasses.replace(
        base.unet, use_encoder_hidden_states_list=(True, False, True),
        use_attention_mask_list=(True, False, True))
    cfg = dataclasses.replace(base, unet=unet_cfg)
    params = _randomized_params(cfg)
    sd = tree_to_torch_state_dict(params)

    hf_cfg = transformers.CLIPTextConfig(
        vocab_size=cfg.clip.vocab_size, hidden_size=cfg.clip.hidden_size,
        num_hidden_layers=cfg.clip.num_layers,
        num_attention_heads=cfg.clip.num_heads,
        intermediate_size=cfg.clip.intermediate_size,
        max_position_embeddings=77, hidden_act="gelu")
    text_model = transformers.CLIPTextModel(hf_cfg).eval()
    text_sd = {k[len("text_encoder."):]: torch.from_numpy(
                   np.asarray(v, np.float32))
               for k, v in sd.items() if k.startswith("text_encoder.")}
    missing, unexpected = text_model.load_state_dict(text_sd, strict=False)
    assert not [m for m in missing if "position_ids" not in m], missing

    data = _make_data(cfg, rng, b=2, s=64)
    data["text_ids"] = np.array(
        [[1, 5, 9, 7] + [0] * 73, [2, 3, 4, 8, 6, 1, 9, 5] + [0] * 69],
        np.int32)
    jdata = {k: jnp.asarray(v) for k, v in data.items()}
    ours = np.asarray(jax.jit(
        lambda p, d: sdmatte.forward(p, cfg, d, attn_impl="xla"))(
            params, jdata))
    with torch.no_grad():
        ref = t_sdmatte_forward(sd, cfg, data, text_model=text_model).numpy()
    mae = float(np.abs(ours - ref).mean())
    assert mae <= 1e-4, mae


def test_assembled_residual_connection_320(rng):
    """residual_connection=True fires only on 320-channel attn1 modules
    (reference utils.py:49-50): use a config whose first stage IS 320ch."""
    base = SDMatteConfig.tiny()
    unet_cfg = dataclasses.replace(
        base.unet, block_out_channels=(320, 32, 32, 32),
        attention_head_dim=(5, 2, 4, 4), residual_connection=True)
    cfg = dataclasses.replace(base, unet=unet_cfg)
    _assert_parity(cfg, _make_data(cfg, rng, b=1, s=64))
