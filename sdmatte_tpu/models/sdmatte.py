"""SDMatte meta-architecture: one deterministic U-Net pass image+prompt -> alpha.

Functional mirror of the reference's ``SDMatte.forward`` (reference
meta_arch.py:127-261), with the quirks SURVEY.md §7 calls out preserved:

  * deterministic VAE encode (moments -> mean)            (meta_arch.py:144,211)
  * timestep=None; opacity (1 - is_trans) drives the time embedding
                                                          (meta_arch.py:237-248)
  * trimap prompts route through the bbox coord branch     (meta_arch.py:150,178-187)
  * attention mask = (aux+1)/2, nearest 1/8, flattened     (meta_arch.py:200-204)
  * alpha = channel-mean of decoded RGB, clip, [0,1] remap (meta_arch.py:258-261)

Fixed (consciously, per SURVEY.md §7): device placement is wherever jit puts
it (the reference hardcodes .cuda()), and the text tower is only computed when
a stage's gating actually consumes text tokens (the reference always computes
it and then discards it at every stage under the default [T,T,T] gating).

Everything here traces into a single XLA graph; inputs are NHWC jnp arrays.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from ..configs import SDMatteConfig, AUX_INPUT_COORDS
from ..core.dtypes import Policy, FP32
from ..core.embeddings import sinusoidal_embedding, point_coords_padding
from ..core.imaging import resize_nearest
from . import vae, unet, clip


def _coords_embed(cfg: SDMatteConfig, aux_type: str, coords: jnp.ndarray,
                  use_coor_input: bool) -> dict:
    """Coordinate conditioning (reference meta_arch.py:150-197)."""
    b = coords.shape[0]
    if AUX_INPUT_COORDS[aux_type] == "point_coords":
        n = coords.shape[1]
        padded, channels = point_coords_padding(n, cfg.unet.point_embeddings_input_dim)
        coor = jnp.pad(coords, ((0, 0), (0, padded - n)))
        if not use_coor_input:
            coor = jnp.zeros_like(coor)
        emb = sinusoidal_embedding(coor.reshape(-1), channels)
        return {"point_coords": emb.reshape(b, -1)}
    # bbox / mask / trimap / auto all take the bbox branch
    if not use_coor_input:
        coords = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0, 1.0]], jnp.float32), (b, 1))
    emb = sinusoidal_embedding(coords.reshape(-1), 320)
    return {"bbox_mask_coords": emb.reshape(b, -1)}


def _chunked(fn, x, chunk: Optional[int]):
    """Apply ``fn`` over the batch axis in ``chunk``-sized groups via lax.map:
    caps peak activation memory for the huge pixel-space VAE stages so large
    batches fit HBM (XLA compiles the body once).  When the batch doesn't
    divide the requested chunk, the largest divisor that still fits is used
    instead — silently running UNchunked would defeat the knob's only
    purpose (the user set it because the full batch OOMs)."""
    b = x.shape[0]
    if not chunk or b <= chunk:
        return fn(x)
    if b % chunk != 0:
        chunk = max(c for c in range(1, chunk + 1) if b % c == 0)
    import jax
    xs = x.reshape(b // chunk, chunk, *x.shape[1:])
    ys = jax.lax.map(fn, xs)
    return ys.reshape(b, *ys.shape[2:])


def forward(
    params,
    cfg: SDMatteConfig,
    data: dict,
    *,
    aux_input_type: Optional[str] = None,
    policy: Policy = FP32,
    attn_impl: str = "auto",
    vae_chunk: Optional[int] = None,
    vae_encode_split: Optional[bool] = None,
    speed_aux_half: bool = False,
    speed_rgb_half: bool = False,
    speed_decode_half: bool = False,
    return_intermediates: bool = False,
    remat: bool = False,
):
    """data keys (NHWC, all jnp):
      image        (B, S, S, 3) in [-1,1]
      <aux_type>   (B, S, S, 1) in [-1,1]  (trimap / point_mask / bbox_mask / mask)
      <aux>_coords (B, 4) or (B, N) for points
      is_trans     (B,)
      text_ids     (B, 77) int32 — optional, only read if a stage uses text
    Returns alpha (B, S, S, 1) in [0,1].
    """
    aux_type = aux_input_type or cfg.aux_input
    rgb = data["image"]
    b = rgb.shape[0]

    if not cfg.use_aux_input:
        # Reference parity: use_aux_input=False is equally dead upstream —
        # meta_arch.py:145-146 leaves aux_input_latent=None and :244 then
        # crashes in torch.cat.  The 8-ch conv_in (conv_scale=2) also only
        # exists because of the aux latent; supporting an aux-less forward
        # would be a different (4-ch) architecture, not this checkpoint's.
        # Fail loudly instead of with a confusing trace-time concat error.
        raise NotImplementedError(
            "use_aux_input=False has no working forward path (the reference "
            "crashes identically, meta_arch.py:145-146,244); SDMatte "
            "checkpoints require the aux latent")

    # OPT-IN out-of-parity speed-mode helpers (never default): encode an
    # input at S/2 (antialiased downsample) and bilinearly upsample its
    # latent 2x back to the full S/8 grid — ~3/4 of that encode pass saved.
    # Quality deltas per mode/checkpoint: benchmarks/ab_speed_modes.py.
    def _half(x):
        from ..core.imaging import resize_bilinear
        return resize_bilinear(x, x.shape[1] // 2, x.shape[2] // 2,
                               antialias=True).astype(x.dtype)

    def _to_latent_grid(lat):
        from ..core.imaging import resize_bilinear
        hl, wl = rgb.shape[1] // 8, rgb.shape[2] // 8
        if lat.shape[1] == hl and lat.shape[2] == wl:
            return lat
        return resize_bilinear(lat, hl, wl, antialias=False).astype(lat.dtype)

    # -- latents (deterministic encode) ------------------------------------
    # The reference encodes rgb and the aux mask in two separate VAE passes
    # (meta_arch.py:142-145, 209-212); numerically identical but cheaper on
    # TPU as ONE batched pass: concat on the batch axis -> bigger matmuls,
    # one kernel schedule, half the dispatches.
    aux_latent = None
    if cfg.use_aux_input:
        aux = data[aux_type]
        aux3 = jnp.repeat(aux, 3, axis=-1).astype(rgb.dtype)
        enc = lambda x: vae.encode(params["vae"], x, cfg.vae,  # noqa: E731
                                   policy=policy, attn_impl=attn_impl)
        # concat-vs-split encode: one batched pass is cheaper (bigger
        # matmuls, one schedule) but doubles the encoder's peak activation
        # residency — at 1024px the stage-0 buffer is bf16[2B,S,S,128] and
        # XLA keeps ~3 alive, which is what OOM'd every b>8 probe (three
        # 6 GB buffers at concat-batch 18, benchmarks/ab_wstore.py r4; the
        # batch dim also pads to a multiple of 8 in XLA's chosen layout, so
        # odd concat batches pay up to 1.3x on top).  Two sequential passes
        # halve the per-pass batch at identical math, unlocking b>8.
        split = vae_encode_split
        if split is None:
            split = 2 * b > 16
        # speed modes pick the encode resolution per input; when both inputs
        # share a resolution and split isn't forced, one concat-batch pass
        # keeps the parity-mode economics (bigger matmuls, one schedule)
        rgb_src = _half(rgb) if speed_rgb_half else rgb
        aux_src = _half(aux3) if speed_aux_half else aux3
        if rgb_src.shape[1] == aux_src.shape[1] and not split:
            lat = _chunked(enc, jnp.concatenate([rgb_src, aux_src], axis=0),
                           vae_chunk)
            rgb_latent, aux_latent = lat[:b], lat[b:]
        else:
            rgb_latent = _chunked(enc, rgb_src, vae_chunk)
            aux_latent = _chunked(enc, aux_src, vae_chunk)
        rgb_latent = _to_latent_grid(rgb_latent)
        aux_latent = _to_latent_grid(aux_latent)

    # -- coordinate conditioning ------------------------------------------
    coords = data[AUX_INPUT_COORDS[aux_type]]
    coords_embed = _coords_embed(cfg, aux_type, coords, cfg.use_coor_input)

    # -- attention mask: latent-resolution prompt mask --------------------
    latent_mask = None
    if aux_type in cfg.attn_mask_aux_input and (
            cfg.use_attention_mask or cfg.use_encoder_attention_mask):
        m = (data[aux_type] + 1.0) * 0.5
        s = rgb.shape[1]
        m = resize_nearest(m, s // 8, s // 8)
        latent_mask = m.reshape(b, -1)
    attention_mask = latent_mask if cfg.use_attention_mask else None

    # -- cross-attention contexts -----------------------------------------
    aux_tokens = None
    if cfg.use_encoder_hidden_states:
        aux_tokens = unet.aux_tokens(params["unet"], aux_latent, cfg.unet,
                                     policy=policy)
    text_tokens = None
    if not all(cfg.unet.use_encoder_hidden_states_list):
        text_tokens = clip.apply(params["text_encoder"], data["text_ids"],
                                 cfg.clip, policy=policy)

    # -- opacity conditioning (timestep stays None: single-pass, no noise) --
    trans = 1.0 - jnp.asarray(data["is_trans"], jnp.float32).reshape(-1)

    # optional ctx-token mask (reference meta_arch.py:41,59 stores the flag;
    # the U-Net consumes it per replace.py:405-407) — masks cross-attention
    # keys with the latent-resolution prompt mask over the aux tokens
    enc_mask = latent_mask if (
        cfg.use_encoder_attention_mask and latent_mask is not None
        and aux_tokens is not None) else None

    want_features = cfg.use_dis_loss or return_intermediates
    sample = jnp.concatenate([rgb_latent, aux_latent], axis=-1)
    unet_out = unet.apply(
        params["unet"], cfg.unet,
        sample=sample.astype(policy.compute_dtype),
        trans=trans,
        encoder_hidden_states=aux_tokens,
        encoder_hidden_states_2=text_tokens,
        coords_embed=coords_embed,
        attention_mask=attention_mask,
        encoder_attention_mask=enc_mask,
        timestep=None,
        policy=policy,
        attn_impl=attn_impl,
        return_features=want_features,
        remat=remat,
    )
    label_latent, feature_maps = unet_out if want_features else (unet_out, None)

    # -- decode + alpha head ----------------------------------------------
    z = label_latent.astype(policy.compute_dtype) / jnp.asarray(
        cfg.vae.scaling_factor, policy.compute_dtype)
    if speed_decode_half:
        # OPT-IN out-of-parity speed mode (never default): decode the alpha
        # latent at half resolution (~3/4 of decode FLOPs saved — decode is
        # the largest stage); the pipeline's resize-back upsamples the
        # smaller alpha to the original size exactly as it would the full
        # one.  Quality delta measured by benchmarks/ab_speed_modes.py.
        from ..core.imaging import resize_bilinear
        z = resize_bilinear(z, z.shape[1] // 2, z.shape[2] // 2,
                            antialias=False).astype(z.dtype)
    decoded = _chunked(
        lambda zz: vae.decode(params["vae"], zz, cfg.vae, policy=policy,
                              attn_impl=attn_impl),
        z, vae_chunk)
    alpha = jnp.mean(decoded.astype(jnp.float32), axis=-1, keepdims=True)
    alpha = jnp.clip(alpha, -1.0, 1.0)
    alpha = (alpha + 1.0) * 0.5
    if return_intermediates:
        # golden-activation hooks (SURVEY.md §4.2 module-parity strategy)
        return alpha, {
            "rgb_latent": rgb_latent,
            "aux_latent": aux_latent,
            "aux_tokens": aux_tokens,
            "unet_out": label_latent,
            "decoded": decoded,
            # per-stage distillation features (reference use_dis_loss path,
            # meta_arch.py:39 + replace.py:465,490,506,538)
            "feature_maps": feature_maps,
        }
    if cfg.use_dis_loss:
        return alpha, feature_maps
    return alpha


def init(cfg: SDMatteConfig, seed: int = 0):
    """Random-init full param tree (checkpoint-compatible shapes)."""
    return {
        "vae": vae.init(cfg.vae, seed),
        "unet": unet.init(cfg.unet, seed + 1),
        "text_encoder": clip.init(cfg.clip, seed + 2),
    }
