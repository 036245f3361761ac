"""Model/architecture configs.

One dataclass per component plus the SDMatte meta-config, parseable from the
diffusers/transformers JSON config set the reference downloads (its manifest:
reference sdmatte_nodes.py:20-31).  The reference hand-injects the
SDMatte-specific UNet keys at meta_arch.py:107-112; here they are first-class
fields with the same checkpoint-matched defaults.

Every config also has a ``tiny()`` constructor producing a scaled-down model
for fast CI (SURVEY.md §4.3 toy-checkpoint strategy).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Optional, Sequence


# ------------------------------------------------------------------- VAE ---

@dataclasses.dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 4
    block_out_channels: Sequence[int] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    norm_eps: float = 1e-6
    scaling_factor: float = 0.18215

    @classmethod
    def from_json(cls, path: str) -> "VAEConfig":
        with open(path) as f:
            d = json.load(f)
        return cls(
            in_channels=d.get("in_channels", 3),
            out_channels=d.get("out_channels", 3),
            latent_channels=d.get("latent_channels", 4),
            block_out_channels=tuple(d.get("block_out_channels", (128, 256, 512, 512))),
            layers_per_block=d.get("layers_per_block", 2),
            norm_num_groups=d.get("norm_num_groups", 32),
            scaling_factor=d.get("scaling_factor", 0.18215),
        )

    @classmethod
    def tiny(cls) -> "VAEConfig":
        return cls(block_out_channels=(8, 16, 16, 16), norm_num_groups=4,
                   layers_per_block=1)


# ------------------------------------------------------------------ UNet ---

@dataclasses.dataclass(frozen=True)
class UNetConfig:
    # SD2.1-base topology (reference replace.py:126-174 declares the same)
    in_channels: int = 8                # widened conv_in: rgb latent + aux latent
    out_channels: int = 4
    block_out_channels: Sequence[int] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    cross_attention_dim: int = 1024
    attention_head_dim: Sequence[int] = (5, 10, 20, 20)   # SD2.1: heads per stage
    use_linear_projection: bool = True
    norm_num_groups: int = 32
    norm_eps: float = 1e-5
    transformer_norm_eps: float = 1e-6
    flip_sin_to_cos: bool = True
    freq_shift: float = 0.0
    # which stages have cross-attn transformers (down0..3 / mid / up0..3)
    down_has_attn: Sequence[bool] = (True, True, True, False)
    up_has_attn: Sequence[bool] = (False, True, True, True)
    # SDMatte-specific heads (reference meta_arch.py:107-112 defaults)
    aux_in_channels: int = 4            # aux_conv_in input (aux latent)
    aux_token_dim: int = 1024           # aux_conv_in output = cross-attn dim
    point_embeddings_input_dim: int = 1680
    bbox_embeddings_input_dim: int = 1280
    bbox_time_embed_dim: int = 1280
    # per-stage gating [down, mid, up] (reference meta_arch.py:76-77)
    use_attention_mask_list: Sequence[bool] = (True, True, True)
    use_encoder_hidden_states_list: Sequence[bool] = (True, True, True)
    # residual connection inside Attention modules whose cross_attention_dim
    # is 320 — i.e. self-attention at the 320-channel stages (reference
    # utils.py:49-50 toggles module.residual_connection there; the node path
    # pins it False, meta_arch.py:46)
    residual_connection: bool = False

    @property
    def time_embed_dim(self) -> int:
        return self.block_out_channels[0] * 4

    @classmethod
    def from_json(cls, path: str, **overrides) -> "UNetConfig":
        with open(path) as f:
            d = json.load(f)
        head_dim = d.get("attention_head_dim", (5, 10, 20, 20))
        if isinstance(head_dim, int):
            head_dim = (head_dim,) * 4
        kw = dict(
            out_channels=d.get("out_channels", 4),
            block_out_channels=tuple(d.get("block_out_channels", (320, 640, 1280, 1280))),
            layers_per_block=d.get("layers_per_block", 2),
            cross_attention_dim=d.get("cross_attention_dim", 1024),
            attention_head_dim=tuple(head_dim),
            use_linear_projection=d.get("use_linear_projection", True),
            norm_num_groups=d.get("norm_num_groups", 32),
            point_embeddings_input_dim=d.get("point_embeddings_input_dim", 1680),
            bbox_embeddings_input_dim=d.get("bbox_embeddings_input_dim", 1280),
            bbox_time_embed_dim=d.get("bbox_time_embed_dim", 1280),
        )
        kw.update(overrides)
        return cls(**kw)

    @classmethod
    def tiny(cls) -> "UNetConfig":
        return cls(
            block_out_channels=(16, 24, 32, 32),
            layers_per_block=1,
            cross_attention_dim=32,
            attention_head_dim=(2, 2, 4, 4),
            norm_num_groups=8,
            aux_token_dim=32,
            point_embeddings_input_dim=1680,
            bbox_embeddings_input_dim=1280,
        )


# ------------------------------------------------------------------ CLIP ---

@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 1024
    num_layers: int = 23
    num_heads: int = 16
    intermediate_size: int = 4096
    max_position_embeddings: int = 77
    layer_norm_eps: float = 1e-5
    hidden_act: str = "gelu"            # SD2.1 (OpenCLIP-H) uses exact gelu
    eos_token_id: int = 49407

    @classmethod
    def from_json(cls, path: str) -> "CLIPTextConfig":
        with open(path) as f:
            d = json.load(f)
        return cls(
            vocab_size=d.get("vocab_size", 49408),
            hidden_size=d.get("hidden_size", 1024),
            num_layers=d.get("num_hidden_layers", 23),
            num_heads=d.get("num_attention_heads", 16),
            intermediate_size=d.get("intermediate_size", 4096),
            max_position_embeddings=d.get("max_position_embeddings", 77),
            hidden_act=d.get("hidden_act", "gelu"),
            eos_token_id=d.get("eos_token_id", 49407),
        )

    @classmethod
    def tiny(cls) -> "CLIPTextConfig":
        return cls(vocab_size=1000, hidden_size=32, num_layers=2, num_heads=4,
                   intermediate_size=64)


# -------------------------------------------------------------- scheduler ---

@dataclasses.dataclass(frozen=True)
class SchedulerConfig:
    """DDIM scheduler config — parsed for checkpoint/config-set compatibility
    only.  The reference loads a DDIMScheduler but never invokes it: the model
    is a single deterministic pass with add_noise=False (reference
    meta_arch.py:92,120-121; SURVEY.md §7 quirks)."""
    num_train_timesteps: int = 1000
    beta_start: float = 0.00085
    beta_end: float = 0.012
    beta_schedule: str = "scaled_linear"
    prediction_type: str = "epsilon"
    steps_offset: int = 1
    clip_sample: bool = False

    @classmethod
    def from_json(cls, path: str) -> "SchedulerConfig":
        with open(path) as f:
            d = json.load(f)
        fields = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in fields})


# --------------------------------------------------------------- SDMatte ---

@dataclasses.dataclass(frozen=True)
class SDMatteConfig:
    """Meta-arch flags; mirrors the SDMatte ctor kwargs the node pins
    (reference sdmatte_nodes.py:286-296, meta_arch.py:31-50)."""
    vae: VAEConfig = dataclasses.field(default_factory=VAEConfig)
    unet: UNetConfig = dataclasses.field(default_factory=UNetConfig)
    clip: CLIPTextConfig = dataclasses.field(default_factory=CLIPTextConfig)
    scheduler: SchedulerConfig = dataclasses.field(default_factory=SchedulerConfig)
    aux_input: str = "trimap"
    use_aux_input: bool = True
    use_coor_input: bool = True
    use_attention_mask: bool = True
    attn_mask_aux_input: Sequence[str] = ("point_mask", "bbox_mask", "mask", "trimap")
    aux_input_list: Sequence[str] = ("point_mask", "bbox_mask", "mask", "trimap")
    use_encoder_hidden_states: bool = True
    add_noise: bool = False
    # mask over the encoder (ctx) tokens, fed to the U-Net's
    # encoder_attention_mask input (reference meta_arch.py:41,59 stores the
    # flag; replace.py:405-407,482-527 consumes the mask; the reference's
    # forward never constructs one — here True masks cross-attention keys
    # with the latent-resolution prompt mask when ctx is the aux tokens)
    use_encoder_attention_mask: bool = False
    # capture per-stage U-Net feature maps (after down/mid/up) for the
    # distillation loss (reference meta_arch.py:39 use_dis_loss,
    # replace.py:465,490,506,538 feature_map hooks)
    use_dis_loss: bool = False

    @classmethod
    def from_pretrained_dir(cls, base_dir: str, **overrides) -> "SDMatteConfig":
        """Build from a diffusers-layout config dir (the SD2.1 config set the
        reference auto-downloads).  Tolerates the nested dir/dir layout
        (reference meta_arch.py:13-20)."""
        def resolve(sub, fname):
            direct = os.path.join(base_dir, sub, fname)
            nested = os.path.join(base_dir, sub, sub, fname)
            return direct if os.path.exists(direct) else nested
        sched_path = resolve("scheduler", "scheduler_config.json")
        sched = (SchedulerConfig.from_json(sched_path)
                 if os.path.exists(sched_path) else SchedulerConfig())
        return cls(
            vae=VAEConfig.from_json(resolve("vae", "config.json")),
            unet=UNetConfig.from_json(resolve("unet", "config.json")),
            clip=CLIPTextConfig.from_json(resolve("text_encoder", "config.json")),
            scheduler=sched,
            **overrides,
        )

    @classmethod
    def tiny(cls) -> "SDMatteConfig":
        u = UNetConfig.tiny()
        return cls(vae=VAEConfig.tiny(), unet=u, clip=CLIPTextConfig.tiny())


# aux-input type -> coordinate key (reference meta_arch.py:22-28)
AUX_INPUT_COORDS = {
    "auto_mask": "auto_coords",
    "point_mask": "point_coords",
    "bbox_mask": "bbox_coords",
    "mask": "mask_coords",
    "trimap": "trimap_coords",
}
