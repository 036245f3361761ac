"""CLIP text encoder (SD2.1's OpenCLIP-H text tower), pure-functional JAX.

Rebuilds the transformers ``CLIPTextModel`` the reference imports
(reference meta_arch.py:87,95-97,225-234).  Output is the final
layer-normed last_hidden_state, shape (B, 77, hidden) — exactly what
``text_encoder(input_ids)[0]`` returns.

Param tree mirrors torch keys under ``text_encoder.text_model.``.
Parity-tested against transformers' CLIPTextModel (tests/test_clip.py).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..configs import CLIPTextConfig
from ..core import nn as F
from ..core.dtypes import Policy, FP32


def _attn(p, x, cfg: CLIPTextConfig, causal_bias, policy: Policy):
    b, l, c = x.shape
    h = cfg.num_heads
    d = c // h

    def split(t):
        return t.reshape(b, l, h, d).transpose(0, 2, 1, 3)

    q = split(F.linear(p["q_proj"], x, policy))
    k = split(F.linear(p["k_proj"], x, policy))
    v = split(F.linear(p["v_proj"], x, policy))
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    s = s * jnp.float32(1.0 / np.sqrt(d)) + causal_bias
    w = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    o = jnp.einsum("bhqk,bhkd->bhqd", w, v, preferred_element_type=jnp.float32)
    o = o.astype(x.dtype).transpose(0, 2, 1, 3).reshape(b, l, c)
    return F.linear(p["out_proj"], o, policy).astype(x.dtype)


def _act(x, name: str):
    if name == "gelu":
        return F.gelu(x)
    if name == "quick_gelu":
        return x * jax.nn.sigmoid(1.702 * x)  # noqa: F821 (SD1.x path)
    raise ValueError(name)


def apply(params, input_ids, cfg: CLIPTextConfig, *, policy: Policy = FP32):
    """input_ids (B, L) int32 -> last_hidden_state (B, L, hidden)."""
    p = params["text_model"]
    b, l = input_ids.shape
    x = p["embeddings"]["token_embedding"]["embedding"][input_ids]
    x = x + p["embeddings"]["position_embedding"]["embedding"][:l][None]
    x = x.astype(policy.compute_dtype)

    # causal additive bias (fp32), same for all layers
    causal = jnp.triu(jnp.full((l, l), -3.4e38, jnp.float32), k=1)[None, None]

    for i in range(cfg.num_layers):
        lp = p["encoder"]["layers"][str(i)]
        r = x
        y = F.layer_norm(lp["layer_norm1"], x, eps=cfg.layer_norm_eps)
        x = r + _attn(lp["self_attn"], y, cfg, causal, policy).astype(x.dtype)
        r = x
        y = F.layer_norm(lp["layer_norm2"], x, eps=cfg.layer_norm_eps)
        y = F.linear(lp["mlp"]["fc1"], y, policy)
        y = _act(y, cfg.hidden_act)
        x = r + F.linear(lp["mlp"]["fc2"], y, policy).astype(x.dtype)

    return F.layer_norm(p["final_layer_norm"], x, eps=cfg.layer_norm_eps)


def init(cfg: CLIPTextConfig, seed: int = 0):
    from ..core.init import lin_p, norm_p

    rng = np.random.default_rng(seed)

    def lin(cin, cout, std=0.02):
        return lin_p(rng, cin, cout, std=std)

    norm = norm_p

    c = cfg.hidden_size
    layers = {}
    for i in range(cfg.num_layers):
        layers[str(i)] = {
            "self_attn": {"q_proj": lin(c, c), "k_proj": lin(c, c),
                          "v_proj": lin(c, c), "out_proj": lin(c, c)},
            "layer_norm1": norm(c),
            "mlp": {"fc1": lin(c, cfg.intermediate_size),
                    "fc2": lin(cfg.intermediate_size, c)},
            "layer_norm2": norm(c),
        }
    return {"text_model": {
        "embeddings": {
            "token_embedding": {"embedding": np.asarray(
                rng.standard_normal((cfg.vocab_size, c)).astype(np.float32) * 0.02)},
            "position_embedding": {"embedding": np.asarray(
                rng.standard_normal((cfg.max_position_embeddings, c)).astype(np.float32) * 0.02)},
        },
        "encoder": {"layers": layers},
        "final_layer_norm": norm(c),
    }}
