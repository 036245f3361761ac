"""Sinusoidal embeddings (diffusers ``get_timestep_embedding`` semantics).

Used for (reference file:line):
  * opacity-as-timestep conditioning   (meta_arch.py:237-248, replace.py:429-435)
  * bbox / trimap coordinate embedding (meta_arch.py:178-197)
  * point coordinate embedding         (meta_arch.py:152-176)

All math in fp32; shapes static under jit.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np


def sinusoidal_embedding(
    t: jnp.ndarray,
    dim: int,
    *,
    flip_sin_to_cos: bool = True,
    downscale_freq_shift: float = 0.0,
    scale: float = 1.0,
    max_period: float = 10000.0,
) -> jnp.ndarray:
    """(N,) -> (N, dim) sinusoidal embedding.

    Matches diffusers.get_timestep_embedding: the SDMatte checkpoint was
    trained with flip_sin_to_cos=True, downscale_freq_shift=0.
    """
    t = jnp.asarray(t, jnp.float32).reshape(-1)
    half = dim // 2
    # fp32 throughout — bit-parity with the torch reference formula
    exponent = -np.float32(math.log(max_period)) * np.arange(half, dtype=np.float32)
    exponent = exponent / np.float32(half - downscale_freq_shift)
    freqs = jnp.asarray(np.exp(exponent, dtype=np.float32))
    emb = t[:, None] * freqs[None, :]
    emb = scale * emb
    emb = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)
    if flip_sin_to_cos:
        emb = jnp.concatenate([emb[:, half:], emb[:, :half]], axis=-1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


def point_coords_padding(num_coords: int, total: int = 1680) -> tuple[int, int]:
    """Reproduce the reference's point-coordinate padding search
    (meta_arch.py:152-161): find the smallest padded length i >= N that divides
    ``total``; the embedding dim is then total // i.

    Returns (padded_len, embed_channels).  Pure host-side (static shapes).
    """
    for i in range(num_coords, total + 1):
        if total % i == 0:
            return i, total // i
    raise ValueError(f"no divisor of {total} >= {num_coords}")
