"""Alpha refinement + compositing, fully in-graph.

The reference does this on CPU with boolean indexing after pulling the alpha
back to host (reference sdmatte_nodes.py:362-397).  Here it is vectorized
``where`` math fused into the jit graph — zero extra host<->device traffic.

Constants preserved exactly (SURVEY.md §7 quirks): fg boost x1.2, unknown
kill threshold 0.3, matted_rgb gates trimap>0.2 & alpha>0.1.
"""

from __future__ import annotations

import jax.numpy as jnp

OUTPUT_MODES = ("alpha_only", "matted_rgba", "matted_rgb", "alpha_blend")
ALPHA_KILL_THRESHOLD = 0.3
FG_BOOST = 1.2


def mask_refine(alpha: jnp.ndarray, trimap: jnp.ndarray,
                trimap_constraint: float) -> jnp.ndarray:
    """Trimap-constrained refinement (reference sdmatte_nodes.py:365-380).

    alpha, trimap: (B, H, W) in [0,1] at the ORIGINAL image resolution
    (the reference refines against the un-resized trimap).
    """
    tc = jnp.float32(trimap_constraint)
    fg = trimap > tc
    bg = trimap < (1.0 - tc)
    unknown = jnp.logical_not(fg | bg)
    out = jnp.where(bg, 0.0, alpha)
    out = jnp.where(fg, jnp.clip(out * FG_BOOST, 0.0, 1.0), out)
    out = jnp.where(unknown & (out < ALPHA_KILL_THRESHOLD), 0.0, out)
    return out


def composite(image: jnp.ndarray, alpha: jnp.ndarray, trimap: jnp.ndarray,
              output_mode: str) -> jnp.ndarray:
    """Compositing modes (reference sdmatte_nodes.py:382-397).

    image (B, H, W, 3) in [0,1]; alpha, trimap (B, H, W).
    Returns the matted image: (B, H, W, 3) except matted_rgba -> (B, H, W, 4).
    """
    if output_mode not in OUTPUT_MODES:
        # the reference node's else-branch silently alpha-blends any other
        # string (sdmatte_nodes.py:396-397), but its UI dropdown makes a
        # typo impossible; a programmatic caller here deserves the error
        raise ValueError(
            f"unknown output_mode {output_mode!r}; expected one of "
            f"{OUTPUT_MODES}")
    a = alpha[..., None]
    if output_mode == "alpha_only":
        return jnp.zeros_like(image)
    if output_mode == "matted_rgba":
        return jnp.concatenate([image, a], axis=-1)
    if output_mode == "matted_rgb":
        fg = (trimap[..., None] > 0.2) & (a > 0.1)
        return image * fg.astype(image.dtype)
    # alpha_blend: straight alpha multiply (the reference's else branch)
    return image * a
