"""Image resampling and normalization, TPU-first.

The reference preprocesses with torchvision ``Resize(antialias=True)`` +
``Normalize(0.5, 0.5)`` and builds its attention-mask pyramid with
``F.interpolate(mode="nearest")`` (reference sdmatte_nodes.py:204-214,
meta_arch.py:203, replace.py:62).  For the <=1e-2 MAE parity bound both
resamplers must match torch's index/weight math bit-for-bit in fp32.

TPU design: separable resampling is expressed as two small dense matmuls
(``A_h @ img @ A_w^T``) instead of gather loops — the resampling matrices are
built once per (in, out) shape pair at trace time with numpy (static shapes!)
and the work lands on the MXU, fusing with surrounding ops under jit.  Nearest
resize is a static gather.  No dynamic shapes anywhere.
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp


# --------------------------------------------------------------------------
# Resampling-matrix construction (host-side, cached, trace-time only)
# --------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _bilinear_aa_matrix(in_size: int, out_size: int, antialias: bool) -> np.ndarray:
    """Row-stochastic (out_size, in_size) matrix replicating torch's separable
    bilinear resampling (upsample_bilinear2d_aa semantics).

    With ``antialias`` and downscale, the triangle filter support widens to the
    scale factor; for upscale (or antialias=False) it reduces to standard
    align_corners=False bilinear.
    """
    A = np.zeros((out_size, in_size), dtype=np.float64)
    scale = in_size / out_size
    if antialias and scale > 1.0:
        support = scale  # triangle filter half-width stretched by scale
        invscale = 1.0 / scale
    else:
        support = 1.0
        invscale = 1.0

    if not antialias and scale > 1.0:
        # plain bilinear (two-tap) even when downscaling
        for i in range(out_size):
            center = scale * (i + 0.5) - 0.5
            x0 = int(np.floor(center))
            frac = center - x0
            j0 = min(max(x0, 0), in_size - 1)
            j1 = min(max(x0 + 1, 0), in_size - 1)
            A[i, j0] += 1.0 - frac
            A[i, j1] += frac
        return A.astype(np.float32)

    for i in range(out_size):
        center = scale * (i + 0.5)
        xmin = max(int(center - support + 0.5), 0)
        xmax = min(int(center + support + 0.5), in_size)
        if xmax <= xmin:  # degenerate: clamp to nearest valid tap
            xmin = min(max(int(center), 0), in_size - 1)
            xmax = xmin + 1
        js = np.arange(xmin, xmax)
        w = 1.0 - np.abs((js - center + 0.5) * invscale)
        w = np.clip(w, 0.0, None)
        total = w.sum()
        if total <= 0:
            w = np.ones_like(w) / len(w)
        else:
            w = w / total
        A[i, xmin:xmax] = w
    return A.astype(np.float32)


@functools.lru_cache(maxsize=None)
def _nearest_index(in_size: int, out_size: int) -> np.ndarray:
    """torch ``mode='nearest'`` source indices: floor(i * in/out), clamped."""
    scale = in_size / out_size
    idx = np.floor(np.arange(out_size) * scale).astype(np.int64)
    return np.clip(idx, 0, in_size - 1).astype(np.int32)


# --------------------------------------------------------------------------
# Public resize ops (NHWC activations)
# --------------------------------------------------------------------------

def resize_bilinear(x: jnp.ndarray, out_h: int, out_w: int, *,
                    antialias: bool = True) -> jnp.ndarray:
    """Bilinear resize of NHWC (or HWC / BHWC) images, torch-parity.

    Matches torchvision ``transforms.Resize((h, w), antialias=...)`` /
    ``F.interpolate(mode='bilinear', antialias=...)`` in fp32.  Runs as two
    MXU matmuls; fp32 internally, cast back to input dtype.
    """
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    b, h, w, c = x.shape
    orig_dtype = x.dtype
    if (h, w) == (out_h, out_w):
        return x[0] if squeeze else x
    xf = x.astype(jnp.float32)
    if h != out_h:
        Ah = jnp.asarray(_bilinear_aa_matrix(h, out_h, antialias))
        # (B,H,W,C) -> (B,out_h,W,C)
        xf = jnp.einsum("oh,bhwc->bowc", Ah, xf, precision="highest")
    if w != out_w:
        Aw = jnp.asarray(_bilinear_aa_matrix(w, out_w, antialias))
        xf = jnp.einsum("ow,bhwc->bhoc", Aw, xf, precision="highest")
    out = xf.astype(orig_dtype)
    return out[0] if squeeze else out


def resize_nearest(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Nearest-neighbor resize of NHWC images matching torch ``F.interpolate``
    (reference replace.py:62 mask pyramid, meta_arch.py:203 1/8 downsample)."""
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    b, h, w, c = x.shape
    if (h, w) != (out_h, out_w):
        ih = jnp.asarray(_nearest_index(h, out_h))
        iw = jnp.asarray(_nearest_index(w, out_w))
        x = x[:, ih][:, :, iw]
    return x[0] if squeeze else x


def normalize_pm1(x: jnp.ndarray) -> jnp.ndarray:
    """[0,1] -> [-1,1]; the reference's Normalize(mean=.5, std=.5)."""
    return x * 2.0 - 1.0


def denormalize_pm1(x: jnp.ndarray) -> jnp.ndarray:
    return (x + 1.0) * 0.5
