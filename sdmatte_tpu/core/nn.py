"""Functional neural-net primitives over explicit param pytrees.

Design: instead of a stateful module system, every layer is a pure function
``f(params, x, ...)`` over a nested-dict param tree whose structure mirrors the
torch checkpoint key paths (see checkpoint/loader.py).  This is the
TPU-idiomatic shape: pure functions + pytrees jit/pjit/grad cleanly, sharding
annotations attach directly to the tree, and checkpoint loading is a
mechanical relabeling instead of module surgery (the reference instead
monkeypatches live torch modules, src/utils/utils.py:13-56).

Layout conventions (converted once at checkpoint load):
  * activations NHWC (channels-last = TPU lane dimension)
  * conv kernels HWIO, linear kernels (in, out)
  * norm params named scale/bias
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from jax import lax

from .dtypes import Policy, FP32


def kernel_of(p, dtype):
    """The layer's kernel in ``dtype``, transparently dequantizing int8
    weight-STORAGE params (ops/quant.compress_tree_int8: ``kernel_i8`` +
    per-output-channel ``kernel_s``).  The dequant traces into the consuming
    graph, so the bf16 form is a temp that dies after its single use while
    the resident copy stays int8 — XLA fuses convert+scale into one
    elementwise pass."""
    if "kernel_i8" in p:
        w = p["kernel_i8"].astype(jnp.float32) * p["kernel_s"]
        return w.astype(dtype)
    return p["kernel"].astype(dtype)


def linear(p, x, policy: Policy = FP32):
    """Matmul in compute dtype with fp32 MXU accumulation; the result is cast
    back to the compute dtype so activations never persist at fp32 under a
    bf16 policy (HBM footprint + fusion)."""
    k = kernel_of(p, policy.compute_dtype)
    y = jnp.dot(policy.cast_compute(x), k, preferred_element_type=policy.accum_dtype)
    if "bias" in p:
        y = y + p["bias"].astype(policy.accum_dtype)
    return y.astype(policy.compute_dtype)


def conv2d(p, x, *, stride: int = 1, padding=1, policy: Policy = FP32):
    """3x3/1x1 conv, NHWC x HWIO.  ``padding`` is an int (symmetric) or an
    explicit ((top,bottom),(left,right)) pair — the VAE encoder's downsample
    uses asymmetric (0,1),(0,1) padding.

    3x3/stride-1/SAME shapes route to the Pallas implicit-GEMM kernel when
    the measured dispatch table (ops/dispatch.py) says it beats XLA on this
    exact shape; everything else takes XLA's native conv.  Param dicts that
    carry int8 fields (ops/quant.py:quantize_vae_tree) take the int8 path —
    an opt-in experimental mode that is currently SLOWER than bf16 through
    this XLA toolchain (measured 0.34x on encode, benchmarks/ab_int8.py;
    see the measurement note in ops/quant.py) despite the MXU's nominal
    2x int8 MAC rate."""
    if "kernel_q" in p:
        from ..ops.quant import conv2d_int8
        return conv2d_int8(x, p["kernel_q"], p["kernel_scale"],
                           p.get("bias"), stride=stride, padding=padding,
                           out_dtype=policy.compute_dtype)
    k = kernel_of(p, policy.compute_dtype)
    if isinstance(padding, int):
        pad = [(padding, padding), (padding, padding)]
    else:
        pad = [tuple(padding[0]), tuple(padding[1])]

    if (k.shape[0] == 3 and k.shape[1] == 3 and stride == 1
            and pad == [(1, 1), (1, 1)] and x.ndim == 4):
        from ..ops.dispatch import pallas_conv3x3_config
        b, h, w, _ = x.shape
        cfg = pallas_conv3x3_config(
            b, h, w, k.shape[2], k.shape[3],
            dtype_ok=policy.compute_dtype == jnp.bfloat16)
        if cfg is not None:
            bias = p["bias"] if "bias" in p else None
            return _dispatched_conv3x3(cfg, x, k, bias, policy=policy)

    y = lax.conv_general_dilated(
        policy.cast_compute(x), k,
        window_strides=(stride, stride),
        padding=pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=policy.accum_dtype,
    )
    if "bias" in p:
        y = y + p["bias"].astype(policy.accum_dtype)
    return y.astype(policy.compute_dtype)


def _dispatched_conv3x3(cfg, x, k, bias, *, policy: Policy, affine=None,
                        residual=None):
    """Shared Pallas-conv dispatch: one place that interprets a
    PALLAS_CONV_WINS entry (block config, gn/residual fusion flags,
    channel-split mode) for both conv2d and gn_silu_conv2d.

    The residual rides the kernel epilogue only where the table says its
    VMEM block fits (cfg[3]); otherwise it is added outside."""
    from ..ops.conv3x3 import conv3x3_same, conv3x3_same_csplit
    res = None
    if residual is not None and cfg[3]:
        res = policy.cast_compute(residual)
    xb = policy.cast_compute(x)
    kb = k.astype(policy.compute_dtype)
    common = dict(affine=affine, residual=res,
                  block_rows=cfg[0], cout_block=cfg[1])
    if cfg[4]:
        y = conv3x3_same_csplit(xb, kb, bias, fuse_sum=cfg[4] == 2, **common)
    else:
        y = conv3x3_same(xb, kb, bias, **common)
    if residual is not None and res is None:
        y = y + residual.astype(y.dtype)
    return y


# nearest-x2-upsample + conv3x3 as a stride-2 transposed conv.  Because
# nearest x2 duplicates pixels, the 3x3 window over the upsampled tensor
# touches at most 2x2 DISTINCT input pixels, so the op equals a transposed
# conv whose combined kernel taps are (per spatial dim, outer product in 2D)
#   K4 = [W0, W0+W1, W1+W2, W2]
# i.e. 16 MACs per input pixel instead of 36 (2.25x FLOP cut) and the 4x
# upsampled tensor (512 MB at 1024^2 x 256 bf16) is never materialized.
# Numeric equivalence is exact in fp32 (benchmarks/ab_upsample.py --check).
_UP_T4 = ((1.0, 0.0, 0.0), (1.0, 1.0, 0.0), (0.0, 1.0, 1.0), (0.0, 0.0, 1.0))
_UP_S = (((1.0, 0.0, 0.0), (0.0, 1.0, 1.0)),    # parity 0: taps (p-1, p)
         ((1.0, 1.0, 0.0), (0.0, 0.0, 1.0)))    # parity 1: taps (p, p+1)

# Flipped to the measured winner after the on-TPU interleaved A/B
# (benchmarks/ab_upsample.py); "base" preserves the repeat+conv form.
# SDMATTE_UPSAMPLE2X overrides for pipeline-level A/B without code edits
# (same escape-hatch pattern as SDMATTE_NO_PALLAS_CONV in ops/dispatch.py).
UPSAMPLE2X_MODE = os.environ.get("SDMATTE_UPSAMPLE2X", "base")


def upsample2x_conv(p, x, *, policy: Policy = FP32, mode: str | None = None):
    """diffusers ``Upsample2D`` (nearest x2 -> conv3x3 pad 1; the reference's
    decoder/U-Net upsamplers, built via diffusers get_up_block in
    /root/reference/src/utils/replace.py).  ``mode`` selects the algebraic
    formulation — all produce identical values:

      base     jnp.repeat x2 + conv3x3 (routes through the normal conv2d
               dispatch, so Pallas table entries still apply)
      dilated  one lax lhs-dilated conv with the combined 4x4 kernel
      poly1    one 2x2-valid conv to 4*C channels + parity interleave
               (16 MACs/px as one big GEMM, explicit relayout at the end)
    """
    mode = mode or UPSAMPLE2X_MODE
    if mode == "base":
        u = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        return conv2d(p, u, policy=policy)
    w = kernel_of(p, jnp.float32)
    t4 = jnp.asarray(_UP_T4, jnp.float32)
    xc = policy.cast_compute(x)
    if mode == "dilated":
        k4 = jnp.einsum("ai,bj,ijco->abco", t4, t4, w)
        y = lax.conv_general_dilated(
            xc, k4.astype(policy.compute_dtype), (1, 1), [(2, 2), (2, 2)],
            lhs_dilation=(2, 2), dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=policy.accum_dtype)
    elif mode == "poly1":
        s = [jnp.asarray(m, jnp.float32) for m in _UP_S]
        k = jnp.concatenate(
            [jnp.einsum("ui,vj,ijco->uvco", s[a], s[b], w)
             for a in (0, 1) for b in (0, 1)], axis=-1)    # (2,2,ci,4co)
        n, h, wd, _ = x.shape
        co = w.shape[-1]
        yf = lax.conv_general_dilated(
            xc, k.astype(policy.compute_dtype), (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=policy.accum_dtype)     # (n,h+1,w+1,4co)
        ys = [yf[:, a:a + h, b:b + wd, i * co:(i + 1) * co]
              for i, (a, b) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1)))]
        t = jnp.stack(ys).reshape(2, 2, n, h, wd, co)
        y = t.transpose(2, 3, 0, 4, 1, 5).reshape(n, 2 * h, 2 * wd, co)
    else:
        raise ValueError(f"unknown upsample2x mode {mode!r}")
    if "bias" in p:
        y = y + p["bias"].astype(y.dtype)
    return y.astype(policy.compute_dtype)


def group_norm_stats(p, x, *, groups: int = 32, eps: float = 1e-5):
    """Per-(batch, channel) affine (a, d) such that GroupNorm(x) = x*a + d.

    The reduction pass is unavoidable; the APPLY pass is a pure per-channel
    affine that downstream consumers can fuse into their own input read —
    the Pallas conv kernel applies (a, d) + SiLU in its window prologue
    (ops/conv3x3.py), saving a full HBM round-trip per norm."""
    b, h, w, c = x.shape
    cg = c // groups
    s1 = jnp.mean(x.astype(jnp.float32), axis=(1, 2))            # (B, C)
    s2 = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=(1, 2))
    gm = jnp.mean(s1.reshape(b, groups, cg), axis=-1)            # (B, G)
    g2 = jnp.mean(s2.reshape(b, groups, cg), axis=-1)
    var = g2 - jnp.square(gm)
    inv = lax.rsqrt(var + eps)                                   # (B, G)
    inv_c = jnp.repeat(inv, cg, axis=-1)                         # (B, C)
    mean_c = jnp.repeat(gm, cg, axis=-1)
    scale = p["scale"].astype(jnp.float32)[None]
    bias = p["bias"].astype(jnp.float32)[None]
    a = inv_c * scale
    d = bias - mean_c * a
    return a, d


def group_norm(p, x, *, groups: int = 32, eps: float = 1e-5):
    """GroupNorm over NHWC; statistics in fp32 (TPU numerics rule).

    Layout note: the big (B,H,W,C) tensor is never reshaped — reshaping C
    into (groups, C/groups) would split the TPU lane dimension into 4-wide
    slivers.  Stats reduce over (H,W) per channel first (native layout), then
    group-combine on the tiny (B,C) array; normalization broadcasts per
    channel."""
    orig_dtype = x.dtype
    a, d = group_norm_stats(p, x, groups=groups, eps=eps)
    y = x.astype(jnp.float32) * a[:, None, None, :] + d[:, None, None, :]
    return y.astype(orig_dtype)


def gn_silu_conv2d(p_norm, p_conv, x, *, groups: int = 32, eps: float = 1e-5,
                   policy: Policy = FP32, residual=None):
    """conv(silu(GroupNorm(x))) [+ residual] — the resnet hot pattern.

    On shapes where the Pallas conv wins (ops/dispatch.py), the norm's
    apply pass, the SiLU, and the residual add all fuse into the kernel
    (prologue/epilogue), eliminating 2-3 full HBM round-trips per resnet
    branch that XLA only gets by fusing into its own conv.  Elsewhere the
    unfused composition runs (identical math)."""
    k = p_conv.get("kernel", p_conv.get("kernel_i8"))
    if (k.shape[0] == 3 and k.shape[1] == 3 and x.ndim == 4
            and "kernel_q" not in p_conv):
        from ..ops.dispatch import pallas_conv3x3_config
        b, h, w, _ = x.shape
        cfg = pallas_conv3x3_config(
            b, h, w, k.shape[2], k.shape[3],
            dtype_ok=policy.compute_dtype == jnp.bfloat16)
        if cfg is not None and cfg[2]:
            # gn fusion only where the measured table says it wins AND the
            # fp32 affine window temp fits scoped VMEM (dispatch.py);
            # likewise the residual epilogue / channel-split mode
            a, dshift = group_norm_stats(p_norm, x, groups=groups, eps=eps)
            bias = p_conv["bias"] if "bias" in p_conv else None
            return _dispatched_conv3x3(cfg, x,
                                       kernel_of(p_conv, policy.compute_dtype),
                                       bias, policy=policy,
                                       affine=(a, dshift), residual=residual)
    h = silu(group_norm(p_norm, x, groups=groups, eps=eps))
    y = conv2d(p_conv, h, policy=policy)
    return y if residual is None else y + residual.astype(y.dtype)


def layer_norm(p, x, *, eps: float = 1e-5):
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    xf = (xf - mean) * lax.rsqrt(var + eps)
    xf = xf * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return xf.astype(orig_dtype)


def silu(x):
    return x * jax.nn.sigmoid(x)


def gelu(x):
    # exact (erf) gelu — matches torch nn.GELU default / HF "gelu"
    return jax.nn.gelu(x, approximate=False)


def geglu(p, x, policy: Policy = FP32):
    """diffusers GEGLU: one fused projection to 2*d_ff, gelu-gate half."""
    y = linear(p, x, policy)
    a, g = jnp.split(y, 2, axis=-1)
    return a * gelu(g)
