"""Int8 quantized conv path for the VAE (v5e has 2x int8 MACs vs bf16).

The reference's answer to conv cost is none (cuDNN fp16 autocast,
sdmatte_nodes.py:355-358); on v5e the MXU doubles its MAC rate at int8, and
the VAE's pixel-space convs carry most of the matte's FLOPs
(docs/ARCHITECTURE.md) — so an int8 VAE is the main FLOP-reduction lever
toward the 1024px latency target (VERDICT round 1, item 1).

Scheme (symmetric, zero-point-free — TPU-friendly, no offset terms):
  * weights: per-output-channel scale, quantized ONCE at pipeline build
    (quantize_conv_params), stored alongside the fp tree
  * activations: dynamic per-tensor scale (amax/127), computed in fp32 on
    device per conv — no calibration pass needed, robust to any checkpoint
  * conv in int8 x int8 -> int32 (XLA lowers to the MXU's int8 path),
    dequantized by s_x * s_w[c] and biased in fp32, output bf16

Quality control: eval/quality.py compares the int8 pipeline against bf16 on
the synthetic-composite set; the bf16 end-to-end budget is MAE <= 1e-2 vs
fp32 (docs/ROADMAP.md precision audit), and int8 must stay inside the same
envelope to ship as a default; otherwise it stays an opt-in speed mode.

MEASURED (v5e, benchmarks/ab_int8.py, 2026-08-17): this XLA toolchain does
NOT deliver the int8 MAC-rate win on these conv shapes — encode(b2@1024)
428 ms int8 vs 147 ms bf16 (0.34x, XLA inserts layout/convert passes around
the int8 convs), decode 1.04x (a wash).  The mode therefore stays opt-in
and OFF; quality passed its gate (alpha MAE 0.0057 <= 0.01 vs bf16), so the
blocker is purely the XLA int8 conv lowering.  Revisit if the toolchain
gains a native int8 conv path.

ROUND 3 (benchmarks/ab_int8_pallas.py, 2026-08-17): int8 WAS routed through
the Pallas im2col kernel (conv3x3.conv3x3_same_int8 — bit-exact vs XLA int8
on chip).  Measured on production-pattern chains: 0.85x vs bf16-Pallas at
2x1024^2x128, 1.06x at 2x512^2x256 — below the 1.2x keep bar.  Cause: the
kernel is window-DMA/VPU-bound (bf16 sustains 87-124 TF/s, well under the
197 TF/s MXU peak), so doubling MAC rate buys nothing, the int8 dx-lane
concat is slower on the VPU, and dynamic quantization adds an HBM pass.
int8 therefore stays an opt-in memory-saving mode, not a speed mode, on
this hardware generation.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax


# ------------------------------------------------- int8 weight STORAGE ---
#
# Distinct from the int8 COMPUTE path below (measured slower through both
# XLA and Pallas on this toolchain — see module header): storage compression
# keeps every matmul/conv in bf16 and only changes how the weights SIT in
# HBM.  Each big kernel is held as int8 + a per-output-channel fp32 scale
# and dequantized in-graph right at its (single) use site, so the bf16 form
# is a short-lived temp while the resident footprint halves.  This is the
# b>8 batch lever: the reference's weights occupy ~2.6 GB resident in bf16
# (its own answer is fp16 autocast with fp32 weights resident,
# sdmatte_nodes.py:355-358), and at 1024px each extra batch slot costs
# ~1.4 GB of activation temps, so ~1.3 GB of freed weight HBM converts
# directly into batch slots -> throughput (VERDICT r3 item 2).

def compress_kernel_int8(w):
    """fp kernel (conv HWIO or linear (in,out)) -> (int8 kernel, fp32
    per-output-channel scale); symmetric, zero-point-free.  Runs on host
    (numpy) so the bf16 form is never staged to the device."""
    wf = np.asarray(w, np.float32)
    amax = np.max(np.abs(wf), axis=tuple(range(wf.ndim - 1)))
    scale = np.where(amax == 0, 1.0, amax / 127.0).astype(np.float32)
    wq = np.clip(np.round(wf / scale), -127, 127).astype(np.int8)
    return wq, scale


def compress_tree_int8(params, *, min_elems: int = 1 << 16):
    """Replace every kernel with >= min_elems elements by int8 storage.

    The compressed dict carries ``kernel_i8`` + ``kernel_s`` instead of
    ``kernel``; use sites dequantize via core/nn.kernel_of.  Small tensors
    (norms, biases, the 8-ch conv_in, aux_conv_in, the VAE's latent-moment
    1x1 quant convs) stay fp — they are cheap and numerically load-bearing.
    Dicts already carrying the int8 COMPUTE fields (``kernel_q``) are left
    alone: that opt-in path needs its fp kernel untouched."""
    def walk(node):
        if isinstance(node, dict):
            out = {k: walk(v) for k, v in node.items()}
            k = out.get("kernel")
            if (k is not None and "kernel_q" not in out
                    and getattr(k, "ndim", 0) >= 2
                    and int(np.prod(k.shape)) >= min_elems):
                wq, s = compress_kernel_int8(k)
                del out["kernel"]
                out["kernel_i8"], out["kernel_s"] = wq, s
            return out
        return node
    return walk(params)


def quantize_weights_int8(w):
    """HWIO conv kernel -> (int8 kernel, fp32 per-output-channel scale)."""
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=(0, 1, 2))          # (Cout,)
    scale = jnp.where(amax == 0, 1.0, amax / 127.0)
    wq = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return wq, scale


def quantize_act_int8(x):
    """Dynamic per-tensor symmetric quantization -> (int8 x, fp32 scale)."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf))
    scale = jnp.where(amax == 0, 1.0, amax / 127.0)
    xq = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return xq, scale


def conv2d_int8(x, wq, w_scale, bias=None, *, stride: int = 1, padding=1,
                out_dtype=jnp.bfloat16):
    """NHWC int8 conv: dynamic act quant -> int8 MXU conv -> fp32 dequant."""
    xq, s_x = quantize_act_int8(x)
    if isinstance(padding, int):
        pad = [(padding, padding), (padding, padding)]
    else:
        pad = [tuple(padding[0]), tuple(padding[1])]
    y = lax.conv_general_dilated(
        xq, wq, window_strides=(stride, stride), padding=pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    yf = y.astype(jnp.float32) * (s_x * w_scale.astype(jnp.float32))
    if bias is not None:
        yf = yf + bias.astype(jnp.float32)
    return yf.astype(out_dtype)


def quantize_conv_params(p):
    """Augment one conv's param dict {kernel, bias} with int8 fields."""
    wq, scale = quantize_weights_int8(p["kernel"])
    out = dict(p)
    out["kernel_q"] = wq
    out["kernel_scale"] = scale
    return out


def quantize_vae_tree(vae_params):
    """Walk the VAE param tree and add int8 kernels to every 3x3 conv.

    1x1 convs (quant_conv, shortcuts) and norms are left fp — they are
    cheap, and the 1x1s sit on numerically sensitive paths (latent
    moments)."""
    def walk(node):
        if isinstance(node, dict):
            if "kernel" in node and getattr(node["kernel"], "ndim", 0) == 4 \
                    and node["kernel"].shape[0] == 3:
                return quantize_conv_params(node)
            return {k: walk(v) for k, v in node.items()}
        return node
    return walk(vae_params)
