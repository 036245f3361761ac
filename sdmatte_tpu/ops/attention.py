"""Attention front-end: one interface for every attention site in the stack.

The reference runs attention through diffusers' AttnProcessor with two
monkeypatches (reference replace.py:20-122): the spatial mask is
nearest-resized to each attention resolution and injected as an additive
pre-softmax bias via ``baddbmm(bias, Q, K^T, beta=1)``.  Its memory crutch is
``SlicedAttnProcessor(slice_size=1)`` (sdmatte_nodes.py:331-337).

TPU design: the bias here is always a **per-key vector** ``(B, Lk)`` broadcast
over queries and heads (scores[b,h,q,k] = s·q·kᵀ + bias[b,k]).  That shape
flows through both the XLA path and the Pallas flash kernel (O(L) memory, no
slicing needed — 16,384-token attention runs whole on one chip).

Shapes: q (B, H, Lq, D); k, v (B, H, Lk, D); bias (B, Lk) or None.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.dtypes import Policy, FP32
from ..utils.env import env_flag

_FLASH_MIN_SEQ = 1024  # below this the XLA path is faster than a kernel launch


def attention_xla(q, k, v, *, scale: float, bias=None, accum_dtype=jnp.float32):
    """Reference-faithful attention via plain XLA einsums, fp32 softmax."""
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    s = s * jnp.float32(scale)
    if bias is not None:
        s = s + bias.astype(jnp.float32)[:, None, None, :]
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v,
                   preferred_element_type=accum_dtype)
    return o.astype(v.dtype)


def attention(q, k, v, *, scale: float, bias=None, policy: Policy = FP32,
              impl: str = "auto"):
    """Dispatch between the Pallas flash kernel and the XLA fallback.

    impl: 'auto' | 'xla' | 'flash'.  'auto' uses flash for long sequences on
    TPU and XLA otherwise (tiny resolutions / CPU tests).
    """
    if impl == "auto":
        on_tpu = jax.default_backend() == "tpu"
        long_seq = q.shape[2] * k.shape[2] >= _FLASH_MIN_SEQ * _FLASH_MIN_SEQ
        impl = "flash" if (on_tpu and long_seq) else "xla"
    if impl == "flash":
        from .flash_attention import flash_attention
        # the d<128 fused-denominator variant pads V to 128 lanes in HBM —
        # a (B,H,Lk,128) temp that is irrelevant at b=1 (~20 MB) but OOMs
        # 16 GB HBM at batch>=12 @1024px (measured via compile-only
        # memory_analysis, benchmarks/mem_analysis.py).  Large operands
        # take the classic kernel (identical math, VPU row-sum l).
        b, h, lq, d = q.shape
        lk = k.shape[2]
        variant, halves = "auto", 2
        # threshold 192 MiB: the b=12 stage-0 case (b=12, h=5, lk=16384 ->
        # 240 MiB padded-V) takes the classic path (HBM fit), while the
        # throughput-optimal b=8 case (168 MiB) keeps the slightly faster
        # fused-denominator kernel
        if d < 128 and b * h * lk * 256 > 192 * 1024 * 1024:
            variant = "classic"
        elif (bias is not None and d == 64 and lq == lk == 16384
              and not env_flag("SDMATTE_NO_V2")):
            # per-site measured dispatch (VERDICT r3 item 3): the v2
            # bias-in-dot kernel wins ONLY on the 16,384-token biased
            # self-attention sites — flash_tune.py r4 (2026-08-18):
            # b8h5: v2(h1) 36.61 ms vs v1 37.40/37.85 bracket (+2.7%);
            # b1h5: wash inside drift (r3 measured +4%); 4096-token self
            # and all cross shapes lose -> v1 everywhere else.  The
            # memory gate above keeps v2's full-lane q/k/v temps out of
            # large-batch graphs.
            variant, halves = "v2", 1
        return flash_attention(q, k, v, scale=scale, bias=bias,
                               accum_dtype=policy.accum_dtype,
                               variant=variant, halves=halves)
    return attention_xla(q, k, v, scale=scale, bias=bias,
                         accum_dtype=policy.accum_dtype)
