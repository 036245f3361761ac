"""Pallas TPU flash attention with additive per-key bias.

Replaces the reference's memory crutches for 16,384-token attention
(SlicedAttnProcessor(slice_size=1) + fp16 autocast, reference
sdmatte_nodes.py:331-337,355-358) with an O(L)-memory online-softmax kernel:
the (L, L) score matrix is never materialized; Q/K/V tiles stream through
VMEM and softmax statistics live in fp32 scratch (see
/opt/skills/guides/boom_attention_tricks.md for the canonical tiling).

Specialization for this model family: the mask bias is a **per-key vector**
(B, Lk) — scores[b,h,q,k] = scale*q.k + bias[b,k] (reference replace.py:93-106
injects it via baddbmm beta=1, broadcast over queries/heads).  The kernel
streams one (1, block_k) bias tile per KV step; queries/heads broadcast free.

Handles ragged sequence lengths (640px -> 6400 tokens etc.) by padding to
block multiples; padded keys are masked with a large negative bias, padded
query rows are sliced off after the kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)
_LANES = 128


def _cdiv(a, b):
    return -(-a // b)


def _round_up(x, m):
    return _cdiv(x, m) * m


def _kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, m_ref, l_ref, acc_ref, *,
            scale: float, nk: int):
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = q_ref[0]                                   # (bq, d)
    k = k_ref[0]                                   # (bk, d)
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    s = s * scale
    if bias_ref is not None:
        s = s + bias_ref[0]                        # (1, bk) broadcast over rows

    m_prev = m_ref[:, :1]
    l_prev = l_ref[:, :1]
    m_curr = jnp.max(s, axis=1, keepdims=True)
    m_next = jnp.maximum(m_prev, m_curr)
    alpha = jnp.exp(m_prev - m_next)
    p = jnp.exp(s - m_next)
    l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
    m_ref[...] = jnp.broadcast_to(m_next, m_ref.shape)
    l_ref[...] = jnp.broadcast_to(l_next, l_ref.shape)
    acc_ref[...] = acc_ref[...] * alpha + jax.lax.dot(
        p.astype(v_ref.dtype), v_ref[0], preferred_element_type=jnp.float32)

    @pl.when(ki == nk - 1)
    def _finalize():
        l = l_ref[:, :1]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[0] = (acc_ref[...] * l_inv).astype(o_ref.dtype)


def _kernel_fused_l(q_ref, k_ref, v_ref, bias_ref, o_ref, m_ref, acc_ref, *,
                    nk: int, d: int):
    """Narrow-head (d < 128) variant — the U-Net's d=64 hot path.

    The softmax denominator rides the PV matmul instead of a VPU reduction:
    V is padded to the 128-lane tile the MXU pays for anyway, with a ones
    column at index ``d``, so column ``d`` of the accumulator IS the running
    sum of exp (identical alpha-rescale recurrence).  Combined with folding
    ``scale`` into q on the host, this removes two full (bq, bk) VPU passes
    per step from a VPU-bound kernel (docs/ARCHITECTURE.md accounting)."""
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = q_ref[0]                                   # (bq, d), pre-scaled
    k = k_ref[0]                                   # (bk, d)
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    if bias_ref is not None:
        s = s + bias_ref[0]                        # (1, bk) broadcast over rows

    m_prev = m_ref[:, :1]
    m_curr = jnp.max(s, axis=1, keepdims=True)
    m_next = jnp.maximum(m_prev, m_curr)
    alpha = jnp.exp(m_prev - m_next)
    p = jnp.exp(s - m_next).astype(v_ref.dtype)
    m_ref[...] = jnp.broadcast_to(m_next, m_ref.shape)
    # v_ref[0] is (bk, 128): [V | ones | 0...]; col d of the dot = sum(p)
    acc_ref[...] = acc_ref[...] * alpha + jax.lax.dot(
        p, v_ref[0], preferred_element_type=jnp.float32)

    @pl.when(ki == nk - 1)
    def _finalize():
        l = acc_ref[:, d:d + 1]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[0] = (acc_ref[:, :d] * l_inv).astype(o_ref.dtype)


def _kernel_d64_v2(q_ref, k_ref, v_ref, o_ref, m_ref, acc_ref, *,
                   nk: int, d: int, halves: int):
    """Narrow-head v2 — MXU-rides-everything + split softmax chains.

    MEASURED (v5e, benchmarks/flash_tune.py 2026-08-17): v1 (fused
    denominator) already sustains 77.8 TF/s on the (1,5,16384,16384,64)
    self-attention shape — ~2x the round-1 number and past the 70 TF/s
    round-2 target; Mosaic's scheduler evidently already overlaps the
    VPU softmax with MXU work.  v2 wins only +4% there with halves=1
    (bias-in-dot alone), loses on the cross shape, and splitting chains
    (halves>1) always loses.

    ROUND 4 (flash_tune.py r4, 2026-08-18): re-swept on the production
    shapes incl. b=8 — v2(halves=1) wins the biased 16,384-token self
    sites at b=8 (36.61 vs 37.40/37.85 ms bracket) and washes at b=1;
    4096-token self and cross lose.  ops/attention.py now dispatches v2
    per-site on exactly that shape class; halves>1 stays a negative.

    Two tricks on top of the fused-denominator variant:
      * bias-in-dot: the K=64 contraction wastes half the MXU's 128-lane
        depth anyway, so lane ``d`` carries the per-key bias in K' and a
        ones column in Q' — s = scale*q.k + bias comes out of the ONE dot
        with no VPU bias pass (and no separate bias operand/DMA).
      * ``halves`` independent softmax chains per program: the q tile is
        split row-wise; each half runs its own s -> max -> exp -> PV
        chain with no cross-half dependence, so Mosaic's VLIW scheduler
        overlaps half A's VPU softmax with half B's MXU dots.  A single
        monolithic chain leaves the MXU idle during every exp.

    q_ref (1, bq, 128): [q*scale | 1 | 0...]; k_ref (1, bk, 128):
    [k | bias | 0...]; v_ref (1, bk, 128): [v | 1 | 0...] (denominator in
    acc column d, as in _kernel_fused_l).  Padded keys carry MASK_VALUE in
    the bias lane, so they die in the softmax like any masked key."""
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    k = k_ref[0]                                   # (bk, 128)
    v = v_ref[0]                                   # (bk, 128)
    bq = q_ref.shape[1]
    h = bq // halves
    for i in range(halves):
        q = q_ref[0, i * h:(i + 1) * h]            # (h, 128)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        m_prev = m_ref[i * h:(i + 1) * h, :1]
        m_curr = jnp.max(s, axis=1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next).astype(v.dtype)
        m_ref[i * h:(i + 1) * h] = jnp.broadcast_to(
            m_next, (h, m_ref.shape[1]))
        acc_ref[i * h:(i + 1) * h] = acc_ref[i * h:(i + 1) * h] * alpha + \
            jax.lax.dot(p, v, preferred_element_type=jnp.float32)

    @pl.when(ki == nk - 1)
    def _finalize():
        l = acc_ref[:, d:d + 1]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[0] = (acc_ref[:, :d] * l_inv).astype(o_ref.dtype)


def _auto_blocks(lq: int, lk: int, d: int):
    """Measured on v5e (benchmarks/flash_check.py sweeps): throughput rises
    with KV-tile size until VMEM pressure.  Narrow heads (d<=128, the U-Net)
    run best at bq=512; wide heads (d=512, the VAE mid-block) must shrink the
    q tile to afford bk=2048 in VMEM (bq256/bk2048: 82 TF/s vs 43 at
    bq512/bk1024).  bk=2048 only when it divides Lk (padding waste)."""
    big_k = lk % 2048 == 0
    if d > 128:
        return 256, 2048 if big_k else 1024
    return 512, 2048 if big_k else 1024


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "block_k",
                                             "accum_dtype", "variant",
                                             "halves"))
def flash_attention(q, k, v, *, scale: float, bias=None, block_q: int = 0,
                    block_k: int = 0, accum_dtype=jnp.float32,
                    variant: str = "auto", halves: int = 2):
    """q (B,H,Lq,D), k/v (B,H,Lk,D), bias (B,Lk) additive or None -> (B,H,Lq,D).

    block_q/block_k of 0 mean "auto" (v5e-tuned heuristics).
    variant: "auto" picks the measured-best kernel per shape; "v1" forces
    the fused-denominator kernel, "v2" the bias-in-dot split-chain kernel
    (d<128 only; ``halves`` = independent softmax chains per program)."""
    b, h, lq, d = q.shape
    lk = k.shape[2]
    abq, abk = _auto_blocks(lq, lk, d)
    bq = min(block_q or abq, _round_up(lq, _LANES))
    bk = min(block_k or abk, _round_up(lk, _LANES))
    lq_p = _round_up(lq, bq)
    lk_p = _round_up(lk, bk)

    if lq_p != lq:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, lq_p - lq), (0, 0)))
    if lk_p != lk:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, lk_p - lk), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, lk_p - lk), (0, 0)))
        if bias is None:
            bias = jnp.zeros((b, lk), jnp.float32)
    if bias is not None:
        bias = bias.astype(jnp.float32)
        if lk_p != lk:
            bias = jnp.pad(bias, ((0, 0), (0, lk_p - lk)),
                           constant_values=MASK_VALUE)

    # narrow heads (the U-Net's d=64): fused-denominator variant — V padded
    # to the 128-lane tile with a ones column at index d (free MXU width).
    # variant="classic" skips that padding: the ones-concat materializes a
    # (B,H,Lk,128) HBM temp (2x V), which is what OOMs batch>=12 @1024px —
    # large-batch callers trade a little VPU (explicit row-sum l) for it.
    fused_l = d < _LANES and variant != "classic"
    # "auto" stays on v1 until flash_check.py shows v2 winning on the
    # production shapes (measured dispatch, same policy as ops/dispatch.py)
    use_v2 = fused_l and variant == "v2"

    if use_v2:
        if bq % halves:
            raise ValueError(f"halves={halves} must divide block_q={bq}")
        # q' = [q*scale | 1 | 0], k' = [k | bias | 0], v' = [v | 1 | 0]:
        # the dot emits scale*qk + bias directly (lane d of the otherwise
        # idle 64..127 contraction range), V's ones column carries the
        # softmax denominator into acc column d
        ones_q = jnp.ones((b, h, lq_p, 1), q.dtype)
        qf = jnp.concatenate(
            [(q.astype(jnp.float32) * scale).astype(q.dtype), ones_q,
             jnp.zeros((b, h, lq_p, _LANES - d - 1), q.dtype)], axis=-1)
        if bias is None:
            bcol = jnp.zeros((b, 1, lk_p, 1), k.dtype)
        else:
            bcol = bias.astype(jnp.float32).reshape(b, 1, lk_p, 1) \
                .astype(k.dtype)
        kf = jnp.concatenate(
            [k, jnp.broadcast_to(bcol, (b, h, lk_p, 1)),
             jnp.zeros((b, h, lk_p, _LANES - d - 1), k.dtype)], axis=-1)
        ones_v = jnp.ones((b, h, lk_p, 1), v.dtype)
        vf = jnp.concatenate(
            [v, ones_v, jnp.zeros((b, h, lk_p, _LANES - d - 1), v.dtype)],
            axis=-1)
        qf = qf.reshape(b * h, lq_p, _LANES)
        kf = kf.reshape(b * h, lk_p, _LANES)
        vf = vf.reshape(b * h, lk_p, _LANES)
        nq = lq_p // bq
        nk = lk_p // bk
        out = pl.pallas_call(
            functools.partial(_kernel_d64_v2, nk=nk, d=d, halves=halves),
            grid=(b * h, nq, nk),
            in_specs=[
                pl.BlockSpec((1, bq, _LANES), lambda bh, qi, ki: (bh, qi, 0)),
                pl.BlockSpec((1, bk, _LANES), lambda bh, qi, ki: (bh, ki, 0)),
                pl.BlockSpec((1, bk, _LANES), lambda bh, qi, ki: (bh, ki, 0)),
            ],
            out_specs=pl.BlockSpec((1, bq, d), lambda bh, qi, ki: (bh, qi, 0)),
            out_shape=jax.ShapeDtypeStruct((b * h, lq_p, d), q.dtype),
            scratch_shapes=[
                pltpu.VMEM((bq, _LANES), jnp.float32),   # running max
                pltpu.VMEM((bq, _LANES), jnp.float32),   # acc (l in col d)
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
            ),
        )(qf, kf, vf)
        out = out.reshape(b, h, lq_p, d)
        if lq_p != lq:
            out = out[:, :, :lq]
        return out

    qf = q.reshape(b * h, lq_p, d)
    kf = k.reshape(b * h, lk_p, d)
    if fused_l:
        qf = (qf.astype(jnp.float32) * scale).astype(q.dtype)
        ones = jnp.ones((b, h, lk_p, 1), v.dtype)
        v = jnp.concatenate(
            [v, ones, jnp.zeros((b, h, lk_p, _LANES - d - 1), v.dtype)], axis=-1)
        vf = v.reshape(b * h, lk_p, _LANES)
        dv = _LANES
    else:
        vf = v.reshape(b * h, lk_p, d)
        dv = d
    nq = lq_p // bq
    nk = lk_p // bk
    grid = (b * h, nq, nk)

    in_specs = [
        pl.BlockSpec((1, bq, d), lambda bh, qi, ki: (bh, qi, 0)),
        pl.BlockSpec((1, bk, d), lambda bh, qi, ki: (bh, ki, 0)),
        pl.BlockSpec((1, bk, dv), lambda bh, qi, ki: (bh, ki, 0)),
    ]
    operands = [qf, kf, vf]
    if bias is not None:
        # (B, 1, Lk): keeps the trailing block dims (1, bk) TPU-tileable
        in_specs.append(
            pl.BlockSpec((1, 1, bk), lambda bh, qi, ki: (bh // h, 0, ki)))
        operands.append(bias.reshape(b, 1, lk_p))
        if fused_l:
            kern = functools.partial(_kernel_fused_l, nk=nk, d=d)
        else:
            kern = functools.partial(_kernel, scale=scale, nk=nk)
    else:
        if fused_l:
            kern = functools.partial(
                lambda qr, kr, vr, o, m, a, **kw: _kernel_fused_l(
                    qr, kr, vr, None, o, m, a, **kw), nk=nk, d=d)
        else:
            kern = functools.partial(
                lambda qr, kr, vr, o, m, l, a, **kw: _kernel(qr, kr, vr, None, o, m, l, a, **kw),
                scale=scale, nk=nk)

    if fused_l:
        scratch = [
            pltpu.VMEM((bq, _LANES), jnp.float32),   # running max
            pltpu.VMEM((bq, _LANES), jnp.float32),   # acc (l rides col d)
        ]
    else:
        scratch = [
            pltpu.VMEM((bq, _LANES), jnp.float32),   # running max
            pltpu.VMEM((bq, _LANES), jnp.float32),   # running sum
            pltpu.VMEM((bq, d), jnp.float32),        # output accumulator
        ]

    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, bq, d), lambda bh, qi, ki: (bh, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, lq_p, d), q.dtype),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(*operands)

    out = out.reshape(b, h, lq_p, d)
    if lq_p != lq:
        out = out[:, :, :lq]
    return out
