"""Experimental Pallas 3x3 stride-1 conv (implicit GEMM with halo DMA).

Motivation (docs/ROADMAP.md): XLA's conv sustains ~50 TF/s on the VAE's hot
shape (1024^2 x 128ch, bf16) — the single largest time sink in the pipeline.
This kernel streams row-block windows (with +2-row halo) HBM->VMEM via
double-buffered DMA and computes the conv as 9 accumulated (rows*W, C) @
(C, Cout) matmuls — full 128-lane MXU contraction/output widths.

Status: experimental — used only where measured faster than XLA's native
conv (see benchmarks/conv_check.py); core/nn.conv2d keeps the XLA path.

Constraints: NHWC, kernel 3x3, stride 1, SAME padding, C and Cout multiples
of the lane width preferred.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_hbm, w_ref, o_ref, xwin, sem, *, bh: int, H: int, W: int,
            C: int, Cout: int):
    """xwin scratch is (bh+2, Wp, C) with Wp = round_up(W+2, 8)."""
    b = pl.program_id(0)
    i = pl.program_id(1)

    # DMA the (bh+2, W+2, C) input window (rows i*bh .. i*bh+bh+2) of the
    # pre-padded input for this batch element.
    cp = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(i * bh, bh + 2)],
        xwin,
        sem,
    )
    cp.start()
    cp.wait()

    acc = jnp.zeros((bh * W, Cout), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            xs = xwin[dy:dy + bh, dx:dx + W, :].reshape(bh * W, C)
            acc = acc + jax.lax.dot(
                xs, w_ref[dy, dx], preferred_element_type=jnp.float32)
    o_ref[0] = acc.reshape(bh, W, Cout).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_rows",))
def conv3x3_same(x, w, b=None, *, block_rows: int = 8):
    """x (B,H,W,C) NHWC, w (3,3,C,Cout) HWIO, b (Cout,) -> (B,H,W,Cout)."""
    B, H, W, C = x.shape
    Cout = w.shape[3]
    bh = block_rows
    Hp = -(-H // bh) * bh          # pad rows to a block multiple
    Wp = -(-(W + 2) // 8) * 8      # window width tileable (sublane multiple)
    xp = jnp.pad(x, ((0, 0), (1, 1 + (Hp - H)), (1, Wp - W - 1), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_kernel, bh=bh, H=Hp, W=W, C=C, Cout=Cout),
        grid=(B, Hp // bh),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),       # stays in HBM
            pl.BlockSpec((3, 3, C, Cout), lambda b, i: (0, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bh, W, Cout), lambda b, i: (b, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Hp, W, Cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((bh + 2, Wp, C), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(xp, w)

    out = out[:, :H]
    if b is not None:
        out = out + b.astype(out.dtype)
    return out
