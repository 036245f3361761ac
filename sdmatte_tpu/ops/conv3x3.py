"""Pallas 3x3 stride-1 conv (implicit GEMM, double-buffered halo DMA).

The VAE's large-spatial convs are the single largest time sink at 1024px
(benchmarks/stage_profile.py: XLA sustains only 33-42 TF/s on the
1024^2 x 128ch shapes that dominate encoder stage-0 / decoder stage-3).
This kernel streams row-block windows (with a +2-row halo) HBM->VMEM and
computes the conv as 9 accumulated (bh*W, C) @ (C, Cout) matmuls — full
128-lane MXU contraction/output widths, fp32 accumulation.

v2 (round 2) over the round-1 prototype:
  * cross-grid-iteration DOUBLE-BUFFERED input DMA: while block i computes,
    block i+1's window is already in flight (the round-1 kernel start()ed
    and wait()ed back-to-back, serializing DMA behind compute);
  * bias folded into the kernel (saves a full read-modify-write pass over
    the 256 MB output tensor per conv at 1024^2);
  * adaptive row-block size by VMEM budget.

Used where measured faster than XLA's native conv (benchmarks/conv_check.py
drives the measurement; core/nn.conv2d consults ops.dispatch for the
per-shape winner).  Constraints: NHWC, kernel 3x3, stride 1, SAME padding.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_hbm, w_ref, b_ref, o_ref, xwin, sem, *, bh: int, nI: int,
            nB: int, W: int, C: int, Cout: int):
    """xwin scratch is (2, bh+2, Wp, C); grid (B, H/bh) run sequentially."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    t = b * nI + i                      # linear iteration index

    def dma(slot, bb, ii):
        return pltpu.make_async_copy(
            x_hbm.at[bb, pl.ds(ii * bh, bh + 2)],
            xwin.at[slot],
            sem.at[slot],
        )

    # warm-up: first iteration fetches its own window
    @pl.when(t == 0)
    def _first():
        dma(0, b, i).start()

    # prefetch the NEXT block's window into the other slot
    @pl.when(t + 1 < nB * nI)
    def _prefetch():
        nxt = t + 1
        dma((t + 1) % 2, nxt // nI, nxt % nI).start()

    dma(t % 2, b, i).wait()
    xw = xwin[t % 2]

    acc = jnp.zeros((bh * W, Cout), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            xs = xw[dy:dy + bh, dx:dx + W, :].reshape(bh * W, C)
            acc = acc + jax.lax.dot(
                xs, w_ref[dy, dx], preferred_element_type=jnp.float32)
    acc = acc + b_ref[0].astype(jnp.float32)
    o_ref[0] = acc.reshape(bh, W, Cout).astype(o_ref.dtype)


def _auto_block_rows(W: int, C: int, Cout: int, itemsize: int = 2) -> int:
    """Largest bh in {8,16,32} whose working set fits a ~12 MB VMEM budget:
    2 input windows + (Mosaic-double-buffered) 2 output blocks + weights +
    the fp32 accumulator."""
    budget = 12 * 1024 * 1024
    w_bytes = 9 * C * Cout * itemsize
    for bh in (32, 16, 8):
        wp = -(-(W + 2) // 8) * 8
        win = (bh + 2) * wp * C * itemsize
        out = bh * W * Cout * itemsize
        acc = bh * W * Cout * 4
        if 2 * win + 2 * out + acc + w_bytes <= budget:
            return bh
    return 8


@functools.partial(jax.jit, static_argnames=("block_rows",))
def conv3x3_same(x, w, b=None, *, block_rows: int = 0):
    """x (B,H,W,C) NHWC, w (3,3,C,Cout) HWIO, b (Cout,) -> (B,H,W,Cout).

    block_rows=0 means auto (VMEM-budget heuristic)."""
    B, H, W, C = x.shape
    Cout = w.shape[3]
    bh = block_rows or _auto_block_rows(W, C, Cout, x.dtype.itemsize)
    Hp = -(-H // bh) * bh          # pad rows to a block multiple
    Wp = -(-(W + 2) // 8) * 8      # window width tileable (sublane multiple)
    xp = jnp.pad(x, ((0, 0), (1, 1 + (Hp - H)), (1, Wp - W - 1), (0, 0)))
    bias = jnp.zeros((1, Cout), jnp.float32) if b is None else \
        b.astype(jnp.float32).reshape(1, Cout)

    out = pl.pallas_call(
        functools.partial(_kernel, bh=bh, nI=Hp // bh, nB=B, W=W, C=C,
                          Cout=Cout),
        grid=(B, Hp // bh),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),       # stays in HBM
            pl.BlockSpec((3, 3, C, Cout), lambda b, i: (0, 0, 0, 0)),
            pl.BlockSpec((1, Cout), lambda b, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bh, W, Cout), lambda b, i: (b, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Hp, W, Cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, bh + 2, Wp, C), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            # both dims sequential: the cross-iteration prefetch assumes
            # linear iteration order
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
    )(xp, w, bias)

    return out[:, :H]
