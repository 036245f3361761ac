"""Pallas 3x3 stride-1 conv (implicit GEMM, double-buffered halo DMA).

The VAE's large-spatial convs are the single largest time sink at 1024px
(benchmarks/stage_profile.py: XLA sustains only 25-55 TF/s on the shapes
that dominate — replaces the torch/cuDNN convs inside the reference's
diffusers blocks, reference meta_arch.py:142-145,254-257).

v3 (round 2) — what the measurements taught:
  * v2 ran 9 accumulated (bh*W, C) @ (C, Cout) dots; profiling showed the
    fp32 accumulator's VMEM read-modify-write traffic (9 round trips of
    M x Cout x 4B) capped the kernel at ~35-45% MFU.  v3 concatenates the
    three dx-shifts along the contraction axis instead: per dy one
    (bh*W, 3C) @ (3C, coN) dot — 3 accumulator round trips instead of 9
    and a 3x-deeper MXU contraction.  The weight is reshaped (3, 3C, Cout)
    on the host (w[dy].reshape: K index = dx*C + c, matching the lane
    concat order).
  * Cout is tiled by a third grid dimension (innermost, so the input
    window in VMEM is fetched ONCE per row-block and reused across weight
    column blocks) — this is what let the 512-channel shapes compile at
    all (v2 OOM'd scoped VMEM at 18.5 MB).
  * cross-row-block double-buffered window DMA (kept from v2): while
    block t computes, block t+1's window is in flight.

A v4 ("zero-relayout im2col": dx shifts folded into lane-region DMAs from
HBM, W chunked by a fourth grid dim) was built and is parity-correct in
interpret mode, but this toolchain's remote Mosaic compiler rejects BOTH a
column-sliced (3-axis) HBM DMA source and a lane-sliced VMEM DMA
destination (minimal repros in /tmp/dma_probe.log history; every config
failed with tpu_compile_helper exit 1 while the 2-axis-slice v3 DMA
compiles fine).  If a future toolchain accepts those, v4 removes the one
remaining VPU cost here (the dx-shifted slice + concat per dy).

Measurement-methodology note: per-call dispatch+fetch overhead on this dev
tunnel is ~32 ms flat, and chained-accumulator harnesses add full HBM
passes per rep — benchmarks/conv_clean.py uses self-feeding conv chains
(y = conv(y, w)) minus measured overhead for honest per-conv times; the
dispatch table in ops/dispatch.py is generated from it.

Used where measured faster than XLA's native conv (ops/dispatch.py holds
the winner table consulted by core/nn.conv2d).  Constraints: NHWC, kernel
3x3, stride 1, SAME padding.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils.env import env_flag


def _kernel_v5(x_hbm, w_ref, b_ref, *rest, bh: int, nI: int,
               nB: int, W: int, C: int, coN: int, H: int,
               fuse_gn: bool, fuse_res: bool):
    """Borderless-DMA variant: x stays UNPADDED in HBM.

    v3's host-side jnp.pad materializes a full second copy of the activation
    that XLA cannot fuse into the custom call — harmless at b<=2 (<=0.6 GiB)
    but it OOM'd the b=8 throughput graph when stage-0 was dispatched
    (benchmarks/ab_enc_batch.py).  Here the halo is synthesized in-kernel:

      * rows: 3-case DMA (first/interior/last row-block) — the boundary
        blocks copy bh+1 rows into a row-shifted scratch slice (row offset
        rides the MAJOR axis, so it is tile-aligned) and zero the border row
      * columns: the dx=0/dx=2 im2col strips are built with an explicit
        zero edge column at concat time — same VPU copy count as v3's
        shifted slices, no scratch-level column padding at all

    Requires H % bh == 0, W % 8 == 0, H/bh >= 2 (all production shapes);
    the wrapper falls back to the padded v3 path otherwise."""
    rest = list(rest)
    ad_ref = rest.pop(0) if fuse_gn else None
    res_ref = rest.pop(0) if fuse_res else None
    o_ref, xwin, sem = rest

    b = pl.program_id(0)
    i = pl.program_id(1)
    co = pl.program_id(2)
    t = b * nI + i

    def start_dma(slot, bb, ii):
        # one async copy per case; the descriptor (src/dst/sem) must be
        # reconstructed identically at wait time, so each case uses the
        # same sem slot and is selected by the same predicate
        @pl.when(ii == 0)
        def _first():
            pltpu.make_async_copy(
                x_hbm.at[bb, pl.ds(0, bh + 1)],
                xwin.at[slot, pl.ds(1, bh + 1)],
                sem.at[slot]).start()
        @pl.when((ii > 0) & (ii < nI - 1))
        def _interior():
            pltpu.make_async_copy(
                x_hbm.at[bb, pl.ds(ii * bh - 1, bh + 2)],
                xwin.at[slot],
                sem.at[slot]).start()
        @pl.when(ii == nI - 1)
        def _last():
            pltpu.make_async_copy(
                x_hbm.at[bb, pl.ds(ii * bh - 1, bh + 1)],
                xwin.at[slot, pl.ds(0, bh + 1)],
                sem.at[slot]).start()

    def wait_dma(slot, bb, ii):
        @pl.when(ii == 0)
        def _first():
            pltpu.make_async_copy(
                x_hbm.at[bb, pl.ds(0, bh + 1)],
                xwin.at[slot, pl.ds(1, bh + 1)],
                sem.at[slot]).wait()
        @pl.when((ii > 0) & (ii < nI - 1))
        def _interior():
            pltpu.make_async_copy(
                x_hbm.at[bb, pl.ds(ii * bh - 1, bh + 2)],
                xwin.at[slot],
                sem.at[slot]).wait()
        @pl.when(ii == nI - 1)
        def _last():
            pltpu.make_async_copy(
                x_hbm.at[bb, pl.ds(ii * bh - 1, bh + 1)],
                xwin.at[slot, pl.ds(0, bh + 1)],
                sem.at[slot]).wait()

    @pl.when(co == 0)
    def _fetch():
        @pl.when(t == 0)
        def _f0():
            start_dma(0, b, i)
        wait_dma(t % 2, b, i)
        @pl.when(t + 1 < nB * nI)
        def _prefetch():
            nxt = t + 1
            start_dma((t + 1) % 2, nxt // nI, nxt % nI)
        sl = t % 2
        # boundary blocks: the DMA left one scratch row untouched — zero it
        @pl.when(i == 0)
        def _zt():
            xwin[sl, 0:1] = jnp.zeros((1, W, C), xwin.dtype)
        @pl.when(i == nI - 1)
        def _zb():
            xwin[sl, bh + 1:bh + 2] = jnp.zeros((1, W, C), xwin.dtype)
        if fuse_gn:
            win = xwin[sl].astype(jnp.float32)
            a = ad_ref[0, 0].astype(jnp.float32)
            d = ad_ref[0, 1].astype(jnp.float32)
            y = win * a + d
            y = y * jax.nn.sigmoid(y)
            # the zeroed border rows must STAY zero through the nonlinearity
            # (silu(0*a+d) = silu(d) != 0); columns need no mask — the zero
            # edge columns are introduced after activation, at strip build
            row_ids = i * bh - 1 + jax.lax.broadcasted_iota(
                jnp.int32, (bh + 2, W, 1), 0)
            interior = (row_ids >= 0) & (row_ids <= H - 1)
            xwin[sl] = jnp.where(interior, y, 0.0).astype(xwin.dtype)

    slot = t % 2
    zcol = None
    acc = None
    for dy in range(3):
        rows = xwin[slot, dy:dy + bh]                  # (bh, W, C)
        if zcol is None:
            zcol = jnp.zeros((bh, 1, C), rows.dtype)
        strips = [
            jnp.concatenate([zcol, rows[:, :W - 1]], axis=1),
            rows,
            jnp.concatenate([rows[:, 1:], zcol], axis=1),
        ]
        xcat = jnp.concatenate(
            [s.reshape(bh * W, C) for s in strips], axis=-1)
        d = jax.lax.dot(xcat, w_ref[dy], preferred_element_type=jnp.float32)
        acc = d if acc is None else acc + d
    acc = acc + b_ref[0].astype(jnp.float32)
    if fuse_res:
        acc = acc + res_ref[0].reshape(bh * W, coN).astype(jnp.float32)
    o_ref[0] = acc.reshape(bh, W, coN).astype(o_ref.dtype)


def _kernel(x_hbm, w_ref, b_ref, *rest, bh: int, nI: int,
            nB: int, nCo: int, W: int, C: int, coN: int, H: int,
            fuse_gn: bool, fuse_res: bool):
    """Grid (B, H/bh, Cout/coN), all sequential; co innermost so the window
    scratch (2, bh+2, W+2pad, C) is reused across weight column blocks.

    Optional fusions (both save a full HBM round-trip of the activation
    that XLA would get by fusing into its own conv — a custom call has to
    earn them back by hand):
      fuse_gn:  the GroupNorm affine + SiLU prologue is applied IN the
                window right after its DMA lands (once per row-block, not
                per co-tile).  The zero-padding border must stay zero
                through the nonlinearity (silu(0*a+d) = silu(d) != 0), so
                padded rows/cols are re-masked after the activation.
      fuse_res: the residual add rides the output epilogue; the residual
                block streams in via a Mosaic-pipelined BlockSpec.
    """
    rest = list(rest)
    ad_ref = rest.pop(0) if fuse_gn else None
    res_ref = rest.pop(0) if fuse_res else None
    o_ref, xwin, sem = rest

    b = pl.program_id(0)
    i = pl.program_id(1)
    co = pl.program_id(2)
    t = b * nI + i                      # linear row-block index

    def dma(slot, bb, ii):
        return pltpu.make_async_copy(
            x_hbm.at[bb, pl.ds(ii * bh, bh + 2)],
            xwin.at[slot],
            sem.at[slot],
        )

    @pl.when(co == 0)
    def _fetch():
        @pl.when(t == 0)
        def _first():
            dma(0, b, i).start()
        dma(t % 2, b, i).wait()
        # window for block t is resident: prefetch block t+1 into the
        # other slot while every co-tile of t computes
        @pl.when(t + 1 < nB * nI)
        def _prefetch():
            nxt = t + 1
            dma((t + 1) % 2, nxt // nI, nxt % nI).start()
        if fuse_gn:
            sl = t % 2
            win = xwin[sl].astype(jnp.float32)
            a = ad_ref[0, 0].astype(jnp.float32)       # (C,)
            d = ad_ref[0, 1].astype(jnp.float32)
            y = win * a + d
            y = y * jax.nn.sigmoid(y)                  # silu
            # padding rows/cols were zero pre-affine and must stay zero:
            # window row r is xp row i*bh + r; xp row 0 and rows >= H+1
            # are padding, as are cols 0 and >= W+1
            wp = xwin.shape[2]
            # 3-D iotas: Mosaic can't insert a minor dim on a sub-32-bit
            # mask, so build the mask at broadcast rank directly
            row_ids = i * bh + jax.lax.broadcasted_iota(
                jnp.int32, (bh + 2, wp, 1), 0)
            col_ids = jax.lax.broadcasted_iota(jnp.int32, (bh + 2, wp, 1), 1)
            interior = ((row_ids >= 1) & (row_ids <= H)
                        & (col_ids >= 1) & (col_ids <= W))
            xwin[sl] = jnp.where(interior, y, 0.0).astype(xwin.dtype)

    slot = t % 2

    acc = None
    for dy in range(3):
        # slice the scratch ref directly (loads only the (bh, W, C) region;
        # indexing the ref by slot first would copy the whole window per
        # co-tile); the three dx lane-concats build the (bh*W, 3C) im2col
        # strip for this dy
        xcat = jnp.concatenate(
            [xwin[slot, dy:dy + bh, dx:dx + W, :].reshape(bh * W, C)
             for dx in range(3)], axis=-1)
        d = jax.lax.dot(xcat, w_ref[dy], preferred_element_type=jnp.float32)
        acc = d if acc is None else acc + d
    acc = acc + b_ref[0].astype(jnp.float32)
    if fuse_res:
        acc = acc + res_ref[0].reshape(bh * W, coN).astype(jnp.float32)
    o_ref[0] = acc.reshape(bh, W, coN).astype(o_ref.dtype)


def _pick_blocks(W: int, C: int, Cout: int, itemsize: int = 2,
                 fuse_gn: bool = False, fuse_res: bool = False):
    """(block_rows, cout_block) under the 16 MB scoped-VMEM limit, with
    headroom.  Accounts: 2 window slots + 2 pipelined weight blocks +
    2 output blocks + the fp32 accumulator + im2col strip + (if fused)
    the fp32 affine temp and the double-buffered residual block."""
    budget = 13 * 1024 * 1024
    wp = -(-(W + 2) // 8) * 8
    co_cands = [c for c in (512, 256, 128) if c <= Cout and Cout % c == 0] \
        or [Cout]
    best = None
    for bh in (32, 16, 8):
        for coN in co_cands:
            win = 2 * (bh + 2) * wp * C * itemsize
            wgt = 2 * 9 * C * coN * itemsize
            out = 2 * bh * W * coN * itemsize
            acc = bh * W * coN * 4
            strip = bh * W * 3 * C * itemsize
            extra = 0
            if fuse_gn:          # fp32 window temp during affine+silu
                extra += (bh + 2) * wp * C * 4
            if fuse_res:         # 2 pipelined residual blocks
                extra += 2 * bh * W * coN * itemsize
            if win + wgt + out + acc + strip + extra <= budget:
                cand = (bh, coN)
                if best is None or (bh, coN) > best:
                    best = cand
    return best or (8, 128)


def conv3x3_same_csplit(x, w, b=None, *, affine=None, residual=None,
                        block_rows: int = 0, cout_block: int = 0,
                        fuse_sum: bool = False):
    """conv3x3_same computed as two half-input-channel passes.

    For shapes whose halo window (2, bh+2, Wp, C) exceeds scoped VMEM
    (1024-wide rows at C>=256 — the decoder's upsampled stages), splitting
    the CONTRACTION (input channels) halves the window with no halo
    bookkeeping: conv(x, w) = conv(x_lo, w_lo) + conv(x_hi, w_hi).
    GroupNorm fusion stays exact: (a, d) are per-channel, so each half
    applies its slice.

    fuse_sum: ride the cross-pass add (and the caller's residual) on the
    kernel's residual epilogue — only where the extra VMEM blocks fit
    (measured per shape, ops/dispatch.py); otherwise the adds run as one
    XLA elementwise pass outside."""
    C = x.shape[-1]
    ch = C // 2
    a_lo = a_hi = None
    if affine is not None:
        a, d = affine
        a_lo, a_hi = (a[:, :ch], d[:, :ch]), (a[:, ch:], d[:, ch:])
    if fuse_sum:
        half1 = conv3x3_same(x[..., :ch], w[:, :, :ch], None, affine=a_lo,
                             residual=residual, block_rows=block_rows,
                             cout_block=cout_block)
        return conv3x3_same(x[..., ch:], w[:, :, ch:], b, affine=a_hi,
                            residual=half1, block_rows=block_rows,
                            cout_block=cout_block)
    half1 = conv3x3_same(x[..., :ch], w[:, :, :ch], None, affine=a_lo,
                         block_rows=block_rows, cout_block=cout_block)
    half2 = conv3x3_same(x[..., ch:], w[:, :, ch:], b, affine=a_hi,
                         block_rows=block_rows, cout_block=cout_block)
    out = half1 + half2
    return out if residual is None else out + residual.astype(out.dtype)


# ------------------------------------------------------------------ int8 ---

def _kernel_i8(x_hbm, w_ref, b_ref, s_ref, o_ref, xwin, sem, *, bh: int,
               nI: int, nB: int, W: int, C: int, coN: int):
    """int8 variant of _kernel: int8 window DMA (half the HBM bytes of bf16),
    int8x int8 -> int32 MXU dots (2x MAC rate on v5e), fp32 dequant epilogue.
    The activation scale is folded into s_ref (= s_x * w_scale) by the host
    wrapper, so the epilogue is one fused multiply-add per output element.
    Same grid/DMA structure as _kernel; no gn/residual fusion (quantization
    happens before the kernel, in the producer's XLA epilogue)."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    co = pl.program_id(2)
    t = b * nI + i

    def dma(slot, bb, ii):
        return pltpu.make_async_copy(
            x_hbm.at[bb, pl.ds(ii * bh, bh + 2)],
            xwin.at[slot],
            sem.at[slot],
        )

    @pl.when(co == 0)
    def _fetch():
        @pl.when(t == 0)
        def _first():
            dma(0, b, i).start()
        dma(t % 2, b, i).wait()
        @pl.when(t + 1 < nB * nI)
        def _prefetch():
            nxt = t + 1
            dma((t + 1) % 2, nxt // nI, nxt % nI).start()

    slot = t % 2
    acc = None
    for dy in range(3):
        xcat = jnp.concatenate(
            [xwin[slot, dy:dy + bh, dx:dx + W, :].reshape(bh * W, C)
             for dx in range(3)], axis=-1)
        d = jax.lax.dot(xcat, w_ref[dy], preferred_element_type=jnp.int32)
        acc = d if acc is None else acc + d
    accf = acc.astype(jnp.float32) * s_ref[0].astype(jnp.float32)
    accf = accf + b_ref[0].astype(jnp.float32)
    o_ref[0] = accf.reshape(bh, W, coN).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_rows", "cout_block",
                                             "out_dtype"))
def conv3x3_same_int8(xq, wq, scale_vec, b=None, *, block_rows: int = 0,
                      cout_block: int = 0, out_dtype=jnp.bfloat16):
    """xq (B,H,W,C) int8 NHWC, wq (3,3,C,Cout) int8 HWIO,
    scale_vec (Cout,) fp32 = s_x * w_scale (caller folds the dynamic
    activation scale in), b (Cout,) fp32 -> (B,H,W,Cout) out_dtype.

    The VERDICT round-2 item-4 experiment: XLA's int8 conv lowering measured
    0.34x (ops/quant.py header) — this routes the same int8 math through the
    Pallas im2col kernel instead, keeping the v3 DMA/tiling structure."""
    B, H, W, C = xq.shape
    Cout = wq.shape[3]
    abh, acoN = _pick_blocks(W, C, Cout, 1)
    bh = block_rows or abh
    coN = cout_block or acoN
    if Cout % coN:
        # the grid floor-divides Cout: a non-divisor block would silently
        # leave channels [Cout//coN*coN:] as uninitialized output memory
        raise ValueError(f"cout_block={coN} must divide Cout={Cout}")
    Hp = -(-H // bh) * bh
    Wp = -(-(W + 2) // 8) * 8
    xp = jnp.pad(xq, ((0, 0), (1, 1 + (Hp - H)), (1, Wp - W - 1), (0, 0)))
    wcat = wq.reshape(3, 3 * C, Cout)
    bias = jnp.zeros((1, Cout), jnp.float32) if b is None else \
        b.astype(jnp.float32).reshape(1, Cout)
    scale = scale_vec.astype(jnp.float32).reshape(1, Cout)

    out = pl.pallas_call(
        functools.partial(_kernel_i8, bh=bh, nI=Hp // bh, nB=B,
                          W=W, C=C, coN=coN),
        grid=(B, Hp // bh, Cout // coN),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
            pl.BlockSpec((3, 3 * C, coN), lambda b, i, co: (0, 0, co)),
            pl.BlockSpec((1, coN), lambda b, i, co: (0, co)),
            pl.BlockSpec((1, coN), lambda b, i, co: (0, co)),
        ],
        out_specs=pl.BlockSpec((1, bh, W, coN),
                               lambda b, i, co: (b, i, 0, co)),
        out_shape=jax.ShapeDtypeStruct((B, Hp, W, Cout), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((2, bh + 2, Wp, C), jnp.int8),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
    )(xp, wcat, bias, scale)

    return out[:, :H]


@functools.partial(jax.jit, static_argnames=("block_rows", "cout_block"))
def conv3x3_same(x, w, b=None, *, affine=None, residual=None,
                 block_rows: int = 0, cout_block: int = 0):
    """x (B,H,W,C) NHWC, w (3,3,C,Cout) HWIO, b (Cout,) -> (B,H,W,Cout).

    affine: optional (a, d) pair of (B, C) fp32 arrays — computes
    conv(silu(x * a + d)) with the GroupNorm-affine + SiLU applied in the
    kernel window (one fused HBM pass; see core/nn.group_norm_stats).
    residual: optional (B, H, W, Cout) tensor added to the conv output in
    the kernel epilogue.
    block_rows/cout_block of 0 mean auto (VMEM-budget heuristic)."""
    B, H, W, C = x.shape
    Cout = w.shape[3]
    abh, acoN = _pick_blocks(W, C, Cout, x.dtype.itemsize,
                             fuse_gn=affine is not None,
                             fuse_res=residual is not None)
    bh = block_rows or abh
    coN = cout_block or acoN
    if Cout % coN:
        # the grid floor-divides Cout: a non-divisor block would silently
        # leave channels [Cout//coN*coN:] as uninitialized output memory
        raise ValueError(f"cout_block={coN} must divide Cout={Cout}")
    # (3, 3C, Cout): contraction index = dx*C + c (lane-concat order)
    wcat = w.reshape(3, 3 * C, Cout)
    bias = jnp.zeros((1, Cout), jnp.float32) if b is None else \
        b.astype(jnp.float32).reshape(1, Cout)

    borderless = (H % bh == 0 and W % 8 == 0 and H // bh >= 2
                  and not env_flag("SDMATTE_CONV_V3"))
    if borderless:
        # v5: x stays unpadded in HBM — the halo is synthesized in-kernel
        # (see _kernel_v5); kills the jnp.pad full-copy residency + traffic
        xp, Hp, Wp = x, H, W
        kern = functools.partial(_kernel_v5, bh=bh, nI=H // bh, nB=B,
                                 W=W, C=C, coN=coN, H=H,
                                 fuse_gn=affine is not None,
                                 fuse_res=residual is not None)
    else:
        Hp = -(-H // bh) * bh          # pad rows to a block multiple
        Wp = -(-(W + 2) // 8) * 8      # window width tileable (sublanes)
        xp = jnp.pad(x, ((0, 0), (1, 1 + (Hp - H)), (1, Wp - W - 1), (0, 0)))
        kern = functools.partial(_kernel, bh=bh, nI=Hp // bh, nB=B,
                                 nCo=Cout // coN, W=W, C=C, coN=coN, H=H,
                                 fuse_gn=affine is not None,
                                 fuse_res=residual is not None)

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),       # stays in HBM
        pl.BlockSpec((3, 3 * C, coN), lambda b, i, co: (0, 0, co)),
        pl.BlockSpec((1, coN), lambda b, i, co: (0, co)),
    ]
    operands = [xp, wcat, bias]
    if affine is not None:
        a, d = affine
        ad = jnp.stack([a, d], axis=1).astype(jnp.float32)   # (B, 2, C)
        in_specs.append(pl.BlockSpec((1, 2, C), lambda b, i, co: (b, 0, 0)))
        operands.append(ad)
    if residual is not None:
        if Hp != H:
            residual = jnp.pad(residual, ((0, 0), (0, Hp - H), (0, 0), (0, 0)))
        in_specs.append(pl.BlockSpec((1, bh, W, coN),
                                     lambda b, i, co: (b, i, 0, co)))
        operands.append(residual)

    out = pl.pallas_call(
        kern,
        grid=(B, Hp // bh, Cout // coN),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, bh, W, coN),
                               lambda b, i, co: (b, i, 0, co)),
        out_shape=jax.ShapeDtypeStruct((B, Hp, W, Cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, bh + 2, W if borderless else Wp, C), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            # all dims sequential: the cross-iteration prefetch assumes
            # linear iteration order
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
    )(*operands)

    return out[:, :H]
