"""Measured kernel dispatch: per-shape winner table for the 3x3 conv.

XLA's native conv sustains 60-165 TF/s on the VAE's hot shapes (true rates
after overhead correction, benchmarks/conv_clean.py), and the VAE is where
most of the matte's FLOPs live (docs/ARCHITECTURE.md) — so conv is the one
op where the hand kernel (ops/conv3x3.py, implicit GEMM with K-concat
im2col) is dispatched per shape when it measured faster on hardware.

The table below is GENERATED from benchmarks/conv_clean.py runs on a real
v5e chip (self-feeding chains, dispatch overhead subtracted).  Entries map
exact (batch, spatial, cin, cout) shapes to (measured speedup over XLA,
block_rows, cout_block); anything not listed falls back to XLA.
Interpolation is deliberately avoided: conv performance on TPU is not
monotone in shape, a config that wins one shape OOMs scoped VMEM on
another, and a mispredicted dispatch is a silent regression.

The reference has no analogue — its conv choice is whatever cuDNN picks
(torch conv2d inside diffusers blocks).
"""

from __future__ import annotations

import contextvars
import os

import jax

from ..utils.env import env_flag

# (batch, spatial, cin, cout) ->
#     (speedup vs XLA, block_rows, cout_block, fuse_gn, fuse_residual).
# fuse_gn / fuse_residual: whether the GroupNorm-affine+SiLU prologue /
# residual epilogue fusions (ops/conv3x3.py) should ride this dispatch.
# Measured, not modeled — the fp32 affine window temp OOMs the 16 MB
# scoped-VMEM limit at C>=256, and where it compiles it only wins at
# 1024²x128 (benchmarks/fused_tune.py, resnet-pattern chains); residual
# fusion never won.
#
# History of the table (all on TPU v5e, bf16):
#   * bare-conv chains (benchmarks/conv_clean.py, overhead-corrected)
#     produced the original candidates; validated IN-GRAPH by
#     benchmarks/ab_conv.py same-session A/B: full VAE encode
#     190.6 -> 139.5 ms (1.37x) — kept.
#   * decoder (b=1) entries: despite isolated wins up to 2.03x, ANY pallas
#     conv inside the real decode graph made it ~2x SLOWER (118.5 ->
#     231 ms; a single 3-conv entry cost +79 ms).  HLO diff shows why: XLA
#     runs the whole decoder in a row-blocked internal form
#     (f32[1024,8,129,128]{3,1,2,0} convolutions, zero full-size NHWC
#     materializations), and every custom-call boundary forces the stage
#     back to NHWC — dozens of 256 MB relayouts.  The decoder therefore
#     stays pure XLA.  (The b=2 encoder graph does not get that blocked
#     form — presumably the asymmetric-padding downsamples block it — so
#     pallas wins there.)
#   * resnet-pattern chains (benchmarks/fused_tune.py, 2026-08-16: the
#     gn+silu+conv+residual composite, i.e. what the VAE actually runs):
#     1024²x128 xla 12.71 / conv 8.84 / fused-gn 8.26 ms -> fgn dispatched;
#     512²x256 conv wins 1.35x, 256²x512 conv wins 1.24x (fgn OOMs both);
#     128²x512 is a wash in-context (0.87 vs 0.87 ms) -> entry dropped.
# Entry value: (speedup, block_rows, cout_block, fuse_gn, fuse_residual,
#               csplit) where csplit 0 = direct kernel, 1 = input-channel
# split (halo window halved for shapes whose window exceeds scoped VMEM),
# 2 = split with the cross-pass sum fused into the residual epilogue.
PALLAS_CONV_WINS: dict[tuple[int, int, int, int],
                       tuple[float, int, int, bool, bool, int]] = {
    (2, 1024, 128, 128): (1.54, 8, 128, True, False, 0),
    (2, 512, 256, 256): (1.35, 8, 128, False, False, 0),
    (2, 256, 512, 512): (1.24, 8, 128, False, False, 0),
    # mixed-channel pairs (measured as ci->co->ci chains)
    (2, 512, 128, 256): (1.13, 8, 128, False, False, 0),
    (2, 512, 256, 128): (1.13, 8, 128, False, False, 0),
    # encoder shapes of the other four inference sizes (512/640/768/896px),
    # RE-TUNED on the v5 borderless-DMA kernel (benchmarks/fused_tune.py
    # 2026-08-17 — kernel changes shift the scoped-VMEM envelope: the
    # v3-era (2,384,·) fgn/coN=256 entry OOM'd scoped VMEM by 88 KB under
    # v5 and broke the 768px compile).  Under v5 the 128-ch shapes keep
    # gn(+res) fusion with better speedups; the 256-ch shapes' fusion
    # configs exceed scoped VMEM, so they dispatch the bare conv.
    (2, 512, 128, 128): (2.44, 8, 128, True, True, 0),
    (2, 256, 256, 256): (2.24, 8, 256, False, False, 0),
    (2, 640, 128, 128): (2.30, 8, 128, True, True, 0),
    (2, 320, 256, 256): (1.83, 8, 128, False, False, 0),
    (2, 768, 128, 128): (2.17, 8, 128, True, True, 0),
    (2, 384, 256, 256): (1.76, 8, 256, False, False, 0),
    (2, 896, 128, 128): (1.85, 8, 128, True, False, 0),
    (2, 448, 256, 256): (1.53, 8, 128, False, False, 0),
}

_MIN_SPEEDUP = 1.05  # dispatch only on a clear win

# --- raised scoped-VMEM tier (2026-08-19) ---------------------------------
# The default ~16 MB scoped-VMEM limit is an XLA *assumption*, not a
# hardware bound; the PJRT per-compile option below raises it (channel
# verified honored by the remote compiler — benchmarks/ab_xla_flags.py:
# a 4 MB limit slows decode 8%, an unknown option errors remotely, and
# XLA-only graphs measure +-2% across 32/64/128 MB, i.e. raising it is
# free for XLA while unlocking fused Pallas configs whose fp32 affine
# window temps exceed 16 MB at C>=256).  Entries here are dispatched ONLY
# while a `model_jit` graph is tracing, because their kernels fail to
# compile at the default limit — a raw `jax.jit` of model code never sees
# them.  Measured (benchmarks/fused_tune.py, SVMEM_KIB=65536, 2026-08-19):
#   2x512^2 256ch: fgnres bh=8  4.83 ms vs dispatched conv 5.23 / xla 7.78
#   2x256^2 512ch: fgnres bh=16 4.13 ms vs dispatched conv 4.30 / xla 6.32
# The all-Pallas gn+res fused, csplit-free DECODE was also re-A/B'd under
# 64 MB: 155 ms vs XLA 112-117 ms (0.72x) — the decoder stays XLA even
# with every VMEM constraint removed (ab_dec_pallas.py TAGS=...fgn_all).
# IN-GRAPH (benchmarks/ab_svmem_encode.py, twice-interleaved b=2 1024px
# encode): overlay vs base 1.006x — the chain-level ~1.7 ms washes out in
# context, as chain wins at these sizes often do.  Kept because it never
# measured worse and the per-shape kernels beat XLA decisively in chains;
# the option itself (svopt variant) is also in-graph neutral.
SCOPED_VMEM_KIB = 65536
PALLAS_CONV_WINS_SVMEM: dict[tuple[int, int, int, int],
                             tuple[float, int, int, bool, bool, int]] = {
    (2, 512, 256, 256): (1.61, 8, 128, True, True, 0),
    (2, 256, 512, 512): (1.53, 16, 128, True, True, 0),
}
# ContextVar, not a module global: serve.py traces on a ThreadingHTTPServer
# worker while the batcher thread may trace too — a raw jax.jit trace
# concurrent with a model_jit trace must never pick up overlay entries whose
# kernels only compile at the raised limit (ADVICE r4).
_SVMEM_TRACING: contextvars.ContextVar[bool] = contextvars.ContextVar(
    "sdmatte_svmem_tracing", default=False)


def _svmem_enabled() -> bool:
    return (not env_flag("SDMATTE_NO_SVMEM")
            and jax.default_backend() == "tpu")


def model_jit(fn, **jit_kwargs):
    """jax.jit for first-party model graphs.

    On TPU, compiles with the raised scoped-VMEM limit and — only while
    this graph is tracing — activates the PALLAS_CONV_WINS_SVMEM overlay
    entries whose fused kernels need that limit.  On CPU (or with
    SDMATTE_NO_SVMEM=1, the A/B escape hatch) it is exactly jax.jit, and
    user code that jits model functions directly never sees the overlay,
    so it can never hit a scoped-VMEM compile failure.
    """
    if not _svmem_enabled():
        return jax.jit(fn, **jit_kwargs)

    def traced(*args, **kwargs):
        token = _SVMEM_TRACING.set(True)
        try:
            return fn(*args, **kwargs)
        finally:
            _SVMEM_TRACING.reset(token)

    return jax.jit(
        traced,
        compiler_options={"xla_tpu_scoped_vmem_limit_kib":
                          str(SCOPED_VMEM_KIB)},
        **jit_kwargs)

# The v3 kernel's host-side halo pad (jnp.pad) materializes a second
# full-size copy of the activation that XLA cannot fuse into the custom
# call.  Fine at b<=2 (<=0.6 GiB), fatal inside the b=8 throughput graph:
# injecting the (16,1024,128,128) entry OOM'd 16 GB HBM at buffer
# assignment, and routing the kernel through lax.map batch groups measured
# 0.52x vs XLA (serialized groups; benchmarks/ab_enc_batch.py, 2026-08-17).
# The v5 borderless-DMA kernel (ops/conv3x3.py) has NO pad copy, so the
# residency veto applies only to shapes that would fall back to v3.
_PAD_RESIDENCY_LIMIT = int(2.6 * (1 << 30))


def pallas_conv3x3_config(b: int, h: int, w: int, cin: int, cout: int,
                          *, stride: int = 1, dtype_ok: bool = True):
    """(block_rows, cout_block, fuse_gn, fuse_residual, csplit) when the
    Pallas kernel should take this shape, else None."""
    if env_flag("SDMATTE_NO_PALLAS_CONV"):   # A/B + escape hatch
        return None
    if stride != 1 or not dtype_ok or h != w:
        return None
    entry0 = (_SVMEM_TRACING.get()
              and PALLAS_CONV_WINS_SVMEM.get((b, h, cin, cout))) \
        or PALLAS_CONV_WINS.get((b, h, cin, cout))
    br = entry0[1] if entry0 else 8
    borderless_ok = (h % br == 0 and w % 8 == 0 and h // br >= 2
                     and not env_flag("SDMATTE_CONV_V3"))
    if not borderless_ok and b * h * w * cin * 2 > _PAD_RESIDENCY_LIMIT:
        return None
    if jax.default_backend() != "tpu":
        return None
    entry = entry0
    if entry is None or entry[0] < _MIN_SPEEDUP:
        return None
    only = os.environ.get("SDMATTE_PALLAS_ONLY")   # bisection aid:
    if only:                                        # "b,s,ci,co;b,s,ci,co"
        allowed = {tuple(int(v) for v in item.split(","))
                   for item in only.split(";") if item}
        if (b, h, cin, cout) not in allowed:
            return None
    return entry[1:]
