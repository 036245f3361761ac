"""Autotune the FUSED gn+silu+conv(+residual) Pallas path per table shape.

The dispatch table's block configs were measured for the bare conv; the
fused variants add VMEM operands (fp32 affine temp, residual blocks) whose
scoped-stack cost Mosaic accounts in ways no host-side model predicts
reliably (observed: same-model estimates off by -40%/+30% across shapes).
So: measure.  For each encoder-dispatched shape this times, as self-feeding
in-graph chains (see conv_clean.py for the methodology):

  xla     silu(gn(y)) -> XLA conv -> +res           (the unfused baseline)
  conv    silu(gn(y)) -> pallas conv -> +res        (round-2 dispatch today)
  fgn     gn stats -> pallas[affine+silu fused] -> +res
  fgnres  gn stats -> pallas[affine+silu+res fused]

over candidate (block_rows, cout_block); OOM configs are caught and
skipped.  Emits the winner per shape in dispatch-table form.

SVMEM_KIB env var (2026-08-19): when set, every candidate compiles with
PJRT ``compiler_options={"xla_tpu_scoped_vmem_limit_kib": SVMEM_KIB}`` —
the verified-honored remote channel (benchmarks/ab_xla_flags.py).  The
fgn/fgnres C>=256 negatives in the dispatch table were all measured under
the default ~16 MB scoped-VMEM limit; this knob re-opens them.  Raised
limits also unlock block_rows=32 candidates.

Run: nohup python -u benchmarks/fused_tune.py > /tmp/fused_tune.log 2>&1 &
     SVMEM_KIB=65536 python -u benchmarks/fused_tune.py 2,512,256 2,256,512
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp_cache"))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

from sdmatte_tpu.ops.conv3x3 import conv3x3_same  # noqa: E402

# encoder-dispatched equal-channel shapes (batch, spatial, ch);
# override via argv: fused_tune.py b,s,c [b,s,c ...]
SHAPES = [
    (2, 1024, 128),
    (2, 512, 256),
    (2, 256, 512),
    (2, 128, 512),
]
if len(sys.argv) > 1:
    SHAPES = [tuple(int(v) for v in arg.split(",")) for arg in sys.argv[1:]]
REPS = 24

SVMEM_KIB = os.environ.get("SVMEM_KIB")
COMPILER_OPTIONS = (
    {"xla_tpu_scoped_vmem_limit_kib": SVMEM_KIB} if SVMEM_KIB else None)


def jit(f):
    return jax.jit(f, compiler_options=COMPILER_OPTIONS)


def measure_overhead():
    x = jnp.ones((8, 128), jnp.float32)
    f = jax.jit(lambda x: x * 2.0)
    o = f(x); float(jnp.sum(o))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter(); o = f(x); float(jnp.sum(o))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def timed(f, overhead=0.0):
    o = f(); float(jnp.sum(o[..., :1, :1]))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter(); o = f(); float(jnp.sum(o[..., :1, :1]))
        ts.append(time.perf_counter() - t0)
    return (float(np.median(ts)) - overhead) / REPS


def gn_like(y, a, d):
    """Stand-in for the norm apply+silu (stats path constant-folded out:
    a, d are precomputed — exactly what group_norm_stats hands the kernel)."""
    yf = y.astype(jnp.float32) * a[:, None, None] + d[:, None, None]
    return (yf * jax.nn.sigmoid(yf)).astype(y.dtype)


def main():
    rng = np.random.default_rng(0)
    print("backend:", jax.default_backend(), flush=True)
    for b, s, c in SHAPES:
        oh = measure_overhead()   # fresh per shape: tunnel load drifts
        print(f"per-call overhead: {oh*1e3:.1f} ms", flush=True)
        x = jnp.asarray(rng.standard_normal((b, s, s, c)) * 0.1, jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((3, 3, c, c)) * 0.02, jnp.bfloat16)
        a = jnp.asarray(rng.uniform(0.8, 1.2, (b, c)), jnp.float32)
        d = jnp.asarray(rng.uniform(-0.1, 0.1, (b, c)), jnp.float32)
        fl = 2 * b * s * s * c * c * 9

        def xla_step(y):
            h = lax.conv_general_dilated(
                gn_like(y, a, d), w, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32).astype(jnp.bfloat16)
            return (h + y).astype(jnp.bfloat16) * 0.7

        fx = jit(lambda x: lax.fori_loop(0, REPS, lambda i, y: xla_step(y), x))
        t_xla = timed(lambda: fx(x), overhead=oh)
        print(f"{b}x{s}^2 {c}ch: xla {t_xla*1e3:6.2f} ms "
              f"{fl/t_xla/1e12:6.1f} TF/s", flush=True)
        best = (t_xla, "xla", 0, 0)

        co_list = [coN for coN in (128, 256) if coN <= c and c % coN == 0] \
            or [c]   # 320ch (U-Net stage-0): no 128-divisor, tile whole Cout
        bh_list = (8, 16, 32) if SVMEM_KIB else (8, 16)
        # BH/CON/MODES env filters: each remote Mosaic compile is minutes,
        # so targeted sweeps restrict the candidate grid.
        if os.environ.get("BH"):
            bh_list = tuple(int(v) for v in os.environ["BH"].split(","))
        if os.environ.get("CON"):
            co_list = [int(v) for v in os.environ["CON"].split(",")
                       if int(v) <= c]
        modes = tuple((os.environ.get("MODES") or "conv,fgn,fgnres")
                      .split(","))
        cands = [(bh, coN) for bh in bh_list for coN in co_list]
        for bh, coN in cands:
            for mode in modes:
                def step(y, mode=mode, bh=bh, coN=coN):
                    if mode == "conv":
                        h = conv3x3_same(gn_like(y, a, d), w,
                                         block_rows=bh, cout_block=coN)
                        h = h + y
                    elif mode == "fgn":
                        h = conv3x3_same(y, w, affine=(a, d),
                                         block_rows=bh, cout_block=coN)
                        h = h + y
                    else:
                        h = conv3x3_same(y, w, affine=(a, d), residual=y,
                                         block_rows=bh, cout_block=coN)
                    return h * 0.7
                fj = jit(lambda x, step=step: lax.fori_loop(
                    0, REPS, lambda i, y: step(y), x))
                try:
                    t = timed(lambda: fj(x), overhead=oh)
                except Exception as e:
                    print(f"    {mode:6s} bh={bh} coN={coN}: FAIL "
                          f"{str(e)[-160:]}", flush=True)
                    continue
                mark = " <-" if t < best[0] else ""
                print(f"    {mode:6s} bh={bh} coN={coN}: {t*1e3:6.2f} ms "
                      f"{fl/t/1e12:6.1f} TF/s{mark}", flush=True)
                if t < best[0]:
                    best = (t, mode, bh, coN)
        print(f"  => {best[1]} bh={best[2]} coN={best[3]} "
              f"({t_xla/best[0]:.2f}x vs xla)", flush=True)


if __name__ == "__main__":
    main()
