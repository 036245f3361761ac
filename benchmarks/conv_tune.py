"""Autotune the Pallas conv3x3 block sizes per VAE hot shape (v5e).

The _pick_blocks heuristic in ops/conv3x3.py is conservative (its VMEM
accounting double-counts transient buffers the compiler actually manages),
so this sweeps (block_rows, cout_block) on hardware per shape, plus an XLA
int8 conv probe (does lax.conv with int8 operands hit the MXU's 2x int8
path?).  Output: the best config per shape, pasted into ops/dispatch.py.

Run: nohup python -u benchmarks/conv_tune.py > /tmp/conv_tune.log 2>&1 &
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

SHAPES = [
    (2, 1024, 128, 128),
    (2, 512, 256, 256),
    (2, 512, 128, 256),
    (2, 256, 512, 512),
    (2, 256, 256, 512),
    (2, 128, 512, 512),
    (1, 1024, 128, 128),
    (1, 1024, 256, 256),
    (1, 1024, 256, 128),
    (1, 512, 256, 256),
    (1, 512, 512, 256),
    (1, 512, 512, 512),
    (1, 256, 512, 512),
    (1, 128, 512, 512),
]
REPS = 8


def chain(f, out_shape):
    def body(x, w):
        def step(i, acc):
            xi = x * (1.0 + 1e-6 * i.astype(x.dtype))
            return acc + f(xi, w).astype(jnp.float32)
        return jax.jit(lambda: lax.fori_loop(
            0, REPS, step, jnp.zeros(out_shape, jnp.float32)))()
    return jax.jit(body)


def time_call(fj, x, w):
    o = fj(x, w); float(jnp.sum(o[..., :1, :1]))
    t0 = time.perf_counter()
    o = fj(x, w); float(jnp.sum(o[..., :1, :1]))
    return (time.perf_counter() - t0) / REPS


def xla_conv(x, w):
    return lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(jnp.bfloat16)


def xla_conv_int8(xq, wq):
    return lax.conv_general_dilated(
        xq, wq, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)


def main():
    rng = np.random.default_rng(0)
    print("backend:", jax.default_backend(), flush=True)
    best_table = {}
    for b, s, ci, co in SHAPES:
        x = jnp.asarray(rng.standard_normal((b, s, s, ci)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((3, 3, ci, co)) * 0.05, jnp.bfloat16)
        fl = 2 * b * s * s * ci * co * 9
        t_xla = time_call(chain(xla_conv, (b, s, s, co)), x, w)
        print(f"{b}x{s}^2 {ci}->{co}: xla {t_xla*1e3:7.2f} ms "
              f"{fl/t_xla/1e12:5.1f} TF/s", flush=True)

        # --- int8 XLA probe (upper bound: quant cost excluded) -----------
        xq = jnp.asarray(rng.integers(-127, 128, (b, s, s, ci)), jnp.int8)
        wq = jnp.asarray(rng.integers(-127, 128, (3, 3, ci, co)), jnp.int8)
        try:
            f8 = jax.jit(lambda x, w: lax.fori_loop(
                0, REPS, lambda i, acc: acc + xla_conv_int8(x, w),
                jnp.zeros((b, s, s, co), jnp.int32)))
            o = f8(xq, wq); float(jnp.sum(o[..., :1, :1]))
            t0 = time.perf_counter()
            o = f8(xq, wq); float(jnp.sum(o[..., :1, :1]))
            t8 = (time.perf_counter() - t0) / REPS
            print(f"  int8-xla: {t8*1e3:7.2f} ms {fl/t8/1e12:5.1f} TOP/s",
                  flush=True)
        except Exception as e:
            print(f"  int8-xla FAILED: {str(e)[:90]}", flush=True)

        # --- pallas (bh, Wc, coN) sweep -----------------------------------
        from sdmatte_tpu.ops.conv3x3 import _pick_blocks
        auto = _pick_blocks(s, ci, co)
        wc_opts = [c for c in (512, 256, 128) if c <= s and s % c == 0] or [s]
        co_opts = [c for c in (256, 128) if c <= co and co % c == 0] or [co]

        def vmem_est(bh, Wc, coN):
            return (2 * (bh + 2) * Wc * 3 * ci * 2 + 2 * 9 * ci * coN * 2
                    + 2 * bh * Wc * coN * 2 + bh * Wc * coN * 4)

        cands = {auto}
        for bh in (8, 16, 32):
            for Wc in wc_opts[:2]:
                for coN in co_opts:
                    # skip configs sure to OOM scoped VMEM (each failed
                    # Mosaic compile costs minutes via the tunnel)
                    if vmem_est(bh, Wc, coN) <= 15 * 1024 * 1024:
                        cands.add((bh, Wc, coN))
        best = (t_xla, "xla", 0, 0, 0)
        for bh, Wc, coN in sorted(cands):
            try:
                f = chain(lambda x, w, bh=bh, Wc=Wc, coN=coN: conv3x3_same(
                    x, w, block_rows=bh, block_cols=Wc, cout_block=coN),
                    (b, s, s, co))
                t = time_call(f, x, w)
            except Exception as e:
                print(f"  pallas bh={bh} Wc={Wc} coN={coN}: FAIL {str(e)[:60]}",
                      flush=True)
                continue
            mark = " <-" if t < best[0] else ""
            auto_mark = " (auto)" if (bh, Wc, coN) == auto else ""
            print(f"  pallas bh={bh} Wc={Wc} coN={coN}: {t*1e3:7.2f} ms "
                  f"{fl/t/1e12:5.1f} TF/s{mark}{auto_mark}", flush=True)
            if t < best[0]:
                best = (t, "pallas", bh, Wc, coN)
        best_table[(b, s, ci, co)] = (round(t_xla / best[0], 3),) + best[1:]
        print(f"  => best: {best[1]} bh={best[2]} Wc={best[3]} coN={best[4]} "
              f"({t_xla/best[0]:.2f}x vs xla)", flush=True)

    print("\nPALLAS_CONV_WINS = {")
    for (b, s, ci, co), (sp, kind, bh, Wc, coN) in best_table.items():
        if kind == "pallas":
            print(f"    ({b}, {s}, {ci}, {co}): ({sp}, {bh}, {Wc}, {coN}),")
    print("}")


if __name__ == "__main__":
    main()
