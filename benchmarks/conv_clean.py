"""Clean per-conv timing: XLA native vs Pallas v3, overhead-corrected.

Methodology (the two traps earlier harnesses fell into, see git history):
  * every dispatch+fetch through the dev tunnel costs ~32 ms flat — so each
    shape is timed as a SELF-FEEDING in-graph chain y = conv(y, w) of
    REPS=32 steps (no CSE possible, no extra elementwise work, no fp32
    accumulator traffic), and the measured per-call overhead (trivial-graph
    dispatch+fetch, measured fresh each run) is subtracted.
  * equal-channel shapes self-feed directly; mixed-channel shapes run as
    ci->co->ci pairs and report the pair average.

Emits the PALLAS_CONV_WINS table for ops/dispatch.py.

Run: nohup python -u benchmarks/conv_clean.py > /tmp/conv_clean.log 2>&1 &
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

from sdmatte_tpu.ops.conv3x3 import conv3x3_same, _pick_blocks  # noqa: E402

# equal-channel hot shapes (batch, spatial, ch) — the VAE's dominant time
EQ_SHAPES = [
    (2, 1024, 128),
    (2, 512, 256),
    (2, 256, 512),
    (2, 128, 512),
    (1, 1024, 128),
    (1, 1024, 256),   # decoder upsample conv
    (1, 512, 256),
    (1, 512, 512),    # decoder stage-1->2 upsample conv
    (1, 256, 512),
    (1, 128, 512),
]
# mixed-channel pairs (batch, spatial, ci, co): timed as ci->co->ci
MIX_SHAPES = [
    (2, 512, 128, 256),
    (2, 256, 256, 512),
    (1, 1024, 256, 128),
    (1, 512, 512, 256),
]
REPS = 32


def measure_overhead():
    x = jnp.ones((8, 128), jnp.float32)
    f = jax.jit(lambda x: x * 2.0)
    o = f(x); float(jnp.sum(o))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter(); o = f(x); float(jnp.sum(o))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def timed(f, *args, overhead=0.0, n_convs=REPS):
    o = f(*args); float(jnp.sum(o[..., :1, :1]))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter(); o = f(*args); float(jnp.sum(o[..., :1, :1]))
        ts.append(time.perf_counter() - t0)
    return (float(np.median(ts)) - overhead) / n_convs


def main():
    rng = np.random.default_rng(0)
    print("backend:", jax.default_backend(), flush=True)
    oh = measure_overhead()
    print(f"per-call overhead: {oh*1e3:.1f} ms", flush=True)
    table = {}

    def sweep_pallas(xla_t, b, s, ci, co, make_chain):
        cands = {_pick_blocks(s, ci, co)}
        for bh in (8, 16, 32):
            # pairs run both directions with one config: coN must divide
            # both channel counts
            for coN in ([c for c in (256, 128)
                         if c <= min(ci, co) and co % c == 0 and ci % c == 0]
                        or [co]):
                wp = -(-(s + 2) // 8) * 8
                vm = (2 * (bh + 2) * wp * ci * 2 + 2 * 9 * ci * coN * 2
                      + 2 * bh * s * coN * 2 + bh * s * coN * 4
                      + bh * s * 3 * ci * 2)
                if vm <= 15.5 * 1024 * 1024:
                    cands.add((bh, coN))
        best = (xla_t, "xla", 0, 0)
        for bh, coN in sorted(cands):
            try:
                t = timed(make_chain(bh, coN), overhead=oh)
            except Exception as e:
                print(f"    pallas bh={bh} coN={coN}: FAIL {str(e)[:60]}",
                      flush=True)
                continue
            fl = 2 * b * s * s * ci * co * 9
            mark = " <-" if t < best[0] else ""
            print(f"    pallas bh={bh} coN={coN}: {t*1e3:6.2f} ms "
                  f"{fl/t/1e12:6.1f} TF/s{mark}", flush=True)
            if t < best[0]:
                best = (t, "pallas", bh, coN)
        return best

    for b, s, c in EQ_SHAPES:
        x = jnp.asarray(rng.standard_normal((b, s, s, c)) * 0.1, jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((3, 3, c, c)) * 0.05, jnp.bfloat16)
        fl = 2 * b * s * s * c * c * 9

        def xla_chain(x, w):
            return lax.fori_loop(0, REPS, lambda i, y: lax.conv_general_dilated(
                y, w, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32).astype(jnp.bfloat16), x)

        t_xla = timed(jax.jit(xla_chain), x, w, overhead=oh)
        print(f"{b}x{s}^2 {c}ch: xla {t_xla*1e3:6.2f} ms "
              f"{fl/t_xla/1e12:6.1f} TF/s", flush=True)

        def mk(bh, coN, x=x, w=w):
            fj = jax.jit(lambda x, w: lax.fori_loop(
                0, REPS, lambda i, y: conv3x3_same(
                    y, w, block_rows=bh, cout_block=coN), x))
            return lambda: fj(x, w)

        best = sweep_pallas(t_xla, b, s, c, c, mk)
        table[(b, s, c, c)] = (round(t_xla / best[0], 3),) + best[1:]
        print(f"  => {best[1]} bh={best[2]} coN={best[3]} "
              f"({t_xla/best[0]:.2f}x)", flush=True)

    for b, s, ci, co in MIX_SHAPES:
        x = jnp.asarray(rng.standard_normal((b, s, s, ci)) * 0.1, jnp.bfloat16)
        w1 = jnp.asarray(rng.standard_normal((3, 3, ci, co)) * 0.05, jnp.bfloat16)
        w2 = jnp.asarray(rng.standard_normal((3, 3, co, ci)) * 0.05, jnp.bfloat16)
        fl = b * s * s * ci * co * 9 * 2  # average of the pair

        def xla_pair(x, w1, w2):
            def step(i, y):
                h = lax.conv_general_dilated(
                    y, w1, (1, 1), [(1, 1), (1, 1)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.float32).astype(jnp.bfloat16)
                return lax.conv_general_dilated(
                    h, w2, (1, 1), [(1, 1), (1, 1)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.float32).astype(jnp.bfloat16)
            return lax.fori_loop(0, REPS // 2, step, x)

        t_xla = timed(jax.jit(xla_pair), x, w1, w2, overhead=oh)
        print(f"{b}x{s}^2 {ci}<->{co}: xla {t_xla*1e3:6.2f} ms "
              f"{fl/t_xla/1e12:6.1f} TF/s (pair avg)", flush=True)

        def mkp(bh, coN, x=x, w1=w1, w2=w2):
            def chain(x, w1, w2):
                def step(i, y):
                    h = conv3x3_same(y, w1, block_rows=bh, cout_block=coN)
                    return conv3x3_same(h, w2, block_rows=bh, cout_block=coN)
                return lax.fori_loop(0, REPS // 2, step, x)
            fj = jax.jit(chain)
            return lambda: fj(x, w1, w2)

        best = sweep_pallas(t_xla, b, s, ci, co, mkp)
        table[(b, s, ci, co)] = (round(t_xla / best[0], 3),) + best[1:]
        table[(b, s, co, ci)] = table[(b, s, ci, co)]
        print(f"  => {best[1]} bh={best[2]} coN={best[3]} "
              f"({t_xla/best[0]:.2f}x)", flush=True)

    print("\nPALLAS_CONV_WINS = {", flush=True)
    for (b, s, ci, co), (sp, kind, bh, coN) in sorted(table.items()):
        if kind == "pallas":
            print(f"    ({b}, {s}, {ci}, {co}): ({sp}, {bh}, {coN}),")
    print("}")


if __name__ == "__main__":
    main()
