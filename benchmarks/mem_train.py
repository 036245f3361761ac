"""Compile-only HBM accounting for the TRAIN step: remat / freezing A/B.

Same trick as mem_analysis.py (buffer assignment without execution), applied
to the fine-tune step so the max-batch story for training is measured, not
guessed:

  * frozen towers (default) vs train-everything — moment buffers + frozen
    backward disappear from the assignment
  * remat=False vs True — U-Net block activations drop out of temp

Usage: mem_train.py [batch] [size] [tiny] [cpu]
Run: nohup python -u benchmarks/mem_train.py 4 512 > /tmp/mem_train.log 2>&1 &
(`cpu` forces the CPU platform IN-PROCESS — the axon plugin ignores
JAX_PLATFORMS=cpu; harness-validation runs shouldn't touch the tunnel.)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp_cache"))

import jax  # noqa: E402

if "cpu" in sys.argv[1:]:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from sdmatte_tpu.configs import SDMatteConfig  # noqa: E402
from sdmatte_tpu.models import sdmatte  # noqa: E402
from sdmatte_tpu.parallel import train as ptrain  # noqa: E402

_pos = [a for a in sys.argv[1:] if a not in ("tiny", "cpu")]
BATCH = int(_pos[0]) if _pos else 4
SIZE = int(_pos[1]) if len(_pos) > 1 else 512
TINY = "tiny" in sys.argv[1:]


def report(label, compiled):
    ma = compiled.memory_analysis()
    gb = 1 << 30
    tot = (ma.argument_size_in_bytes + ma.output_size_in_bytes
           + ma.temp_size_in_bytes - ma.alias_size_in_bytes)
    print(f"{label:28s} arg {ma.argument_size_in_bytes/gb:6.2f} G  "
          f"out {ma.output_size_in_bytes/gb:6.2f} G  "
          f"temp {ma.temp_size_in_bytes/gb:6.2f} G  "
          f"total {tot/gb:6.2f} G", flush=True)
    return tot


def main():
    print(f"backend={jax.default_backend()} b={BATCH} s={SIZE} tiny={TINY}",
          flush=True)
    cfg = SDMatteConfig.tiny() if TINY else SDMatteConfig()
    params = sdmatte.init(cfg, seed=0)
    p_shapes = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), params)

    batch = {
        "image": jax.ShapeDtypeStruct((BATCH, SIZE, SIZE, 3), jnp.float32),
        "trimap": jax.ShapeDtypeStruct((BATCH, SIZE, SIZE, 1), jnp.float32),
        "trimap_coords": jax.ShapeDtypeStruct((BATCH, 4), jnp.float32),
        "is_trans": jax.ShapeDtypeStruct((BATCH,), jnp.float32),
        "alpha_gt": jax.ShapeDtypeStruct((BATCH, SIZE, SIZE, 1), jnp.float32),
    }

    totals = {}
    for frozen in (ptrain.FROZEN_TOWERS, ()):
        tx, opt = ptrain.init_train_state(params, 1e-5, frozen=frozen)
        o_shapes = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.result_type(x)),
            opt)
        for remat in (False, True):
            label = (f"frozen={'on' if frozen else 'off'} "
                     f"remat={'on' if remat else 'off'}")
            fn = jax.jit(lambda p, o, b, _f=frozen, _r=remat, _tx=tx:
                         ptrain.train_step(p, o, b, cfg=cfg, tx=_tx,
                                           frozen=_f, remat=_r))
            try:
                compiled = fn.lower(p_shapes, o_shapes, batch).compile()
            except Exception as e:  # OOM at buffer assignment IS a datum
                msg = str(e)
                if "RESOURCE_EXHAUSTED" in msg or "exceeds" in msg.lower():
                    print(f"{label:28s} compile failed (HBM OOM): "
                          f"{msg[:160]}", flush=True)
                    continue
                # anything else (tracing bug, toolchain error) is NOT an OOM
                # datum — surface it loudly instead of mislabeling it
                print(f"{label:28s} compile failed (UNEXPECTED, not OOM): "
                      f"{msg[:400]}", flush=True)
                raise
            totals[label] = report(label, compiled)

    base = totals.get("frozen=off remat=off")
    best = totals.get("frozen=on remat=on")
    if base and best:
        print(f"\nfrozen+remat vs train-everything: {best/base:.2f}x "
              f"of the baseline footprint", flush=True)


if __name__ == "__main__":
    main()
