"""Compile-only HBM accounting for the heavy graph at a given batch/chunk.

`.lower().compile().memory_analysis()` reports XLA's buffer assignment
without ever executing — the honest way to see WHAT holds HBM at batches
that OOM (running them just crashes), and to iterate on donation/remat
without burning 10-minute failure cycles.

Usage: mem_analysis.py [batch] [chunk|none] [donate]
Run: nohup python -u benchmarks/mem_analysis.py 12 4 > /tmp/mem12.log 2>&1 &
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp_cache"))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from sdmatte_tpu.configs import SDMatteConfig  # noqa: E402
from sdmatte_tpu.core.dtypes import BF16  # noqa: E402
from sdmatte_tpu.models import sdmatte  # noqa: E402

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 12
CHUNK = None if len(sys.argv) < 3 or sys.argv[2] == "none" else int(sys.argv[2])
DONATE = len(sys.argv) > 3 and sys.argv[3] == "donate"


def main():
    print(f"backend={jax.default_backend()} b={BATCH} chunk={CHUNK} "
          f"donate={DONATE}", flush=True)
    cfg = SDMatteConfig()
    params = jax.tree_util.tree_map(
        lambda x: jnp.asarray(x, BF16.param_dtype), sdmatte.init(cfg, seed=0))

    def heavy(params, img, pm, coords, is_trans):
        data = {"image": img, "trimap": pm, "trimap_coords": coords,
                "is_trans": is_trans}
        return sdmatte.forward(params, cfg, data, aux_input_type="trimap",
                               policy=BF16, attn_impl="flash",
                               vae_chunk=CHUNK).astype(jnp.float32)[..., 0]

    s = 1024
    args = (
        jax.ShapeDtypeStruct((BATCH, s, s, 3), jnp.bfloat16),
        jax.ShapeDtypeStruct((BATCH, s, s, 1), jnp.bfloat16),
        jax.ShapeDtypeStruct((BATCH, 4), jnp.float32),
        jax.ShapeDtypeStruct((BATCH,), jnp.float32),
    )
    fn = jax.jit(heavy, donate_argnums=(1, 2) if DONATE else ())
    compiled = fn.lower(params, *args).compile()
    ma = compiled.memory_analysis()
    gb = 1 << 30
    print(f"argument {ma.argument_size_in_bytes/gb:.2f} G  "
          f"output {ma.output_size_in_bytes/gb:.2f} G  "
          f"temp {ma.temp_size_in_bytes/gb:.2f} G  "
          f"alias {ma.alias_size_in_bytes/gb:.2f} G", flush=True)
    tot = (ma.argument_size_in_bytes + ma.output_size_in_bytes
           + ma.temp_size_in_bytes - ma.alias_size_in_bytes)
    print(f"peak-ish total {tot/gb:.2f} G (chip HBM 16 G)", flush=True)


if __name__ == "__main__":
    main()
