"""Split rgb/aux VAE encode + int8 weight storage: the b>8 attempt, round 2.

ab_wstore.py found the b>8 binding constraint: THREE concurrent
bf16[2B,1024,1024,128] encoder stage-0 buffers (6.00 GB each at concat
batch 18, incl. 1.3x batch-dim padding) — weights were never the problem.
Splitting the encode into two sequential per-input passes halves the
per-pass batch (sdmatte.forward vae_encode_split).  This probes, with int8
weight storage + split encode:

  phase 1: compile-only buffer assignment at b = 9/10/12/16
  phase 2: timed mattes/s at the batches that fit, bracketed by the b=8
           concat baseline

Run: nohup python -u benchmarks/ab_split.py > /tmp/ab_split.log 2>&1 &
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp_cache"))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from sdmatte_tpu.configs import SDMatteConfig  # noqa: E402
from sdmatte_tpu.core.dtypes import BF16  # noqa: E402
from sdmatte_tpu.models import sdmatte  # noqa: E402
from sdmatte_tpu.ops.quant import compress_tree_int8  # noqa: E402
from sdmatte_tpu.pipeline import MattingPipeline  # noqa: E402
from ab_bigbatch import bench  # noqa: E402

GB = 1 << 30
HBM = 16 * GB


def main():
    print("backend:", jax.default_backend(), flush=True)
    cfg = SDMatteConfig()
    host = sdmatte.init(cfg, seed=0)

    def cast_fp(tree):
        return jax.tree_util.tree_map(
            lambda x: np.asarray(x, np.float32).astype(jnp.bfloat16), tree)
    i8_tree = {"vae": compress_tree_int8(cast_fp(host["vae"])),
               "unet": compress_tree_int8(cast_fp(host["unet"])),
               "text_encoder": {}}
    st = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), i8_tree)

    def heavy(params, img, pm, coords, is_trans):
        data = {"image": img, "trimap": pm, "trimap_coords": coords,
                "is_trans": is_trans}
        return sdmatte.forward(params, cfg, data, aux_input_type="trimap",
                               policy=BF16, attn_impl="flash",
                               vae_encode_split=True
                               ).astype(jnp.float32)[..., 0]

    s = 1024
    fits = {}
    for batch in (9, 10, 12, 16):
        args = (
            jax.ShapeDtypeStruct((batch, s, s, 3), jnp.bfloat16),
            jax.ShapeDtypeStruct((batch, s, s, 1), jnp.bfloat16),
            jax.ShapeDtypeStruct((batch, 4), jnp.float32),
            jax.ShapeDtypeStruct((batch,), jnp.float32),
        )
        try:
            c = jax.jit(heavy).lower(st, *args).compile()
            ma = c.memory_analysis()
            tot = (ma.argument_size_in_bytes + ma.output_size_in_bytes
                   + ma.temp_size_in_bytes - ma.alias_size_in_bytes)
            fits[batch] = tot <= HBM
            print(f"int8+split b={batch:2d}: args "
                  f"{ma.argument_size_in_bytes/GB:5.2f} temps "
                  f"{ma.temp_size_in_bytes/GB:5.2f} total {tot/GB:5.2f} G  "
                  f"{'FITS' if fits[batch] else 'OOM'}", flush=True)
        except Exception as e:
            fits[batch] = False
            msg = str(e)
            line = next((l for l in msg.splitlines()
                         if "Size:" in l or "exceeds" in l.lower()), msg[:100])
            print(f"int8+split b={batch:2d}: compile FAIL ({line.strip()})",
                  flush=True)
        jax.clear_caches()

    cases = [(8, None, None)]                       # concat fp baseline
    cases += [(b, "int8", True) for b in (9, 10, 12, 16) if fits.get(b)]
    cases += [(8, None, None)]
    for batch, storage, split in cases:
        pipe = MattingPipeline(host, cfg, policy=BF16, attn_impl="auto",
                               weight_storage=storage or "fp",
                               vae_encode_split=split)
        try:
            t = bench(pipe, batch)
        except Exception as e:
            print(f"timed b={batch:2d} ({storage or 'fp'},"
                  f"split={bool(split)}): FAIL {str(e)[-110:]}", flush=True)
            del pipe
            jax.clear_caches()
            continue
        print(f"timed b={batch:2d} ({storage or 'fp'},split={bool(split)}): "
              f"{t*1e3:8.1f} ms  {batch/t:6.3f} mattes/s", flush=True)
        del pipe
        jax.clear_caches()


if __name__ == "__main__":
    main()
