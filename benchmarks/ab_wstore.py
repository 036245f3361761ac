"""int8 weight STORAGE (bf16 compute): does freed HBM buy batch slots?

VERDICT r3 item 2: the b=9/10 OOM probes (ab_b10.py) ran with the full
2.6 GB bf16 weight tree resident.  Two residency cuts since:
  * int8 storage for the unet+vae kernels (ops/quant.compress_tree_int8,
    dequantized at use by core/nn.kernel_of) — ~0.95 GB freed
  * the unused CLIP text tower is no longer staged under all-aux gating
    (pipeline/matting.py) — ~0.68 GB freed

Phase 1 lowers the heavy graph compile-only per (storage, batch) and prints
XLA's buffer assignment (no execution, no H2D — params enter as
ShapeDtypeStructs), so OOM batches cost seconds, not 10-minute crashes.
Phase 2 times the full pipeline at the batches phase 1 says fit.

Run: nohup python -u benchmarks/ab_wstore.py > /tmp/ab_wstore.log 2>&1 &
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

from sdmatte_tpu.configs import SDMatteConfig  # noqa: E402
from sdmatte_tpu.core.dtypes import BF16  # noqa: E402
from sdmatte_tpu.models import sdmatte  # noqa: E402
from sdmatte_tpu.ops.quant import compress_tree_int8  # noqa: E402
from sdmatte_tpu.pipeline import MattingPipeline  # noqa: E402
from ab_bigbatch import bench  # noqa: E402

GB = 1 << 30
HBM = 16 * GB


def struct_tree(tree):
    return jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), tree)


def lower_heavy(cfg, params_struct, batch, size=1024):
    def heavy(params, img, pm, coords, is_trans):
        data = {"image": img, "trimap": pm, "trimap_coords": coords,
                "is_trans": is_trans}
        return sdmatte.forward(params, cfg, data, aux_input_type="trimap",
                               policy=BF16, attn_impl="flash"
                               ).astype(jnp.float32)[..., 0]
    args = (
        jax.ShapeDtypeStruct((batch, size, size, 3), jnp.bfloat16),
        jax.ShapeDtypeStruct((batch, size, size, 1), jnp.bfloat16),
        jax.ShapeDtypeStruct((batch, 4), jnp.float32),
        jax.ShapeDtypeStruct((batch,), jnp.float32),
    )
    return jax.jit(heavy).lower(params_struct, *args).compile()


def main():
    print("backend:", jax.default_backend(), flush=True)
    cfg = SDMatteConfig()
    host = sdmatte.init(cfg, seed=0)

    # trees as the pipeline would stage them (text tower dropped)
    def cast_fp(tree):
        return jax.tree_util.tree_map(
            lambda x: np.asarray(x, np.float32).astype(jnp.bfloat16), tree)
    fp_tree = {"vae": cast_fp(host["vae"]), "unet": cast_fp(host["unet"]),
               "text_encoder": {}}
    i8_tree = {"vae": compress_tree_int8(cast_fp(host["vae"])),
               "unet": compress_tree_int8(cast_fp(host["unet"])),
               "text_encoder": {}}

    def bytes_of(tree):
        return sum(l.size * l.dtype.itemsize
                   for l in jax.tree_util.tree_leaves(tree))
    print(f"resident weights: fp {bytes_of(fp_tree)/GB:.2f} G  "
          f"int8 {bytes_of(i8_tree)/GB:.2f} G", flush=True)

    fits = {}
    for tag, tree in (("fp", fp_tree), ("int8", i8_tree)):
        st = struct_tree(tree)
        for batch in (8, 9, 10, 12):
            try:
                c = lower_heavy(cfg, st, batch)
                ma = c.memory_analysis()
                tot = (ma.argument_size_in_bytes + ma.output_size_in_bytes
                       + ma.temp_size_in_bytes - ma.alias_size_in_bytes)
                ok = tot <= HBM
                fits[(tag, batch)] = ok
                print(f"{tag:5s} b={batch:2d}: args "
                      f"{ma.argument_size_in_bytes/GB:5.2f} temps "
                      f"{ma.temp_size_in_bytes/GB:5.2f} total {tot/GB:5.2f} G"
                      f"  {'FITS' if ok else 'OOM'}", flush=True)
            except Exception as e:
                fits[(tag, batch)] = False
                print(f"{tag:5s} b={batch:2d}: compile FAIL "
                      f"{str(e)[-110:]}", flush=True)
            jax.clear_caches()

    # phase 2: timed — fp baseline at 8, int8 at every batch that fits
    cases = [("fp", 8, None)]
    cases += [("int8", b, "int8") for b in (8, 9, 10, 12)
              if fits.get(("int8", b))]
    cases += [("fp", 8, None)]          # bracket drift
    for tag, batch, storage in cases:
        pipe = MattingPipeline(host, cfg, policy=BF16, attn_impl="auto",
                               weight_storage=storage or "fp")
        try:
            t = bench(pipe, batch)
        except Exception as e:
            print(f"timed {tag:5s} b={batch:2d}: FAIL {str(e)[-110:]}",
                  flush=True)
            del pipe
            jax.clear_caches()
            continue
        print(f"timed {tag:5s} b={batch:2d}: {t*1e3:8.1f} ms  "
              f"{batch/t:6.3f} mattes/s", flush=True)
        del pipe
        jax.clear_caches()


if __name__ == "__main__":
    main()
