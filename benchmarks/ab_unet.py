"""In-graph A/B: U-Net forward with latent-shape conv dispatch entries.

VERDICT round-2 item 2: the U-Net interior sustains ~29 TF/s on its
non-attention ~80 ms; no latent-resolution conv shape has a dispatch entry.
This times the REAL unet.apply graph (aux tokens + forward, b=1@1024px
latents, flash attention) with candidate (b, spatial, ci, co) entries
injected vs dispatch disabled, interleaved — the decoder lesson says chain
wins don't always survive graph context (custom-call boundaries force
NHWC relayouts), so only this in-graph number decides the table.

Usage: ab_unet.py [batch] [entries...]   entries like "1,128,320,320:8,320"
       (shape:block_rows,cout_block; default = the equal-channel latent set)
Run: nohup python -u benchmarks/ab_unet.py > /tmp/ab_unet.log 2>&1 &
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
from sdmatte_tpu.core.embeddings import sinusoidal_embedding  # noqa: E402
from sdmatte_tpu.models import sdmatte, unet  # noqa: E402
from sdmatte_tpu.ops import dispatch  # noqa: E402

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 1

DEFAULT_ENTRIES = {
    # U-Net latent resnet conv shapes at 1024px, b=1 (down/mid/up interior)
    (1, 128, 320, 320): (8, 320),
    (1, 64, 640, 640): (8, 128),
    (1, 32, 1280, 1280): (8, 128),
    (1, 16, 1280, 1280): (8, 128),
    (1, 128, 640, 320): (8, 320),
    (1, 64, 1280, 640): (8, 128),
}
if len(sys.argv) > 2:
    DEFAULT_ENTRIES = {}
    for arg in sys.argv[2:]:
        shape_s, cfg_s = arg.split(":")
        b, s, ci, co = (int(v) for v in shape_s.split(","))
        bh, coN = (int(v) for v in cfg_s.split(","))
        DEFAULT_ENTRIES[(b, s, ci, co)] = (bh, coN)


def timeit(fn, *args, iters=6, warmup=2):
    times = []
    for i in range(warmup + iters):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jnp.sum(out[..., :1, :1]))
        if i >= warmup:
            times.append(time.perf_counter() - t0)
    return float(np.median(times))


def main():
    print(f"backend: {jax.default_backend()}  batch={BATCH}", flush=True)
    size = 1024
    cfg = SDMatteConfig()
    pol = BF16
    params = jax.tree_util.tree_map(
        lambda x: jnp.asarray(x, jnp.bfloat16), sdmatte.init(cfg, seed=0))
    b = BATCH
    k = jax.random.key(0)
    rgb_l = jax.random.normal(k, (b, size // 8, size // 8, 4), jnp.bfloat16)
    aux_l = jax.random.normal(k, (b, size // 8, size // 8, 4), jnp.bfloat16)
    mask = (jax.random.uniform(k, (b, (size // 8) ** 2)) < 0.7).astype(
        jnp.float32)
    coords = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0, 1.0]]), (b, 1))
    ce = {"bbox_mask_coords": sinusoidal_embedding(
        coords.reshape(-1), 320).reshape(b, -1)}

    def unet_fn(p, rgb_l, aux_l, m):
        toks = unet.aux_tokens(p["unet"], aux_l, cfg.unet, policy=pol)
        sample = jnp.concatenate([rgb_l, aux_l], axis=-1)
        return unet.apply(p["unet"], cfg.unet,
                          sample=sample.astype(pol.compute_dtype),
                          trans=jnp.ones((b,), jnp.float32),
                          encoder_hidden_states=toks,
                          encoder_hidden_states_2=None,
                          coords_embed=ce, attention_mask=m,
                          timestep=None, policy=pol, attn_impl="flash")

    inject = {shape: (9.9, bh, coN, False, False, 0)
              for shape, (bh, coN) in DEFAULT_ENTRIES.items()}
    saved = dict(dispatch.PALLAS_CONV_WINS)
    results = {}
    for tag in ("pallas", "xla", "pallas2", "xla2"):
        dispatch.PALLAS_CONV_WINS.clear()
        dispatch.PALLAS_CONV_WINS.update(saved)
        if tag.startswith("pallas"):
            dispatch.PALLAS_CONV_WINS.update(inject)
        fn = jax.jit(unet_fn)
        try:
            t = timeit(fn, params, rgb_l, aux_l, mask)
        except Exception as e:
            print(f"{tag:8s} FAIL {str(e)[-140:]}", flush=True)
            results[tag] = float("inf")
            continue
        results[tag] = t
        print(f"{tag:8s} unet(b{b}@{size}) {t*1e3:7.1f} ms", flush=True)
    dispatch.PALLAS_CONV_WINS.clear()
    dispatch.PALLAS_CONV_WINS.update(saved)

    p = min(results["pallas"], results["pallas2"])
    xx = min(results["xla"], results["xla2"])
    print(f"\nunet b{b}: pallas {p*1e3:.1f} vs xla {xx*1e3:.1f} "
          f"({xx/p:.2f}x)", flush=True)


if __name__ == "__main__":
    main()
