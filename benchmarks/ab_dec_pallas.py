"""Same-session A/B: VAE decode with ALL convs on the Pallas kernel vs XLA.

Round-2 finding: any SINGLE pallas conv inside the XLA decode graph makes it
~2x slower — XLA runs the decoder in a row-blocked internal conv form and
every custom-call boundary forces 256 MB NHWC relayouts.  But an ALL-pallas
decode was never measured: with no XLA convs left, there is no blocked form
and no relayouts, and the kernel won every decoder shape in isolation
(benchmarks/conv_clean.py, up to 2.03x).  This monkeypatches the dispatch
table to cover every decoder conv shape and times the whole decode.

Run: nohup python -u benchmarks/ab_dec_pallas.py > /tmp/ab_dec.log 2>&1 &

SVMEM_KIB env (2026-08-19): compile the decode with a raised PJRT
scoped-VMEM limit (verified-honored channel, benchmarks/ab_xla_flags.py).
The round-4 re-A/B that closed this negative ran at the default ~16 MB
limit, which forced csplit on three shapes and blocked gn fusion at
C>=256; SVMEM_KIB=65536 removes both constraints — TAGS=xla,pallas_fgn_all
adds the everywhere-fused, csplit-free variant.  TAGS env picks configs.
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
from sdmatte_tpu.models import vae  # noqa: E402
from sdmatte_tpu.ops import dispatch  # noqa: E402

# every 3x3 conv shape in the 1024px b=1 decode graph
# (mid 128^2x512; up0 128^2x512; up1 256^2x512; up2 512^2 512->256;
#  up3 1024^2 256->128; conv_out handled by XLA - 128->3 is tiny).
# shape -> csplit mode (1 where the full-C halo window exceeds scoped VMEM)
DEC_SHAPES = {
    (1, 128, 512, 512): 0,
    (1, 256, 512, 512): 0,
    (1, 512, 512, 256): 1,
    (1, 512, 256, 256): 0,
    (1, 1024, 256, 256): 1,
    (1, 1024, 256, 128): 1,
    (1, 1024, 128, 128): 0,
}


def timeit(fn, *args, iters=10, warmup=2):
    times = []
    for i in range(warmup + iters):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jnp.sum(out[..., :1, :1]))
        if i >= warmup:
            times.append(time.perf_counter() - t0)
    return float(np.median(times))


SVMEM_KIB = os.environ.get("SVMEM_KIB")
COMPILER_OPTIONS = (
    {"xla_tpu_scoped_vmem_limit_kib": SVMEM_KIB} if SVMEM_KIB else None)


def main():
    print("backend:", jax.default_backend(), "svmem:", SVMEM_KIB, flush=True)
    cfg = SDMatteConfig()
    pol = BF16
    params = jax.tree_util.tree_map(
        lambda x: jnp.asarray(x, pol.param_dtype), vae.init(cfg.vae, seed=0))
    rng = np.random.default_rng(0)
    lat = jnp.asarray(rng.uniform(-1, 1, (1, 128, 128, 4)), jnp.bfloat16)

    def dec_fn():
        return jax.jit(lambda p, z: vae.decode(p, z, cfg.vae, policy=pol,
                                               attn_impl="flash"),
                       compiler_options=COMPILER_OPTIONS)

    saved = dict(dispatch.PALLAS_CONV_WINS)
    results = {}
    tags = tuple((os.environ.get("TAGS") or
                  "xla,pallas_all,pallas_gn,xla_2,pallas_all_2").split(","))
    for tag in tags:
        dispatch.PALLAS_CONV_WINS.clear()
        dispatch.PALLAS_CONV_WINS.update(saved)
        if tag.startswith("pallas"):
            fuse = tag.startswith(("pallas_gn", "pallas_fgn"))
            for shp, csplit in DEC_SHAPES.items():
                if tag.startswith("pallas_fgn_all"):
                    # raised-SVMEM variant: fuse gn AND residual everywhere,
                    # no channel split (the full-C halo window now fits)
                    dispatch.PALLAS_CONV_WINS[shp] = (9.9, 8, 128, True,
                                                      True, 0)
                    continue
                # fgn only where the fp32 window temp fits (128ch @1024 and
                # csplit halves; fused_tune showed C>=256 direct OOMs)
                f = fuse and (shp[2] <= 128 or csplit)
                dispatch.PALLAS_CONV_WINS[shp] = (9.9, 8, 128, f, False,
                                                  csplit)
        try:
            t = timeit(dec_fn(), params, lat)
        except Exception as e:      # fgn can OOM scoped VMEM on 512ch
            print(f"{tag:13s} FAIL {str(e)[-120:]}", flush=True)
            results[tag] = float("inf")
            continue
        results[tag] = t
        print(f"{tag:13s} decode(b1@1024) {t*1e3:7.1f} ms", flush=True)
    dispatch.PALLAS_CONV_WINS.clear()
    dispatch.PALLAS_CONV_WINS.update(saved)

    xs = [results[t] for t in results if t.startswith("xla")]
    ps = [results[t] for t in results if t.startswith("pallas")]
    if xs and ps:
        x, p = min(xs), min(ps)
        print(f"\nbest-pallas {p*1e3:.1f} vs xla {x*1e3:.1f} "
              f"({x/p:.2f}x)", flush=True)


if __name__ == "__main__":
    main()
