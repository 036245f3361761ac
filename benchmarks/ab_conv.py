"""Same-session A/B: VAE encode/decode with Pallas conv dispatch on vs off.

bench.py runs minutes apart and the dev tunnel's ambient load drifts —
this measures both variants interleaved in one process so the kernel's
true contribution is isolated.

Run: nohup python -u benchmarks/ab_conv.py > /tmp/ab_conv.log 2>&1 &
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


def timeit(fn, *args, iters=10, warmup=2):
    times = []
    for i in range(warmup + iters):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jnp.sum(jax.tree_util.tree_leaves(out)[0][..., :1, :1]))
        if i >= warmup:
            times.append(time.perf_counter() - t0)
    return float(np.median(times))


def main():
    print("backend:", jax.default_backend(), flush=True)
    cfg = SDMatteConfig()
    pol = BF16
    params = jax.tree_util.tree_map(
        lambda x: jnp.asarray(x, pol.param_dtype), vae.init(cfg.vae, seed=0))
    rng = np.random.default_rng(0)
    size = 1024
    both = jnp.asarray(rng.uniform(-1, 1, (2, size, size, 3)), jnp.bfloat16)
    lat = jnp.asarray(rng.uniform(-1, 1, (1, size // 8, size // 8, 4)),
                      jnp.bfloat16)

    variants = {}
    for mode in ("pallas", "xla", "pallas2", "xla2"):   # interleave twice
        if mode.startswith("xla"):
            os.environ["SDMATTE_NO_PALLAS_CONV"] = "1"
        else:
            os.environ.pop("SDMATTE_NO_PALLAS_CONV", None)
        enc = jax.jit(lambda p, x: vae.encode(p, x, cfg.vae, policy=pol,
                                              attn_impl="flash"))
        dec = jax.jit(lambda p, z: vae.decode(p, z, cfg.vae, policy=pol,
                                              attn_impl="flash"))
        t_enc = timeit(enc, params, both)
        t_dec = timeit(dec, params, lat)
        variants[mode] = (t_enc, t_dec)
        print(f"{mode:8s} encode(b2) {t_enc*1e3:7.1f} ms   "
              f"decode(b1) {t_dec*1e3:7.1f} ms", flush=True)

    pe = min(variants["pallas"][0], variants["pallas2"][0])
    xe = min(variants["xla"][0], variants["xla2"][0])
    pd = min(variants["pallas"][1], variants["pallas2"][1])
    xd = min(variants["xla"][1], variants["xla2"][1])
    print(f"\nencode: pallas {pe*1e3:.1f} vs xla {xe*1e3:.1f} "
          f"({xe/pe:.2f}x)  decode: pallas {pd*1e3:.1f} vs xla {xd*1e3:.1f} "
          f"({xd/pd:.2f}x)", flush=True)


if __name__ == "__main__":
    main()
