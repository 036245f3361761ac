"""Same-session A/B: VAE encode/decode bf16 vs int8 3x3 convs.

v5e doubles MXU MAC rate at int8; the dequant (fp32 scale multiply) and the
dynamic activation quant (amax + round) are elementwise and should fuse.
Measures whether XLA actually reaches the int8 conv path on the VAE's
shapes, interleaved in one process to cancel tunnel drift.

Run: nohup python -u benchmarks/ab_int8.py > /tmp/ab_int8.log 2>&1 &
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
from sdmatte_tpu.ops.quant import quantize_vae_tree  # noqa: E402


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
    params_q = quantize_vae_tree(params)
    rng = np.random.default_rng(0)
    size = 1024
    both = jnp.asarray(rng.uniform(-1, 1, (2, size, size, 3)), jnp.bfloat16)
    lat = jnp.asarray(rng.uniform(-1, 1, (1, size // 8, size // 8, 4)),
                      jnp.bfloat16)

    # int8 path must not ride the pallas bf16 table: conv2d checks kernel_q
    # first, so params_q bypasses it by construction.
    res = {}
    for tag, p in (("bf16", params), ("int8", params_q),
                   ("bf16_2", params), ("int8_2", params_q)):
        enc = jax.jit(lambda p, x: vae.encode(p, x, cfg.vae, policy=pol,
                                              attn_impl="flash"))
        dec = jax.jit(lambda p, z: vae.decode(p, z, cfg.vae, policy=pol,
                                              attn_impl="flash"))
        t_enc = timeit(enc, p, both)
        t_dec = timeit(dec, p, lat)
        res[tag] = (t_enc, t_dec)
        print(f"{tag:7s} encode(b2) {t_enc*1e3:7.1f} ms   "
              f"decode(b1) {t_dec*1e3:7.1f} ms", flush=True)

    be = min(res["bf16"][0], res["bf16_2"][0])
    ie = min(res["int8"][0], res["int8_2"][0])
    bd = min(res["bf16"][1], res["bf16_2"][1])
    idd = min(res["int8"][1], res["int8_2"][1])
    print(f"\nencode: int8 {ie*1e3:.1f} vs bf16 {be*1e3:.1f} ({be/ie:.2f}x)  "
          f"decode: int8 {idd*1e3:.1f} vs bf16 {bd*1e3:.1f} ({bd/idd:.2f}x)",
          flush=True)


if __name__ == "__main__":
    main()
