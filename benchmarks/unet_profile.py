"""Per-component U-Net latency breakdown at 1024px (VERDICT round-2 item 2).

The whole U-Net stage measures ~140 ms at b=1 while its attention accounts
for ~60 ms at 77.8 TF/s — this harness attributes the other ~80 ms by timing
each component FAMILY as self-feeding chains at its exact production shape
(conv_clean.py methodology: jit chains, overhead-corrected):

  * resnet blocks per stage shape (gn+silu+conv pairs + time-emb inject)
  * transformer blocks per stage shape (flash attention + projections + FF)
  * down/up-samplers, conv_in/out
  * the sum vs the measured whole-unet time = scheduling/boundary overhead

Run: nohup python -u benchmarks/unet_profile.py [b] > /tmp/unet_profile.log 2>&1 &
     (optional arg: batch size, default 1)
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

from sdmatte_tpu.configs import SDMatteConfig  # noqa: E402
from sdmatte_tpu.core.dtypes import BF16  # noqa: E402
from sdmatte_tpu.models import unet  # noqa: E402

B = int(sys.argv[1]) if len(sys.argv) > 1 else 1
REPS = 12


def overhead():
    x = jnp.ones((8, 128), jnp.float32)
    f = jax.jit(lambda x: x * 2.0)
    f(x); float(jnp.sum(f(x)))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter(); float(jnp.sum(f(x)))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def timed(f, oh):
    o = f(); jax.block_until_ready(o)
    float(jnp.sum(jax.tree_util.tree_leaves(o)[0][..., :1, :1]))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        o = f()
        float(jnp.sum(jax.tree_util.tree_leaves(o)[0][..., :1, :1]))
        ts.append(time.perf_counter() - t0)
    return (float(np.median(ts)) - oh) / REPS


def chain(step, x):
    return jax.jit(lambda x: lax.fori_loop(0, REPS, lambda i, y: step(y), x))


def main():
    print(f"backend: {jax.default_backend()}  batch={B}", flush=True)
    cfg = SDMatteConfig().unet
    pol = BF16
    params = unet.init(cfg, seed=0)
    params = jax.tree_util.tree_map(lambda x: jnp.asarray(x, jnp.bfloat16),
                                    params)
    rng = np.random.default_rng(0)
    emb = jnp.asarray(rng.standard_normal((B, 1280)), jnp.bfloat16)
    ctx = jnp.asarray(rng.standard_normal((B, 16384, 1024)) * 0.1,
                      jnp.bfloat16)
    oh = overhead()
    print(f"overhead {oh*1e3:.1f} ms", flush=True)

    total = 0.0

    # ---- resnets: (stage param path, spatial, cin) x count in the graph ---
    resnet_runs = [
        ("down_blocks.0.resnets.0", 128, 320, 2),    # down0
        ("down_blocks.1.resnets.1", 64, 640, 2),     # down1 equal-ch
        ("down_blocks.2.resnets.1", 32, 1280, 2),    # down2 equal-ch
        ("down_blocks.3.resnets.0", 16, 1280, 4),    # down3 + mid x2
        # up path: concat inputs (cin = cout + skip)
        ("up_blocks.0.resnets.0", 16, 2560, 3),      # up0 (2560->1280)
        ("up_blocks.1.resnets.0", 32, 2560, 3),      # up1
        ("up_blocks.2.resnets.0", 64, 1920, 1),      # up2 first (1280+640)
        ("up_blocks.2.resnets.1", 64, 1280, 2),      # up2 rest
        ("up_blocks.3.resnets.0", 128, 960, 1),      # up3 first (640+320)
        ("up_blocks.3.resnets.1", 128, 640, 2),      # up3 rest
        # mixed-channel down entries
        ("down_blocks.1.resnets.0", 64, 320, 1),     # 320->640
        ("down_blocks.2.resnets.0", 32, 640, 1),     # 640->1280
    ]
    for path, s, cin, count in resnet_runs:
        node = params
        for k in path.split("."):
            node = node[k]
        cout = node["conv2"]["kernel"].shape[-1]
        x = jnp.asarray(rng.standard_normal((B, s, s, cin)) * 0.1,
                        jnp.bfloat16)

        if cin == cout:
            def step(y, node=node):
                return unet._resnet(node, y, emb, cfg, pol).astype(jnp.bfloat16)
            t = timed(lambda: chain(step, x)(x), oh)
        else:
            def one(y, node=node):
                return unet._resnet(node, y, emb, cfg, pol)
            f = jax.jit(one)
            t0 = timed(lambda: f(x), 0.0) * REPS  # single call incl overhead
            t = max(t0 - oh, 1e-5) / 1.0 / REPS * REPS  # report raw
            t = t0 - oh
        ms = t * 1e3
        total += ms * count
        fl = 2 * B * s * s * 9 * (cin * cout + cout * cout) + \
            (2 * B * s * s * cin * cout if cin != cout else 0)
        print(f"resnet {path:28s} {s:4d}^2 {cin:4d}->{cout:4d} x{count}: "
              f"{ms:7.2f} ms  {fl/(t+1e-12)/1e12:5.1f} TF/s", flush=True)

    # ---- transformers per stage shape --------------------------------------
    tr_runs = [
        ("down_blocks.0.attentions.0", 128, 320, 5, 2),
        ("down_blocks.1.attentions.0", 64, 640, 10, 2),
        ("down_blocks.2.attentions.0", 32, 1280, 20, 2),
        ("mid_block.attentions.0", 16, 1280, 20, 1),
        ("up_blocks.1.attentions.0", 32, 1280, 20, 3),
        ("up_blocks.2.attentions.0", 64, 640, 10, 3),
        ("up_blocks.3.attentions.0", 128, 320, 5, 3),
    ]
    mask = jnp.asarray(rng.uniform(0, 1, (B, 16384)) < 0.7, jnp.float32)
    for path, s, c, heads, count in tr_runs:
        node = params
        for k in path.split("."):
            node = node[k]
        bias = ((1.0 - mask.reshape(B, 128, 128)[:, ::128 // s, ::128 // s]
                 .reshape(B, s * s)) * -10000.0)
        x = jnp.asarray(rng.standard_normal((B, s, s, c)) * 0.1, jnp.bfloat16)

        def step(y, node=node, heads=heads, bias=bias):
            return unet._transformer(node, y, ctx, heads=heads,
                                     bias_self=bias, bias_cross=None,
                                     cfg=cfg, policy=pol,
                                     attn_impl="flash").astype(jnp.bfloat16)
        t = timed(lambda: chain(step, x)(x), oh)
        ms = t * 1e3
        total += ms * count
        lq = s * s
        fl = 2 * B * (lq * c * c * 4 + lq * lq * c * 2        # self qkv+o + attn
                      + lq * c * c + 2 * 16384 * 1024 * c     # cross q + kv
                      + lq * 16384 * c * 2                    # cross attn
                      + lq * c * 8 * c)                       # ff
        print(f"txfm   {path:28s} {s:4d}^2 {c:4d}ch h{heads:2d} x{count}: "
              f"{ms:7.2f} ms  {fl/(t+1e-12)/1e12:5.1f} TF/s", flush=True)

    # ---- samplers + head ---------------------------------------------------
    print(f"\ncomponent-sum: {total:.1f} ms  (whole-unet measured separately "
          f"by stage_profile.py; the gap = scheduling/boundary cost)",
          flush=True)


if __name__ == "__main__":
    main()
