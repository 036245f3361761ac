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

_num_args = [a for a in sys.argv[1:] if a.isdigit()]
B = int(_num_args[0]) if _num_args else 1


def overhead():
    x = jnp.ones((8, 128), jnp.float32)
    f = jax.jit(lambda x: x * 2.0)
    f(x); float(jnp.sum(f(x)))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter(); float(jnp.sum(f(x)))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def timed(f, oh, reps):
    # warm (trace+compile+execute); the remote-compile tunnel drops
    # connections sporadically — retry with backoff before giving up
    for attempt in range(3):
        try:
            float(f())
            break
        except Exception as e:  # noqa: BLE001
            if attempt == 2:
                raise
            print(f"  [retry {attempt+1}] compile/run failed: "
                  f"{str(e)[:120]}", flush=True)
            time.sleep(60 * (attempt + 1))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(f())
        ts.append(time.perf_counter() - t0)
    return (float(np.median(ts)) - oh) / reps


def make_chain(step, *shapes_dtypes):
    """Sequentially run `step` over stacked independent inputs via lax.scan.

    Measurement traps this construction avoids (each measured as >chip-peak
    "TF/s" before the fix, see ab_unet_conv.py history):
      * slice-consumption → slice-of-conv computes one pixel: reduce the
        WHOLE output;
      * LINEAR full reduce → XLA folds sum(conv(x)) into a pooled dot and
        skips the step's final conv/linear: reduce through jnp.abs;
      * closed-over (loop-invariant) operands → projections hoisted out of
        the loop (e.g. cross-attn ctx K/V): EVERY input is a scanned array;
      * identical broadcast slices still measured above-peak: slices are
        DISTINCT random values, generated on device (no host staging).

    Returns (callable, reps); reps is sized so chain compute >> the ~1 ms
    per-call tunnel noise while the stacked inputs stay <= ~1 GB.
    """
    per_rep = sum(int(np.prod(s)) * jnp.dtype(d).itemsize
                  for s, d in shapes_dtypes)
    reps = int(min(48, max(12, (1 << 30) // max(per_rep, 1))))
    keys = jax.random.split(jax.random.PRNGKey(0), len(shapes_dtypes))
    stacked = tuple(
        (jax.random.normal(k, (reps,) + s, d) * 0.1).block_until_ready()
        if jnp.issubdtype(d, jnp.floating)
        else jnp.ones((reps,) + s, d)
        for k, (s, d) in zip(keys, shapes_dtypes))

    def body(acc, xs):
        o = step(*xs)
        o = o[0] if isinstance(o, tuple) else o
        return acc + jnp.sum(jnp.abs(o.astype(jnp.float32))), None

    fj = jax.jit(lambda st: lax.scan(body, jnp.float32(0.0), st)[0])
    return (lambda: fj(stacked)), reps


def main():
    print(f"backend: {jax.default_backend()}  batch={B}", flush=True)
    cfg = SDMatteConfig().unet
    pol = BF16
    params = unet.init(cfg, seed=0)
    params = jax.tree_util.tree_map(lambda x: jnp.asarray(x, jnp.bfloat16),
                                    params)
    rng = np.random.default_rng(0)
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

        def step(y, e, node=node):
            return unet._resnet(node, y, e, cfg, pol)
        f, reps = make_chain(step, ((B, s, s, cin), jnp.bfloat16),
                             ((B, 1280), jnp.bfloat16))
        t = timed(f, oh, reps)
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

        def step(y, cx, node=node, heads=heads, bias=bias):
            return unet._transformer(node, y, cx, heads=heads,
                                     bias_self=bias, bias_cross=None,
                                     cfg=cfg, policy=pol,
                                     attn_impl="flash")
        f, reps = make_chain(step, ((B, s, s, c), jnp.bfloat16),
                             ((B, 16384, 1024), jnp.bfloat16))
        t = timed(f, oh, reps)
        ms = t * 1e3
        total += ms * count
        lq = s * s
        fl = 2 * B * (lq * c * c * 4 + lq * lq * c * 2        # self qkv+o + attn
                      + lq * c * c + 2 * 16384 * 1024 * c     # cross q + kv
                      + lq * 16384 * c * 2                    # cross attn
                      + lq * c * 8 * c)                       # ff
        print(f"txfm   {path:28s} {s:4d}^2 {c:4d}ch h{heads:2d} x{count}: "
              f"{ms:7.2f} ms  {fl/(t+1e-12)/1e12:5.1f} TF/s", flush=True)

    # ---- conv_in / samplers / head -----------------------------------------
    from sdmatte_tpu.core import nn as F
    from sdmatte_tpu.core.imaging import resize_nearest

    misc_runs = []
    misc_runs.append(("conv_in", 128, 8,
                      lambda y: F.conv2d(params["conv_in"], y, policy=pol)))
    for i, (s, c) in enumerate([(128, 320), (64, 640), (32, 1280)]):
        p = params["down_blocks"][str(i)]["downsamplers"]["0"]["conv"]
        misc_runs.append((f"downsampler.{i}", s, c,
                          lambda y, p=p: F.conv2d(p, y, stride=2, policy=pol)))
    for i, (s, c) in enumerate([(16, 1280), (32, 1280), (64, 640)]):
        p = params["up_blocks"][str(i)]["upsamplers"]["0"]["conv"]
        misc_runs.append((f"upsampler.{i}", s, c,
                          lambda y, s=s, p=p: F.conv2d(
                              p, resize_nearest(y, 2 * s, 2 * s), policy=pol)))

    def head(y):
        h = F.group_norm(params["conv_norm_out"], y,
                         groups=cfg.norm_num_groups, eps=cfg.norm_eps)
        return F.conv2d(params["conv_out"], F.silu(h), policy=pol)

    misc_runs.append(("head(norm+silu+conv_out)", 128, 320, head))
    for name, s, c, step in misc_runs:
        f, reps = make_chain(step, ((B, s, s, c), jnp.bfloat16))
        t = timed(f, oh, reps)
        ms = t * 1e3
        total += ms
        print(f"misc   {name:28s} {s:4d}^2 {c:4d}ch    x1: {ms:7.2f} ms",
              flush=True)

    # ---- whole U-Net, same scan methodology --------------------------------
    # OPT-IN (argv flag "whole"): scanning the entire U-Net overloads the
    # remote-compile tunnel (25 min then broken pipe, 2026-08-17 run).  The
    # cross-check is done instead against stage_profile.py's single-call
    # measurement minus the dispatch overhead printed above (~140 - ~34
    # = ~105 ms), which agrees with the component sum within noise.
    if "whole" in sys.argv[1:]:
        trans = jnp.ones((B,), jnp.float32)
        coords = jnp.asarray(rng.standard_normal((B, 1280)), jnp.bfloat16)

        def whole(smp, cx, m):
            return unet.apply(params, cfg, sample=smp, trans=trans,
                              encoder_hidden_states=cx,
                              coords_embed={"bbox_mask_coords": coords},
                              attention_mask=m, policy=pol, attn_impl="flash")

        f, reps = make_chain(whole, ((B, 128, 128, 8), jnp.bfloat16),
                             ((B, 16384, 1024), jnp.bfloat16),
                             ((B, 16384), jnp.float32))
        t = timed(f, oh, reps)
        print(f"\nwhole-unet (scan chain): {t*1e3:.1f} ms", flush=True)
    print(f"\ncomponent-sum: {total:.1f} ms  (cross-check: stage_profile.py "
          f"whole-unet single-call minus the ~34 ms dispatch overhead)",
          flush=True)


if __name__ == "__main__":
    main()
