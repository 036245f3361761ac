"""In-graph A/B: attention projection prologue fusions (VERDICT r4 item 4a).

The U-Net's transformer blocks sit in a 71-81 TF/s band against the d=64
attention ~98 TF/s score/PV ceiling (ARCHITECTURE.md round-3 attribution,
benchmarks/unet_profile.py); the remaining ~18 ms of U-Net headroom at b=1
is ONLY that gap.  Split-chains and bias-in-dot variants already measured
negative (flash_tune r2-r4) — this sweep covers the last untried lever:
the projection prologue around the kernel.

Variants (each times the REAL unet.apply graph, flash attention, b x 1024px
latents, interleaved stock brackets):

  stock   three separate to_q/to_k/to_v matmuls (production today)
  qkv     self-attention sites: one (L,C) x (C,3C) matmul + split — fewer
          dispatches, one MXU sweep over the same FLOPs
  kv      cross-attention sites: one (Lk,Cctx) x (Cctx,2C) matmul for k/v
          (the 16,384-token aux context K/V projections)
  both    qkv + kv
  nov2    per-site v2 bias-in-dot dispatch disabled (SDMATTE_NO_V2) — the
          r4 flash_tune chain win (+2.7% at b=8) re-validated IN THE FULL
          GRAPH (VERDICT r4 item 4b); v2 survives only if stock beats this

Run: nohup python -u benchmarks/ab_qkv.py [batch] > /tmp/ab_qkv.log 2>&1 &
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
from sdmatte_tpu.core import nn as F  # noqa: E402
from sdmatte_tpu.core.embeddings import sinusoidal_embedding  # noqa: E402
from sdmatte_tpu.models import sdmatte, unet  # noqa: E402
from sdmatte_tpu.ops.attention import attention  # noqa: E402

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 1

FUSE_QKV = False
FUSE_KV = False


def fused_mha(p, x, ctx, *, heads, bias, policy, attn_impl, residual=False):
    """unet._mha with the projection prologue optionally fused (same math:
    concatenated kernels -> one dot -> split; fp32 accumulate as F.linear)."""
    b, lq, c = x.shape
    d = c // heads

    def proj3(xin):
        w = jnp.concatenate(
            [p["to_q"]["kernel"], p["to_k"]["kernel"], p["to_v"]["kernel"]],
            axis=1).astype(policy.compute_dtype)
        qkv = jnp.dot(policy.cast_compute(xin), w,
                      preferred_element_type=policy.accum_dtype)
        return jnp.split(qkv.astype(policy.compute_dtype), 3, axis=-1)

    def proj2(cin):
        w = jnp.concatenate([p["to_k"]["kernel"], p["to_v"]["kernel"]],
                            axis=1).astype(policy.compute_dtype)
        kv = jnp.dot(policy.cast_compute(cin), w,
                     preferred_element_type=policy.accum_dtype)
        return jnp.split(kv.astype(policy.compute_dtype), 2, axis=-1)

    if FUSE_QKV and x is ctx and "kernel" in p["to_q"]:
        q, k, v = proj3(x)
    elif FUSE_KV and x is not ctx and "kernel" in p["to_k"]:
        q = F.linear(p["to_q"], x, policy)
        k, v = proj2(ctx)
    else:
        q = F.linear(p["to_q"], x, policy)
        k = F.linear(p["to_k"], ctx, policy)
        v = F.linear(p["to_v"], ctx, policy)
    lk = ctx.shape[1]
    q = q.reshape(b, lq, heads, d).transpose(0, 2, 1, 3)
    k = k.reshape(b, lk, heads, d).transpose(0, 2, 1, 3)
    v = v.reshape(b, lk, heads, d).transpose(0, 2, 1, 3)
    o = attention(q.astype(policy.compute_dtype), k.astype(policy.compute_dtype),
                  v.astype(policy.compute_dtype), scale=1.0 / np.sqrt(d),
                  bias=bias, policy=policy, impl=attn_impl)
    o = o.transpose(0, 2, 1, 3).reshape(b, lq, c)
    out = F.linear(p["to_out"]["0"], o, policy)
    return out + x.astype(out.dtype) if residual else out


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
    global FUSE_QKV, FUSE_KV
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

    stock_mha = unet._mha
    variants = ("stock", "qkv", "kv", "both", "nov2", "stock2")
    results = {}
    for tag in variants:
        FUSE_QKV = tag in ("qkv", "both")
        FUSE_KV = tag in ("kv", "both")
        unet._mha = stock_mha if tag.startswith(("stock", "nov2")) \
            else fused_mha
        if tag == "nov2":
            os.environ["SDMATTE_NO_V2"] = "1"
        else:
            os.environ.pop("SDMATTE_NO_V2", None)
        fn = jax.jit(unet_fn)
        try:
            t = timeit(fn, params, rgb_l, aux_l, mask)
        except Exception as e:
            print(f"{tag:7s} FAIL {str(e)[-140:]}", flush=True)
            results[tag] = float("inf")
            continue
        results[tag] = t
        print(f"{tag:7s} unet(b{b}@{size}) {t*1e3:7.1f} ms", flush=True)
    unet._mha = stock_mha
    os.environ.pop("SDMATTE_NO_V2", None)

    s = min(results["stock"], results["stock2"])
    for tag in ("qkv", "kv", "both", "nov2"):
        print(f"{tag:5s}: {results[tag]*1e3:7.1f} ms vs stock {s*1e3:7.1f} "
              f"({s/results[tag]:.3f}x)", flush=True)


if __name__ == "__main__":
    main()
