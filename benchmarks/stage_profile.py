"""Per-stage latency profile of the 1024px matte on the real chip.

Answers "where do the 394 ms go?" (VERDICT round 1): times each pipeline
stage as its own jit graph — VAE encode (batched rgb+aux), U-Net, VAE
decode, pre/post resizes — plus per-shape conv microbenches so kernel work
(ops/conv3x3.py) is aimed at the shapes that actually dominate.

Run:  nohup python benchmarks/stage_profile.py > /tmp/stage_profile.log 2>&1 &
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
from sdmatte_tpu.core import imaging  # noqa: E402
from sdmatte_tpu.models import sdmatte, vae, unet  # noqa: E402


def timeit(fn, *args, iters=6, warmup=2, label=""):
    out = None
    times = []
    for i in range(warmup + iters):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        # force a scalar fetch: block_until_ready under-syncs via the tunnel
        float(jnp.sum(jax.tree_util.tree_leaves(out)[0][..., :1, :1]))
        dt = time.perf_counter() - t0
        if i >= warmup:
            times.append(dt)
    p50 = float(np.percentile(times, 50))
    print(f"{label:34s} {p50*1e3:8.2f} ms", flush=True)
    return p50, out


def main():
    print("backend:", jax.default_backend(), flush=True)
    size = 1024
    cfg = SDMatteConfig()
    pol = BF16
    params = sdmatte.init(cfg, seed=0)
    params = jax.tree_util.tree_map(
        lambda x: jnp.asarray(x, pol.param_dtype), params)
    rng = np.random.default_rng(0)

    img = jnp.asarray(rng.uniform(-1, 1, (1, size, size, 3)), jnp.bfloat16)
    aux3 = jnp.asarray(rng.uniform(-1, 1, (1, size, size, 3)), jnp.bfloat16)
    both = jnp.concatenate([img, aux3], axis=0)

    # --- stage: VAE encode (the pipeline's batched 2-image pass) ----------
    enc = jax.jit(lambda p, x: vae.encode(p["vae"], x, cfg.vae, policy=pol,
                                          attn_impl="flash"))
    t_enc, lat2 = timeit(enc, params, both, label="vae.encode (b=2, rgb+aux)")
    rgb_latent, aux_latent = lat2[:1], lat2[1:]

    # --- stage: aux tokens + U-Net ----------------------------------------
    mask = jnp.asarray(rng.uniform(0, 1, (1, (size // 8) ** 2)), jnp.float32)
    coords = jnp.asarray([[0.0, 0.0, 1.0, 1.0]], jnp.float32)
    from sdmatte_tpu.core.embeddings import sinusoidal_embedding
    ce = {"bbox_mask_coords": sinusoidal_embedding(
        coords.reshape(-1), 320).reshape(1, -1)}

    def unet_fn(p, rgb_l, aux_l, m):
        toks = unet.aux_tokens(p["unet"], aux_l, cfg.unet, policy=pol)
        sample = jnp.concatenate([rgb_l, aux_l], axis=-1)
        return unet.apply(p["unet"], cfg.unet,
                          sample=sample.astype(pol.compute_dtype),
                          trans=jnp.ones((1,), jnp.float32),
                          encoder_hidden_states=toks,
                          encoder_hidden_states_2=None,
                          coords_embed=ce, attention_mask=m,
                          timestep=None, policy=pol, attn_impl="flash")
    t_unet, out_lat = timeit(jax.jit(unet_fn), params, rgb_latent, aux_latent,
                             mask, label="unet (aux tokens + forward)")

    # --- stage: VAE decode -------------------------------------------------
    dec = jax.jit(lambda p, z: vae.decode(
        p["vae"], z / jnp.asarray(cfg.vae.scaling_factor, z.dtype), cfg.vae,
        policy=pol, attn_impl="flash"))
    t_dec, _ = timeit(dec, params, out_lat, label="vae.decode")

    # --- stage: resizes (pre + post) ---------------------------------------
    raw = jnp.asarray(rng.uniform(0, 1, (1, 1080, 1920, 3)), jnp.float32)
    rs = jax.jit(lambda x: imaging.resize_bilinear(x, size, size, antialias=True))
    t_rs, _ = timeit(rs, raw, label="resize 1920x1080 -> 1024^2")
    alpha = jnp.asarray(rng.uniform(0, 1, (1, size, size, 1)), jnp.float32)
    rs2 = jax.jit(lambda x: imaging.resize_bilinear(x, 1080, 1920, antialias=True))
    t_rs2, _ = timeit(rs2, alpha, label="resize-back 1024^2 -> 1920x1080")

    total = t_enc + t_unet + t_dec + t_rs + t_rs2
    print(f"\nstage sum: {total*1e3:.1f} ms "
          f"(encode {t_enc*1e3:.0f} / unet {t_unet*1e3:.0f} / "
          f"decode {t_dec*1e3:.0f} / resizes {(t_rs+t_rs2)*1e3:.1f})", flush=True)

    # --- conv microbenches: the VAE hot shapes -----------------------------
    # (batch, spatial, cin, cout): encoder runs b=2 per matte; decoder b=1.
    conv_shapes = [
        (2, 1024, 128, 128),   # encoder stage-0 resnets
        (2, 512, 256, 256),    # encoder stage-1
        (2, 256, 512, 512),    # encoder stage-2
        (2, 128, 512, 512),    # encoder stage-3 + mid
        (1, 1024, 128, 128),   # decoder stage-3
        (1, 512, 256, 256),    # decoder stage-2 resnets
        (1, 512, 512, 256),    # decoder stage-2 entry
        (1, 512, 512, 512),    # decoder upsample into stage-2 (hot!)
        (1, 256, 512, 512),    # decoder stage-1
        (1, 128, 512, 512),    # decoder stage-0 + mid
    ]
    print("\nconv 3x3 microbench (XLA, bf16):", flush=True)
    from jax import lax
    for b, s, ci, co in conv_shapes:
        x = jnp.asarray(rng.standard_normal((b, s, s, ci)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((3, 3, ci, co)) * 0.02, jnp.bfloat16)
        f = jax.jit(lambda x, w: lax.fori_loop(
            0, 8, lambda i, xx: lax.conv_general_dilated(
                xx, w, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32,
            ).astype(jnp.bfloat16)[..., :ci], x))
        if ci != co:
            f = jax.jit(lambda x, w: lax.conv_general_dilated(
                x, w, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32).astype(jnp.bfloat16))
        reps = 8 if ci == co else 1
        o = f(x, w); float(jnp.sum(o[..., :1, :1]))
        t0 = time.perf_counter()
        o = f(x, w); float(jnp.sum(o[..., :1, :1]))
        t = (time.perf_counter() - t0) / reps
        fl = 2 * b * s * s * ci * co * 9
        print(f"  {b}x{s}^2 {ci}->{co}: {t*1e3:7.2f} ms  {fl/t/1e12:5.1f} TF/s",
              flush=True)


if __name__ == "__main__":
    main()
