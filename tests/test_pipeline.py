"""End-to-end pipeline tests on the tiny config + postprocess math parity."""

import numpy as np
import torch
import jax.numpy as jnp
import pytest

from sdmatte_tpu.configs import SDMatteConfig
from sdmatte_tpu.models import sdmatte
from sdmatte_tpu.pipeline import MattingPipeline, PipelineOptions
from sdmatte_tpu.pipeline import postprocess


@pytest.fixture(scope="module")
def tiny_pipe():
    cfg = SDMatteConfig.tiny()
    params = sdmatte.init(cfg, seed=0)
    return MattingPipeline(params, cfg, attn_impl="xla")


def _torch_refine(alpha, trimap, tc):
    """Reference mask_refine math (sdmatte_nodes.py:365-380) in torch."""
    alpha = torch.from_numpy(alpha.copy())
    trimap = torch.from_numpy(trimap)
    fg = trimap > tc
    bg = trimap < (1.0 - tc)
    unknown = ~(fg | bg)
    out = alpha.clone()
    out[bg] = 0.0
    out[fg] = torch.clamp(out[fg] * 1.2, 0, 1)
    out[(out < 0.3) & unknown] = 0.0
    return out.numpy()


def test_mask_refine_matches_reference_math(rng):
    alpha = rng.uniform(0, 1, (2, 16, 16)).astype(np.float32)
    trimap = rng.choice([0.0, 0.5, 1.0], (2, 16, 16)).astype(np.float32)
    ours = postprocess.mask_refine(jnp.asarray(alpha), jnp.asarray(trimap), 0.8)
    ref = _torch_refine(alpha, trimap, 0.8)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-6)


def test_composite_modes(rng):
    img = rng.uniform(0, 1, (1, 8, 8, 3)).astype(np.float32)
    alpha = rng.uniform(0, 1, (1, 8, 8)).astype(np.float32)
    tri = rng.choice([0.0, 0.5, 1.0], (1, 8, 8)).astype(np.float32)
    ji, ja, jt = jnp.asarray(img), jnp.asarray(alpha), jnp.asarray(tri)

    out = postprocess.composite(ji, ja, jt, "alpha_only")
    np.testing.assert_array_equal(np.asarray(out), np.zeros_like(img))

    out = postprocess.composite(ji, ja, jt, "matted_rgba")
    assert out.shape == (1, 8, 8, 4)
    np.testing.assert_allclose(np.asarray(out[..., 3]), alpha)
    np.testing.assert_allclose(np.asarray(out[..., :3]), img)

    out = postprocess.composite(ji, ja, jt, "matted_rgb")
    fg = ((tri[..., None] > 0.2) & (alpha[..., None] > 0.1)).astype(np.float32)
    np.testing.assert_allclose(np.asarray(out), img * fg)

    out = postprocess.composite(ji, ja, jt, "alpha_blend")
    np.testing.assert_allclose(np.asarray(out), img * alpha[..., None], atol=1e-6)


def test_pipeline_end_to_end(tiny_pipe, rng):
    img = rng.uniform(0, 1, (1, 96, 80, 3)).astype(np.float32)
    tri = rng.choice([0.0, 0.5, 1.0], (1, 96, 80)).astype(np.float32)
    opts = PipelineOptions(inference_size=64, output_mode="matted_rgba",
                           mask_refine=True, trimap_constraint=0.8)
    alpha, matted = tiny_pipe(img, tri, options=opts)
    assert alpha.shape == (1, 96, 80)
    assert matted.shape == (1, 96, 80, 4)
    a = np.asarray(alpha)
    assert np.isfinite(a).all() and a.min() >= 0.0 and a.max() <= 1.0
    # refinement invariant: confident-background pixels are forced to 0
    assert np.abs(a[tri < 0.2]).max() == 0.0


def test_pipeline_unbatched_input(tiny_pipe, rng):
    img = rng.uniform(0, 1, (64, 64, 3)).astype(np.float32)
    tri = np.ones((64, 64), np.float32)
    opts = PipelineOptions(inference_size=64, mask_refine=False)
    alpha, matted = tiny_pipe(img, tri, options=opts)
    assert alpha.shape == (1, 64, 64)


def test_vae_chunking_matches_unchunked(rng):
    """lax.map-chunked VAE stages must be numerically identical."""
    from sdmatte_tpu.configs import SDMatteConfig
    from sdmatte_tpu.models import sdmatte
    cfg = SDMatteConfig.tiny()
    params = sdmatte.init(cfg, seed=0)
    import jax
    b, s = 4, 64
    data = {
        "image": jnp.asarray(rng.uniform(-1, 1, (b, s, s, 3)), jnp.float32),
        "trimap": jnp.asarray(rng.uniform(-1, 1, (b, s, s, 1)), jnp.float32),
        "trimap_coords": jnp.tile(jnp.asarray([[0.0, 0.0, 1.0, 1.0]]), (b, 1)),
        "is_trans": jnp.zeros((b,), jnp.float32),
    }
    f_chunk = jax.jit(lambda p, d: sdmatte.forward(p, cfg, d, attn_impl="xla",
                                                   vae_chunk=2))
    f_full = jax.jit(lambda p, d: sdmatte.forward(p, cfg, d, attn_impl="xla"))
    np.testing.assert_allclose(np.asarray(f_chunk(params, data)),
                               np.asarray(f_full(params, data)),
                               atol=1e-5, rtol=1e-5)


def test_vae_encode_split_matches_concat(rng):
    """Split rgb/aux encode (the b>8 HBM lever) is numerically identical to
    the concat-batched pass — same params, per-sample ops only."""
    from sdmatte_tpu.configs import SDMatteConfig
    from sdmatte_tpu.models import sdmatte
    import jax
    cfg = SDMatteConfig.tiny()
    params = sdmatte.init(cfg, seed=0)
    b, s = 2, 64
    data = {
        "image": jnp.asarray(rng.uniform(-1, 1, (b, s, s, 3)), jnp.float32),
        "trimap": jnp.asarray(rng.uniform(-1, 1, (b, s, s, 1)), jnp.float32),
        "trimap_coords": jnp.tile(jnp.asarray([[0.0, 0.0, 1.0, 1.0]]), (b, 1)),
        "is_trans": jnp.zeros((b,), jnp.float32),
    }
    f_split = jax.jit(lambda p, d: sdmatte.forward(
        p, cfg, d, attn_impl="xla", vae_encode_split=True))
    f_concat = jax.jit(lambda p, d: sdmatte.forward(
        p, cfg, d, attn_impl="xla", vae_encode_split=False))
    np.testing.assert_allclose(np.asarray(f_split(params, data)),
                               np.asarray(f_concat(params, data)),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("mode", ["aux_half", "rgb_half", "decode_half",
                                  "fast", "fastest"])
def test_speed_modes_run_and_stay_bounded(rng, mode):
    """Opt-in out-of-parity speed modes: correct shapes, finite output, and
    a bounded deviation from the parity pipeline (the real quality gate is
    benchmarks/ab_speed_modes.py per checkpoint — these pin the plumbing)."""
    cfg = SDMatteConfig.tiny()
    params = sdmatte.init(cfg, seed=0)
    img = rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)
    tri = rng.uniform(0, 1, (1, 64, 64)).astype(np.float32)
    opts = PipelineOptions(inference_size=64, mask_refine=False)
    base = MattingPipeline(params, cfg, attn_impl="xla")
    fast = MattingPipeline(params, cfg, attn_impl="xla", speed_mode=mode)
    a0, _ = base(img, tri, options=opts)
    a1, m1 = fast(img, tri, options=opts)
    assert a1.shape == a0.shape            # resize-back restores orig size
    assert np.isfinite(np.asarray(a1)).all()
    mae = float(np.abs(np.asarray(a1) - np.asarray(a0)).mean())
    assert mae < 0.25, mae                 # random-weight sanity envelope


def test_pipeline_caption_path(rng, tmp_path):
    """Text-conditioned gating end-to-end: tokenizer -> CLIP -> mid stage."""
    import json
    import dataclasses
    from sdmatte_tpu.configs import SDMatteConfig, UNetConfig
    from sdmatte_tpu.models import sdmatte
    from sdmatte_tpu.models.tokenizer import CLIPTokenizer

    base = SDMatteConfig.tiny()
    unet_kw = {f.name: getattr(base.unet, f.name)
               for f in dataclasses.fields(base.unet)}
    unet_kw["use_encoder_hidden_states_list"] = (True, False, True)
    cfg = dataclasses.replace(base, unet=UNetConfig(**unet_kw))

    # toy vocab covering 'hello'
    vocab = {}
    for ch in "helo!":
        vocab[ch] = len(vocab)
        vocab[ch + "</w>"] = len(vocab)
    vocab["<|startoftext|>"] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)
    (tmp_path / "vocab.json").write_text(json.dumps(vocab))
    (tmp_path / "merges.txt").write_text("#version: 0.2\n")
    # keep ids inside the tiny CLIP vocab (1000)
    tok = CLIPTokenizer(str(tmp_path / "vocab.json"),
                        str(tmp_path / "merges.txt"), pad_token="!")

    params = sdmatte.init(cfg, seed=0)
    pipe = MattingPipeline(params, cfg, attn_impl="xla", tokenizer=tok)
    img = rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)
    tri = np.ones((1, 64, 64), np.float32)
    opts = PipelineOptions(inference_size=64, mask_refine=False)
    alpha, _ = pipe(img, tri, options=opts, caption=["hello"])
    assert alpha.shape == (1, 64, 64)
    assert np.isfinite(np.asarray(alpha)).all()


def test_pipeline_executable_cache(tiny_pipe, rng):
    img = rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)
    tri = np.ones((1, 64, 64), np.float32)
    opts = PipelineOptions(inference_size=64, mask_refine=False)
    tiny_pipe(img, tri, options=opts)
    before = dict(tiny_pipe._trace_counts)
    tiny_pipe(img, tri, options=opts)
    assert tiny_pipe._trace_counts == before  # no graph re-traced


def test_heavy_graph_survives_input_size_churn(tiny_pipe, rng):
    """N distinct input sizes must NOT recompile the model graph (VERDICT
    round 1, item 5): only the tiny pre/post resize graphs re-trace.  The
    reference handles arbitrary sizes recompile-free via host-side resize
    (sdmatte_nodes.py:362); here the same is achieved by splitting the jit
    graphs."""
    opts = PipelineOptions(inference_size=64, mask_refine=True)
    sizes = [(64, 64), (96, 80), (100, 52), (30, 44), (72, 120)]
    for h, w in sizes:
        img = rng.uniform(0, 1, (1, h, w, 3)).astype(np.float32)
        tri = np.ones((1, h, w), np.float32)
        alpha, matted = tiny_pipe(img, tri, options=opts)
        assert alpha.shape == (1, h, w)
    assert tiny_pipe._trace_counts["heavy"] <= 1
    assert tiny_pipe._trace_counts["pre"] == len(sizes)


def test_pipeline_warmup_precompiles(rng):
    """warmup() pays every compile up front: a subsequent real request at a
    warmed (size, batch) re-traces NOTHING."""
    cfg = SDMatteConfig.tiny()
    pipe = MattingPipeline(sdmatte.init(cfg, seed=0), cfg, attn_impl="xla")
    timings = pipe.warmup(sizes=(64,), batch_sizes=(1, 2),
                          options=PipelineOptions(mask_refine=True))
    assert set(timings) == {(64, 1), (64, 2)} and all(
        t > 0 for t in timings.values())
    # one heavy trace per batch size (graph is keyed on shapes)
    assert pipe._trace_counts["heavy"] == 2
    before = dict(pipe._trace_counts)
    img = rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)
    tri = np.ones((2, 64, 64), np.float32)
    opts = PipelineOptions(inference_size=64, mask_refine=True)
    alpha, _ = pipe(img, tri, options=opts)
    assert alpha.shape == (2, 64, 64)
    assert pipe._trace_counts == before
