"""Checkpoint loader tests: torch-layout roundtrip, strict=False semantics,
wrapper-prefix unwrapping, legacy VAE attention aliases."""

import numpy as np
import jax.numpy as jnp
import pytest

from sdmatte_tpu.configs import SDMatteConfig
from sdmatte_tpu.models import sdmatte
from sdmatte_tpu.checkpoint import loader, torch_key_to_path
from sdmatte_tpu.checkpoint.toy import tree_to_torch_state_dict, save_toy_checkpoint


@pytest.fixture(scope="module")
def tiny():
    cfg = SDMatteConfig.tiny()
    return cfg, sdmatte.init(cfg, seed=3)


def test_key_mapping():
    path, leaf = torch_key_to_path("vae.encoder.mid_block.attentions.0.to_q.weight")
    assert path == ("vae", "encoder", "mid_block", "attentions", "0", "to_q")
    assert leaf == "weight"
    # legacy alias normalization
    path, _ = torch_key_to_path("vae.encoder.mid_block.attentions.0.query.weight")
    assert path[-1] == "to_q"


def test_roundtrip_exact(tiny, tmp_path):
    cfg, params = tiny
    sd = tree_to_torch_state_dict(params)
    fresh = sdmatte.init(cfg, seed=99)  # different values, same shapes
    loaded, report = loader.load_into_tree(fresh, sd)
    assert report.loaded == len(sd)
    assert not report.unexpected and not report.mismatched and not report.missing
    # exact equality after the double layout transpose
    ref_leaf = params["unet"]["down_blocks"]["0"]["attentions"]["0"]["proj_in"]["kernel"]
    got_leaf = loaded["unet"]["down_blocks"]["0"]["attentions"]["0"]["proj_in"]["kernel"]
    np.testing.assert_array_equal(np.asarray(ref_leaf), np.asarray(got_leaf))
    conv_ref = params["vae"]["encoder"]["conv_in"]["kernel"]
    conv_got = loaded["vae"]["encoder"]["conv_in"]["kernel"]
    np.testing.assert_array_equal(np.asarray(conv_ref), np.asarray(conv_got))


def test_safetensors_file_roundtrip(tiny, tmp_path):
    cfg, params = tiny
    p = str(tmp_path / "toy.safetensors")
    save_toy_checkpoint(params, p)
    fresh = sdmatte.init(cfg, seed=42)
    loaded, report = loader.load_sdmatte_checkpoint(fresh, p)
    assert report.missing == [] and report.unexpected == []
    emb_ref = params["text_encoder"]["text_model"]["embeddings"]["token_embedding"]["embedding"]
    emb_got = loaded["text_encoder"]["text_model"]["embeddings"]["token_embedding"]["embedding"]
    np.testing.assert_array_equal(np.asarray(emb_ref), np.asarray(emb_got))


def test_strict_false_semantics(tiny):
    cfg, params = tiny
    sd = tree_to_torch_state_dict(params)
    # remove one tensor -> missing; add junk -> unexpected; wrong shape -> mismatched
    del sd["unet.conv_out.weight"]
    sd["unet.nonexistent.weight"] = np.zeros((3, 3), np.float32)
    sd["unet.conv_out.bias"] = np.zeros((999,), np.float32)
    fresh = sdmatte.init(cfg, seed=7)
    orig_bias = np.asarray(fresh["unet"]["conv_out"]["bias"]).copy()
    loaded, report = loader.load_into_tree(fresh, sd)
    assert any("unet.conv_out.kernel" in m for m in report.missing)
    assert "unet.nonexistent.weight" in report.unexpected
    assert report.mismatched and report.mismatched[0][0] == "unet.conv_out.bias"
    # init value kept on mismatch (strict=False)
    np.testing.assert_array_equal(np.asarray(loaded["unet"]["conv_out"]["bias"]), orig_bias)


def test_wrapper_prefix_unwrap(tiny):
    cfg, params = tiny
    sd = tree_to_torch_state_dict(params)
    wrapped = {"module." + k: v for k, v in sd.items()}
    fresh = sdmatte.init(cfg, seed=5)
    loaded, report = loader.load_into_tree(fresh, wrapped)
    assert report.loaded == len(sd) and not report.unexpected


def test_dtype_cast(tiny):
    cfg, params = tiny
    sd = tree_to_torch_state_dict(params)
    fresh = sdmatte.init(cfg, seed=5)
    loaded, _ = loader.load_into_tree(fresh, sd, dtype=jnp.bfloat16)
    assert loaded["unet"]["conv_in"]["kernel"].dtype == jnp.bfloat16
