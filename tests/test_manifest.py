"""De-circularized checkpoint validation (VERDICT round 1, item 2).

Round 1's checkpoint tests round-tripped through this repo's own exporter —
a shared misconception about the real SDMatte.safetensors key set would pass.
Here the expected keys are *independently derived* from the reference
topology (checkpoint/manifest.py, with reference file:line citations; the
CLIP tower's keys come from the actual transformers library) and frozen into
sdmatte_expected_keys.json.  The full-size param tree must absorb a synthetic
checkpoint bearing exactly those keys with zero missing / unexpected /
mismatched entries — and vice versa.
"""

import json
import os

import numpy as np
import pytest

from sdmatte_tpu.configs import SDMatteConfig
from sdmatte_tpu.checkpoint import manifest
from sdmatte_tpu.checkpoint.loader import load_into_tree

FROZEN = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      "sdmatte_tpu", "checkpoint", "sdmatte_expected_keys.json")


def _synthetic_ckpt(keys):
    """Zero-RAM state dict: broadcast views of a single zero scalar."""
    return {k: np.broadcast_to(np.float32(0.0), tuple(shape))
            for k, shape in keys.items()}


def test_frozen_manifest_matches_generator():
    """The checked-in JSON is exactly what the derivation produces today."""
    with open(FROZEN) as f:
        frozen = {k: tuple(v) for k, v in json.load(f).items()}
    gen = manifest.expected_keys(SDMatteConfig())
    assert frozen == gen


def test_manifest_scale_sanity():
    """~1.3k keys / ~1.3B params — the scale the 11 GB checkpoint implies."""
    with open(FROZEN) as f:
        frozen = json.load(f)
    assert len(frozen) > 1200
    n_params = sum(int(np.prod(v)) for v in frozen.values())
    assert 1.0e9 < n_params < 1.6e9


def test_clip_manual_enumeration_matches_transformers():
    """The hand enumeration (fallback) agrees with transformers' own
    state_dict for the full-size text tower."""
    cfg = SDMatteConfig().clip
    hf = manifest.clip_keys_from_transformers(cfg)
    manual = manifest.clip_keys_manual(cfg)
    assert manual == hf


@pytest.mark.slow
def test_full_size_tree_loads_frozen_key_set():
    """Init the FULL-SIZE tree; feed a synthetic checkpoint bearing exactly
    the frozen keys; assert missing == unexpected == mismatched == []."""
    from sdmatte_tpu.models import sdmatte
    with open(FROZEN) as f:
        frozen = {k: tuple(v) for k, v in json.load(f).items()}
    params = sdmatte.init(SDMatteConfig(), seed=0)
    params, report = load_into_tree(params, _synthetic_ckpt(frozen))
    assert report.missing == []
    assert report.unexpected == []
    assert report.mismatched == []
    assert report.loaded == len(frozen)


def test_tiny_tree_loads_generated_key_set():
    """Same assertion at tiny scale (fast CI guard for structural drift)."""
    from sdmatte_tpu.models import sdmatte
    cfg = SDMatteConfig.tiny()
    keys = {}
    keys.update(manifest.vae_keys(cfg.vae))
    keys.update(manifest.unet_keys(cfg.unet))
    keys.update(manifest.clip_keys_manual(cfg.clip))
    params = sdmatte.init(cfg, seed=0)
    params, report = load_into_tree(params, _synthetic_ckpt(keys))
    assert report.missing == []
    assert report.unexpected == []
    assert report.mismatched == []


def test_legacy_vae_attention_aliases_load():
    """The query/key/value/proj_attn legacy naming maps onto the same tree."""
    from sdmatte_tpu.models import sdmatte
    cfg = SDMatteConfig.tiny()
    keys = {}
    keys.update(manifest.vae_keys(cfg.vae))
    keys.update(manifest.unet_keys(cfg.unet))
    keys.update(manifest.clip_keys_manual(cfg.clip))
    legacy = manifest.legacy_vae_attn_variant(keys)
    assert legacy != keys  # the rename actually did something
    params = sdmatte.init(cfg, seed=0)
    params, report = load_into_tree(params, _synthetic_ckpt(legacy))
    assert report.missing == []
    assert report.unexpected == []
    assert report.mismatched == []


def test_external_verifier_ckpt_mode(tmp_path):
    """tools/verify_manifest_external.py --ckpt: the stdlib safetensors
    header reader + differ work end-to-end (the script itself ships to
    weights-capable hosts; here its mechanics run on a synthetic file)."""
    import importlib.util
    import subprocess
    import sys as _sys
    root = os.path.dirname(FROZEN).rsplit("sdmatte_tpu", 1)[0]
    script = os.path.join(root, "tools", "verify_manifest_external.py")

    keys = {"unet.conv_in.weight": (8, 4, 3, 3), "unet.conv_in.bias": (8,)}
    from safetensors.numpy import save_file
    ckpt = tmp_path / "toy.safetensors"
    save_file({k: np.zeros(v, np.float32) for k, v in keys.items()},
              str(ckpt))
    man = tmp_path / "manifest.json"
    man.write_text(json.dumps({k: list(v) for k, v in keys.items()}))

    r = subprocess.run([_sys.executable, script, "--manifest", str(man),
                        "--ckpt", str(ckpt)], capture_output=True, text=True)
    assert r.returncode == 0, r.stdout + r.stderr

    # a shape change and an extra key must be detected
    bad = dict(keys, **{"unet.conv_in.bias": (9,)})
    man.write_text(json.dumps({k: list(v) for k, v in bad.items()}))
    r = subprocess.run([_sys.executable, script, "--manifest", str(man),
                        "--ckpt", str(ckpt)], capture_output=True, text=True)
    assert r.returncode == 1 and "SHAPE MISMATCH" in r.stdout


def test_buffer_keys_ignored_not_unexpected():
    """position_ids-style buffers (older transformers exports) are ignored."""
    from sdmatte_tpu.models import sdmatte
    cfg = SDMatteConfig.tiny()
    keys = {}
    keys.update(manifest.vae_keys(cfg.vae))
    keys.update(manifest.unet_keys(cfg.unet))
    keys.update(manifest.clip_keys_manual(cfg.clip))
    ckpt = _synthetic_ckpt(keys)
    ckpt["text_encoder.text_model.embeddings.position_ids"] = \
        np.zeros((1, 77), np.int64)
    params = sdmatte.init(cfg, seed=0)
    params, report = load_into_tree(params, ckpt)
    assert report.unexpected == []
    assert report.ignored == ["text_encoder.text_model.embeddings.position_ids"]
