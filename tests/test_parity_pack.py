"""Parity pack (python -m sdmatte_tpu.parity_pack) end-to-end on a
synthetic checkpoint (VERDICT r3 item 4): every stage runs cold against a
file this repo wrote in the reference's torch layout, and the
transpose-sensitive signature check actually catches a layout bug."""

import json

import numpy as np
import pytest

from sdmatte_tpu import parity_pack
from sdmatte_tpu.configs import SDMatteConfig
from sdmatte_tpu.checkpoint.toy import tree_to_torch_state_dict
from sdmatte_tpu.models import sdmatte


@pytest.fixture(scope="module")
def tiny_ckpt(tmp_path_factory):
    from safetensors.numpy import save_file
    cfg = SDMatteConfig.tiny()
    params = sdmatte.init(cfg, seed=3)
    sd = tree_to_torch_state_dict(params)
    path = tmp_path_factory.mktemp("pp") / "tiny.safetensors"
    save_file(sd, str(path))
    return str(path), sd


def test_parity_pack_passes_on_clean_checkpoint(tiny_ckpt, tmp_path):
    path, _ = tiny_ckpt
    out = tmp_path / "report.json"
    rc = parity_pack.run([
        "--ckpt", path, "--tiny", "--size", "64",
        "--golden-out", str(tmp_path / "golden.npz"),
        "--out", str(out),
    ])
    assert rc == 0
    rep = json.loads(out.read_text())
    assert rep["ok"]
    assert rep["stages"]["header_vs_manifest"]["ok"]
    assert rep["stages"]["load_report"]["ok"]
    assert rep["stages"]["layout_signatures"]["ok"]
    assert rep["stages"]["golden"]["ok"]
    assert "quality" in rep["stages"]
    assert (tmp_path / "golden.npz").exists()


def test_parity_pack_catches_loader_layout_bug(tiny_ckpt, monkeypatch):
    """The file is ground truth; the risk is OUR loader converting layouts
    wrongly.  Simulate the classic bug — linear weights loaded WITHOUT the
    (out,in)->(in,out) transpose — and the signature check must fail on
    every square linear (shape checks can't see those)."""
    from sdmatte_tpu.checkpoint import loader
    from sdmatte_tpu.checkpoint.loader import read_safetensors

    path, _ = tiny_ckpt
    orig_convert = loader._convert

    def buggy_convert(leaf_name, p, arr):
        name, out = orig_convert(leaf_name, p, arr)
        if name == "kernel" and arr.ndim == 2:
            return name, arr            # forgot the transpose
        return name, out

    monkeypatch.setattr(loader, "_convert", buggy_convert)
    cfg = SDMatteConfig.tiny()
    params = sdmatte.init(cfg, seed=3)
    params, rep = loader.load_sdmatte_checkpoint(params, path)
    monkeypatch.undo()

    # square linears load shape-clean despite the bug...
    assert not rep.mismatched or all(
        a != tuple(reversed(b)) or a[0] != a[1]
        for _, a, b in rep.mismatched)
    # ...and only the signatures catch them
    failures = parity_pack.check_loaded_stats(params,
                                              read_safetensors(path))
    assert failures
    assert any("to_q" in f or "to_k" in f or "proj" in f for f in failures)


def test_parity_pack_catches_flipped_conv_taps(tiny_ckpt):
    """A conv loaded with spatially flipped taps (the cross-correlation vs
    convolution classic) keeps every shape and channel stat — the
    tap-position grid signature is what catches it."""
    from sdmatte_tpu.checkpoint.loader import (read_safetensors,
                                               load_sdmatte_checkpoint)
    path, _ = tiny_ckpt
    cfg = SDMatteConfig.tiny()
    params = sdmatte.init(cfg, seed=3)
    params, _ = load_sdmatte_checkpoint(params, path)
    # flip one loaded 3x3 kernel's taps in the tree
    node = params["vae"]["encoder"]["conv_in"]
    node["kernel"] = np.asarray(node["kernel"])[::-1, ::-1].copy()
    failures = parity_pack.check_loaded_stats(params,
                                              read_safetensors(path))
    assert any("conv_in" in f and "tap_grid" in f for f in failures)


def test_parity_pack_frozen_stats_roundtrip(tiny_ckpt, tmp_path):
    path, sd = tiny_ckpt
    stats = tmp_path / "stats.json"
    rc = parity_pack.run([
        "--ckpt", path, "--tiny", "--size", "64",
        "--skip-golden", "--skip-quality",
        "--emit-stats", str(stats),
    ])
    assert rc == 0 and stats.exists()
    # same file re-checked against its own frozen stats: clean
    rc = parity_pack.run([
        "--ckpt", path, "--tiny", "--size", "64",
        "--skip-golden", "--skip-quality",
        "--check-stats", str(stats),
        "--out", str(tmp_path / "r2.json"),
    ])
    assert rc == 0
    # a perturbed tensor drifts the frozen signatures
    from safetensors.numpy import save_file
    bad = dict(sd)
    key = next(k for k, v in bad.items() if v.ndim == 4)
    bad[key] = bad[key] + 0.25
    bad_path = tmp_path / "drift.safetensors"
    save_file(bad, str(bad_path))
    rc = parity_pack.run([
        "--ckpt", str(bad_path), "--tiny", "--size", "64",
        "--skip-golden", "--skip-quality",
        "--check-stats", str(stats),
    ])
    assert rc == 1
