"""Node API surface + prompt paths + compat loaders."""

import json
import os

import numpy as np
import torch
import jax.numpy as jnp
import pytest

from sdmatte_tpu.configs import SDMatteConfig, SchedulerConfig
from sdmatte_tpu.models import sdmatte
from sdmatte_tpu.pipeline import MattingPipeline, PipelineOptions


@pytest.fixture(scope="module")
def tiny_pipe():
    cfg = SDMatteConfig.tiny()
    params = sdmatte.init(cfg, seed=0)
    return MattingPipeline(params, cfg, attn_impl="xla")


# ------------------------------------------------------------ node schema ---

def test_input_types_schema_is_reference_compatible():
    from sdmatte_tpu.api.node import SDMatteApply
    t = SDMatteApply.INPUT_TYPES()
    req = t["required"]
    assert list(req["ckpt_name"][0]) == ["SDMatte.safetensors",
                                         "SDMatte_plus.safetensors"]
    assert req["image"][0] == "IMAGE"
    assert req["trimap"][0] == "MASK"
    assert req["inference_size"][0] == [512, 640, 768, 896, 1024]
    assert req["inference_size"][1]["default"] == 1024
    assert req["output_mode"][0] == ["alpha_only", "matted_rgba", "matted_rgb"]
    assert req["output_mode"][1]["default"] == "alpha_only"
    assert req["mask_refine"][1]["default"] is True
    tc = req["trimap_constraint"][1]
    assert (tc["default"], tc["min"], tc["max"], tc["step"]) == (0.8, 0.1, 1.0, 0.1)
    assert t["optional"]["force_cpu"][0] == "BOOLEAN"
    assert SDMatteApply.RETURN_TYPES == ("MASK", "IMAGE")
    assert SDMatteApply.RETURN_NAMES == ("alpha_mask", "matted_image")
    assert SDMatteApply.FUNCTION == "apply_matte"
    assert SDMatteApply.CATEGORY == "Matting/SDMatte"


def test_node_apply_matte_with_torch_tensors(tiny_pipe, monkeypatch):
    """Drive the node exactly as ComfyUI would (torch in, torch out)."""
    from sdmatte_tpu.api import node as node_mod
    monkeypatch.setattr(node_mod, "get_pipeline", lambda *a, **k: tiny_pipe)
    node = node_mod.SDMatteApply()
    img = torch.rand(1, 96, 80, 3)
    tri = torch.rand(1, 96, 80)
    alpha, matted = node.apply_matte(
        "SDMatte.safetensors", img, tri, 64, False, "matted_rgb", True, 0.8)
    assert isinstance(alpha, torch.Tensor) and isinstance(matted, torch.Tensor)
    assert alpha.shape == (1, 96, 80)
    assert matted.shape == (1, 96, 80, 3)
    # tensors must be writable: torch.from_numpy over the jax-backed
    # (read-only) buffer hands ComfyUI a tensor whose mutation is undefined
    # behavior — downstream mask nodes routinely edit in place
    alpha[0, 0, 0] = 0.5
    matted[0, 0, 0, 0] = 0.5


# ----------------------------------------------------------- prompt paths ---

@pytest.mark.parametrize("aux,coords_shape", [
    ("point_mask", (1, 10)),     # 5 points (x,y) flattened
    ("bbox_mask", (1, 4)),
    ("mask", (1, 4)),
    ("auto_mask", (1, 4)),
])
def test_pipeline_visual_prompt_paths(tiny_pipe, rng, aux, coords_shape):
    """Full upstream prompt API beyond trimap (BASELINE config 4)."""
    img = rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)
    mask = rng.uniform(0, 1, (1, 64, 64)).astype(np.float32)
    coords = rng.uniform(0, 1, coords_shape).astype(np.float32)
    opts = PipelineOptions(inference_size=64, aux_input=aux, mask_refine=False)
    alpha, _ = tiny_pipe(img, mask, options=opts, coords=coords)
    assert alpha.shape == (1, 64, 64)
    assert np.isfinite(np.asarray(alpha)).all()


# ---------------------------------------------------------------- compat ---

def test_pth_checkpoint_loading(tmp_path):
    from sdmatte_tpu.checkpoint import loader
    from sdmatte_tpu.checkpoint.toy import tree_to_torch_state_dict
    cfg = SDMatteConfig.tiny()
    params = sdmatte.init(cfg, seed=1)
    sd = {k: torch.from_numpy(np.asarray(v))
          for k, v in tree_to_torch_state_dict(params).items()}
    p = str(tmp_path / "legacy.pth")
    torch.save({"state_dict": sd}, p)
    fresh = sdmatte.init(cfg, seed=2)
    loaded, report = loader.load_sdmatte_checkpoint(fresh, p)
    assert report.missing == [] and report.unexpected == []
    np.testing.assert_array_equal(
        np.asarray(loaded["unet"]["conv_in"]["kernel"]),
        np.asarray(params["unet"]["conv_in"]["kernel"]))


def test_scheduler_config_parse(tmp_path):
    p = tmp_path / "scheduler_config.json"
    p.write_text(json.dumps({"num_train_timesteps": 1000,
                             "beta_schedule": "scaled_linear",
                             "prediction_type": "v_prediction",
                             "unknown_field": 42}))
    sc = SchedulerConfig.from_json(str(p))
    assert sc.prediction_type == "v_prediction"
    assert sc.num_train_timesteps == 1000


def test_config_roundtrip_from_pretrained_dir(tmp_path):
    base = tmp_path / "sd21"
    for sub, fname, payload in [
        ("vae", "config.json", {"block_out_channels": [8, 16, 16, 16],
                                "norm_num_groups": 4, "layers_per_block": 1}),
        ("unet", "config.json", {"block_out_channels": [16, 24, 32, 32],
                                 "cross_attention_dim": 32,
                                 "attention_head_dim": [2, 2, 4, 4],
                                 "norm_num_groups": 8}),
        ("text_encoder", "config.json", {"hidden_size": 32,
                                         "num_hidden_layers": 2,
                                         "num_attention_heads": 4,
                                         "intermediate_size": 64,
                                         "vocab_size": 1000}),
        ("scheduler", "scheduler_config.json", {"steps_offset": 1}),
    ]:
        d = base / sub
        d.mkdir(parents=True, exist_ok=True)
        (d / fname).write_text(json.dumps(payload))
    cfg = SDMatteConfig.from_pretrained_dir(str(base))
    assert cfg.vae.block_out_channels == (8, 16, 16, 16)
    assert cfg.unet.cross_attention_dim == 32
    assert cfg.clip.num_layers == 2
    assert cfg.scheduler.steps_offset == 1


# ------------------------------------------- host model_management shim ---

def _fake_mm(device_type, calls):
    import types
    mm = types.ModuleType("comfy.model_management")

    class _Dev:
        type = device_type
    mm.get_torch_device = lambda: _Dev()
    mm.soft_empty_cache = lambda: calls.append("flush")
    return mm


def test_host_device_manager_integration(tiny_pipe, monkeypatch):
    """Inside a (faked) ComfyUI host: a CPU-only deployment makes force_cpu
    implicit, and the node flushes the host's cache after every matte —
    mirroring reference sdmatte_nodes.py:258-260 and :399-403."""
    import sys
    from sdmatte_tpu.api import comfy_shim, node as node_mod

    calls = []
    comfy_pkg = type(sys)("comfy")
    mm = _fake_mm("cpu", calls)
    comfy_pkg.model_management = mm
    monkeypatch.setitem(sys.modules, "comfy", comfy_pkg)
    monkeypatch.setitem(sys.modules, "comfy.model_management", mm)

    assert comfy_shim.host_prefers_cpu() is True
    comfy_shim.soft_empty_cache()
    assert calls == ["flush"]

    seen = {}

    def fake_get_pipeline(name, *, force_cpu=False, **kw):
        seen["force_cpu"] = force_cpu
        return tiny_pipe
    monkeypatch.setattr(node_mod, "get_pipeline", fake_get_pipeline)
    node = node_mod.SDMatteApply()
    node.apply_matte("SDMatte.safetensors", torch.rand(1, 64, 64, 3),
                     torch.rand(1, 64, 64), 64, False, "alpha_only",
                     True, 0.8)
    assert seen["force_cpu"] is True          # host CPU policy honored
    assert calls[-1] == "flush"               # post-run cache flush

    mm_gpu = _fake_mm("cuda", calls)
    comfy_pkg.model_management = mm_gpu
    monkeypatch.setitem(sys.modules, "comfy.model_management", mm_gpu)
    assert comfy_shim.host_prefers_cpu() is False


def test_host_cpu_does_not_override_tpu(monkeypatch):
    """Host torch device == CPU must NOT imply force_cpu when JAX has an
    accelerator: torch cannot see a TPU, so on a GPU-less TPU VM the host
    always reports CPU while the matte should run on the TPU (ADVICE r4)."""
    import sys
    import jax
    from sdmatte_tpu.api import comfy_shim

    calls = []
    comfy_pkg = type(sys)("comfy")
    mm = _fake_mm("cpu", calls)
    comfy_pkg.model_management = mm
    monkeypatch.setitem(sys.modules, "comfy", comfy_pkg)
    monkeypatch.setitem(sys.modules, "comfy.model_management", mm)

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert comfy_shim.host_prefers_cpu() is False
    monkeypatch.setattr(jax, "default_backend", lambda: "cpu")
    assert comfy_shim.host_prefers_cpu() is True


def test_host_manager_absent_is_noop():
    """Standalone (no ComfyUI import available): both hooks are no-ops."""
    from sdmatte_tpu.api import comfy_shim
    assert comfy_shim.host_prefers_cpu() is False
    comfy_shim.soft_empty_cache()  # must not raise


def test_package_import_enables_persistent_compile_cache():
    """Regression guard for the round-5 discovery that jax 0.9 silently
    ignores the JAX_COMPILATION_CACHE_DIR env var: importing sdmatte_tpu
    must have set the jax config key (the only channel that works), so
    every surface (CLI, node, serve, bench, driver entry) gets cross-run
    executable caching.  Root cause of the round-4 bench timeout."""
    import jax

    import sdmatte_tpu  # noqa: F401  (already imported; idempotent)

    cache_dir = jax.config.jax_compilation_cache_dir
    assert cache_dir, "persistent compile cache not enabled at import"
    assert "jax_comp_cache" in cache_dir or os.environ.get(
        "JAX_COMPILATION_CACHE_DIR") == cache_dir
