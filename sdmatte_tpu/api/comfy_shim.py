"""ComfyUI host shims: use the real ``folder_paths``/``comfy`` when running
inside ComfyUI, else a standalone registry so the framework works anywhere
(CLI, tests, serving) — the reference hard-depends on the ComfyUI host
(reference sdmatte_nodes.py:5-12) and cannot run without it.
"""

from __future__ import annotations

import os
from typing import Dict, List

try:  # inside ComfyUI
    import folder_paths as _fp  # type: ignore
    HAVE_COMFY = True
except ImportError:
    _fp = None
    HAVE_COMFY = False

def _model_management():
    """Host device manager, resolved lazily (reference consults it per call,
    sdmatte_nodes.py:258) — lazy so a ComfyUI host that finishes its own
    imports after loading custom nodes is still picked up."""
    try:
        from comfy import model_management  # type: ignore
        return model_management
    except ImportError:
        return None


class _StandaloneRegistry:
    def __init__(self):
        root = os.environ.get("SDMATTE_TPU_MODELS_DIR",
                              os.path.join(os.path.expanduser("~"), ".cache",
                                           "sdmatte_tpu", "models"))
        self.models_dir = root
        self._paths: Dict[str, List[str]] = {}

    def add_model_folder_path(self, kind: str, path: str):
        self._paths.setdefault(kind, [])
        if path not in self._paths[kind]:
            self._paths[kind].append(path)

    def get_folder_paths(self, kind: str) -> List[str]:
        return list(self._paths.get(kind, []))


_registry = _StandaloneRegistry()


def models_dir() -> str:
    return _fp.models_dir if HAVE_COMFY else _registry.models_dir


def add_model_folder_path(kind: str, path: str):
    (_fp if HAVE_COMFY else _registry).add_model_folder_path(kind, path)


def get_folder_paths(kind: str) -> List[str]:
    try:
        return (_fp if HAVE_COMFY else _registry).get_folder_paths(kind) or []
    except Exception:
        return []


def host_prefers_cpu() -> bool:
    """True when a real ComfyUI host is present, its device manager resolves
    compute to CPU (``--cpu`` launch, no accelerator), AND JAX itself has no
    accelerator either.  The reference asks
    ``comfy.model_management.get_torch_device()`` per call (reference
    sdmatte_nodes.py:258-260), but that is only a valid device signal there
    because its compute runs in torch — torch cannot see a TPU, so on the
    primary deployment (ComfyUI launched with ``--cpu`` on a GPU-less TPU
    VM) the host's torch device is CPU while the matte should still run on
    the TPU.  The host signal therefore only implies ``force_cpu`` when the
    JAX backend is also CPU (nothing to accelerate with); an explicit
    ``force_cpu=True`` on the node remains the unconditional override.
    Standalone (no ComfyUI): always False.
    """
    mm = _model_management()
    if mm is None:
        return False
    try:
        if getattr(mm.get_torch_device(), "type", None) != "cpu":
            return False
    except Exception:
        return False
    import jax
    try:
        return jax.default_backend() == "cpu"
    except Exception:
        return True  # host says CPU and JAX backend is broken: stay on CPU


def soft_empty_cache() -> None:
    """Release the host's torch device caches after a matte, mirroring the
    reference's post-run ``torch.cuda.empty_cache()`` (reference
    sdmatte_nodes.py:399-403) through the host's own policy hook.  Our
    weights live in JAX buffers (invisible to torch), but the node hands
    torch tensors back to the host — flushing through
    ``comfy.model_management.soft_empty_cache`` keeps the host's VRAM
    accounting identical to the reference plugin's.  No-op standalone.
    """
    mm = _model_management()
    if mm is None:
        return
    try:
        mm.soft_empty_cache()
    except Exception:
        pass


def register_default_dirs():
    d = os.path.join(models_dir(), "SDMatte")
    add_model_folder_path("SDMatte", d)
    return d
