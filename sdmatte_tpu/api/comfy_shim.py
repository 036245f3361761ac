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


def register_default_dirs():
    d = os.path.join(models_dir(), "SDMatte")
    add_model_folder_path("SDMatte", d)
    return d
