"""Toy-checkpoint generator: writes a torch-layout safetensors file from a
param tree (the inverse of loader._convert).  Gives CI a real end-to-end
checkpoint path without 11 GB weights (SURVEY.md §4.3)."""

from __future__ import annotations

from typing import Dict

import numpy as np


def tree_to_torch_state_dict(params: dict) -> Dict[str, np.ndarray]:
    out = {}

    def walk(node, path):
        for k, v in node.items():
            if isinstance(v, dict):
                walk(v, path + (k,))
                continue
            arr = np.asarray(v, dtype=np.float32)
            if k == "kernel" and arr.ndim == 4:
                out[".".join(path) + ".weight"] = arr.transpose(3, 2, 0, 1)
            elif k == "kernel" and arr.ndim == 2:
                out[".".join(path) + ".weight"] = arr.transpose(1, 0)
            elif k == "scale":
                out[".".join(path) + ".weight"] = arr
            elif k == "embedding":
                out[".".join(path) + ".weight"] = arr
            else:
                out[".".join(path) + "." + k] = arr

    walk(params, ())
    return out


def save_toy_checkpoint(params: dict, path: str):
    from safetensors.numpy import save_file
    save_file(tree_to_torch_state_dict(params), path)
