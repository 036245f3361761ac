"""Checkpoint writer: param tree -> torch-layout safetensors.

Two uses: (a) toy checkpoints for CI without 11 GB weights (SURVEY.md §4.3),
and (b) saving fine-tuned params from parallel/train in the SAME format the
reference ecosystem consumes — a round-trip the reference itself never had
(inference-only, SURVEY.md §5 checkpoint/resume)."""

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


# canonical name for the production save path (same implementation)
save_sdmatte_checkpoint = save_toy_checkpoint
