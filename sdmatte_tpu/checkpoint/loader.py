"""safetensors -> JAX param-tree checkpoint loader.

The reference loads ``SDMatte(.plus).safetensors`` tensor-by-tensor on CPU,
unwraps nested checkpoint dicts through 11 candidate keys, and does a
``load_state_dict(strict=False)`` (reference sdmatte_nodes.py:300-321).

This loader reproduces those semantics for a functional param tree:

  * torch key path -> tree path is mechanical (our tree mirrors torch names)
  * layout conversion at load: conv OIHW->HWIO, linear (out,in)->(in,out),
    norm weight->scale; embedding tables pass through
  * legacy diffusers VAE attention aliases (query/key/value/proj_attn)
  * prefix unwrapping mirrors the reference's candidate keys
  * strict=False: report missing/unexpected/shape-mismatched, keep init values

Tensors mmap straight from disk (numpy framework, zero-copy) and are placed
on device in the caller-requested dtype — the 11 GB checkpoint never holds a
second host copy.  When the optional C++ fast reader (runtime/) is built it
is used for header parsing + readahead; this pure-Python path is the fallback.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import numpy as np
import jax.numpy as jnp

# the reference's nested-checkpoint candidate keys (sdmatte_nodes.py:307-319)
CANDIDATE_PREFIXES = [
    "state_dict.", "model_state_dict.", "params.", "weights.",
    "ema.", "model_ema.", "ema_state_dict.", "net.", "module.", "model.",
]

# legacy diffusers VAE attention names -> modern ones
_VAE_ATTN_ALIASES = {
    "query": "to_q", "key": "to_k", "value": "to_v", "proj_attn": "to_out.0",
}

# parameterless torch buffers that appear in some exports' state_dicts
# (older transformers registered position_ids as a persistent buffer); they
# carry no weights and must not count as "unexpected"
_IGNORED_BUFFER_SUFFIXES = ("position_ids", "num_batches_tracked")


@dataclasses.dataclass
class LoadReport:
    loaded: int = 0
    missing: List[str] = dataclasses.field(default_factory=list)      # in tree, not in ckpt
    unexpected: List[str] = dataclasses.field(default_factory=list)   # in ckpt, not in tree
    mismatched: List[Tuple[str, tuple, tuple]] = dataclasses.field(default_factory=list)
    ignored: List[str] = dataclasses.field(default_factory=list)      # known buffers

    def summary(self) -> str:
        return (f"loaded={self.loaded} missing={len(self.missing)} "
                f"unexpected={len(self.unexpected)} mismatched={len(self.mismatched)}")


def _normalize_key(key: str) -> str:
    for old, new in _VAE_ATTN_ALIASES.items():
        key = key.replace(f".attentions.0.{old}.", f".attentions.0.{new}.")
    return key


def torch_key_to_path(key: str) -> Tuple[Tuple[str, ...], str]:
    """'vae.encoder.mid_block.attentions.0.to_q.weight'
       -> (('vae','encoder','mid_block','attentions','0','to_q'), 'weight')."""
    parts = _normalize_key(key).split(".")
    return tuple(parts[:-1]), parts[-1]


def _convert(leaf_name: str, path: Tuple[str, ...], arr: np.ndarray):
    """-> (tree_leaf_name, converted_array)."""
    if leaf_name == "bias":
        return "bias", arr
    if leaf_name != "weight":
        return leaf_name, arr
    if arr.ndim == 4:                       # conv OIHW -> HWIO
        return "kernel", arr.transpose(2, 3, 1, 0)
    if arr.ndim == 2:
        if path and path[-1] in ("token_embedding", "position_embedding"):
            return "embedding", arr         # lookup tables stay (vocab, dim)
        return "kernel", arr.transpose(1, 0)
    return "scale", arr                     # 1-D norm weight


def _strip_wrapper_prefix(keys) -> str:
    """If ALL keys share one candidate wrapper prefix, strip it (the flat-file
    analogue of the reference's nested-dict unwrapping)."""
    for pref in CANDIDATE_PREFIXES:
        if all(k.startswith(pref) for k in keys):
            return pref
    return ""


def _tree_leaf_paths(tree, prefix=()):
    for k, v in tree.items():
        if isinstance(v, dict):
            yield from _tree_leaf_paths(v, prefix + (k,))
        else:
            yield prefix + (k,), v


def load_into_tree(
    params: dict,
    tensors: Dict[str, np.ndarray],
    *,
    dtype: Optional[jnp.dtype] = None,
    prefix_map: Optional[Dict[str, str]] = None,
) -> Tuple[dict, LoadReport]:
    """Load a flat torch-style state dict into an initialized param tree.

    ``params`` provides the target structure/shapes (strict=False semantics:
    anything absent from the checkpoint keeps its init value).
    ``prefix_map`` optionally remaps top-level torch prefixes to tree roots.
    """
    report = LoadReport()
    keys = list(tensors.keys())
    wrapper = _strip_wrapper_prefix(keys)

    seen = set()
    for key in keys:
        k = key[len(wrapper):]
        if k.endswith(_IGNORED_BUFFER_SUFFIXES):
            report.ignored.append(key)
            continue
        if prefix_map:
            for old, new in prefix_map.items():
                if k.startswith(old):
                    k = new + k[len(old):]
                    break
        path, leaf = torch_key_to_path(k)
        leaf_name, arr = _convert(leaf, path, np.asarray(tensors[key]))

        node = params
        ok = True
        for p in path:
            if not isinstance(node, dict) or p not in node:
                ok = False
                break
            node = node[p]
        if not ok or not isinstance(node, dict) or leaf_name not in node:
            report.unexpected.append(key)
            continue
        target = node[leaf_name]
        if tuple(target.shape) != tuple(arr.shape):
            report.mismatched.append((key, tuple(target.shape), tuple(arr.shape)))
            continue
        node[leaf_name] = jnp.asarray(arr, dtype or target.dtype)
        report.loaded += 1
        seen.add(path + (leaf_name,))

    for path, _ in _tree_leaf_paths(params):
        if path not in seen:
            report.missing.append(".".join(path))
    return params, report


def read_safetensors(path: str) -> Dict[str, np.ndarray]:
    """mmap a .safetensors file to a dict of numpy views (zero-copy).

    Prefers the C++ fast reader (runtime/) when built; falls back to the
    ``safetensors`` python package.
    """
    try:
        from ..runtime.fast_safetensors import read as fast_read
        return fast_read(path)
    except Exception:
        pass
    from safetensors import safe_open
    out = {}
    with safe_open(path, framework="np") as f:
        for k in f.keys():
            out[k] = f.get_tensor(k)
    return out


def read_torch_pickle(path: str) -> Dict[str, np.ndarray]:
    """Legacy ``.pth`` checkpoints (the reference README claims historical
    .pth support though its shipped path is safetensors-only — SURVEY.md §5).
    Unwraps the same nested candidate keys the reference probes
    (sdmatte_nodes.py:307-319)."""
    import torch
    obj = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(obj, dict):
        for k in ("state_dict", "model_state_dict", "params", "weights",
                  "ema", "model_ema", "ema_state_dict", "net", "module",
                  "model", "unet"):
            inner = obj.get(k)
            if isinstance(inner, dict):
                obj = inner
                break
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
            for k, v in obj.items()}


def load_sdmatte_checkpoint(params: dict, ckpt_path: str, *,
                            dtype: Optional[jnp.dtype] = None) -> Tuple[dict, LoadReport]:
    """Load SDMatte(.plus) weights (.safetensors or legacy .pth) into a full
    meta-arch param tree."""
    if ckpt_path.endswith((".pth", ".pt", ".bin", ".ckpt")):
        tensors = read_torch_pickle(ckpt_path)
    else:
        tensors = read_safetensors(ckpt_path)
    return load_into_tree(params, tensors, dtype=dtype)
