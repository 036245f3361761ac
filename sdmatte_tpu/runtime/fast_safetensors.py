"""ctypes binding for the native safetensors reader (fast_safetensors.cpp).

Compiles the shared library on first use (g++ -O2 -shared) and returns
checkpoint tensors as ZERO-COPY numpy views over the mmap'd file with
kernel readahead hints — no second host copy of the 11 GB checkpoint
(the reference materializes every tensor through Python first,
reference sdmatte_nodes.py:300-305).

Falls back transparently (checkpoint/loader catches any failure here and
uses the pure-Python safetensors package).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Dict

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "fast_safetensors.cpp")
_SO = os.path.join(_HERE, "_fast_safetensors.so")

_DTYPES = {
    "F64": np.float64, "F32": np.float32, "F16": np.float16,
    "BF16": None,  # handled specially (numpy has no bfloat16)
    "I64": np.int64, "I32": np.int32, "I16": np.int16, "I8": np.int8,
    "U8": np.uint8, "BOOL": np.bool_, "U16": np.uint16,
    "U32": np.uint32, "U64": np.uint64,
}

_lib = None
_lock = threading.Lock()


def _build() -> str:
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return _SO
    tmp = _SO + ".tmp"
    subprocess.run(
        ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", tmp],
        check=True, capture_output=True)
    os.replace(tmp, _SO)
    return _SO


def _load_lib():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        lib = ctypes.CDLL(_build())
        lib.stf_open.restype = ctypes.c_void_p
        lib.stf_open.argtypes = [ctypes.c_char_p]
        lib.stf_error.restype = ctypes.c_char_p
        lib.stf_error.argtypes = [ctypes.c_void_p]
        lib.stf_num_tensors.restype = ctypes.c_int64
        lib.stf_num_tensors.argtypes = [ctypes.c_void_p]
        lib.stf_name.restype = ctypes.c_char_p
        lib.stf_name.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.stf_dtype.restype = ctypes.c_char_p
        lib.stf_dtype.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.stf_ndim.restype = ctypes.c_int32
        lib.stf_ndim.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.stf_shape.restype = None
        lib.stf_shape.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                  ctypes.POINTER(ctypes.c_int64)]
        lib.stf_data.restype = ctypes.POINTER(ctypes.c_uint8)
        lib.stf_data.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.stf_nbytes.restype = ctypes.c_int64
        lib.stf_nbytes.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.stf_prefetch.restype = None
        lib.stf_prefetch.argtypes = [ctypes.c_void_p]
        lib.stf_close.restype = None
        lib.stf_close.argtypes = [ctypes.c_void_p]
        _lib = lib
        return lib


class _MmapFile:
    """Keeps the mmap alive as long as any tensor view references it."""

    def __init__(self, handle, lib):
        self._handle = handle
        self._lib = lib

    def __del__(self):
        try:
            self._lib.stf_close(self._handle)
        except Exception:
            pass


class StfDict(dict):
    """Tensor dict that owns the underlying mmap (views stay valid as long as
    this dict — or any re-referenced view-holding structure — is alive)."""

    _stf_keeper = None


def read(path: str) -> Dict[str, np.ndarray]:
    """path -> {name: np array}: zero-copy views over the mmap'd file."""
    lib = _load_lib()
    h = lib.stf_open(path.encode())
    err = lib.stf_error(h)
    if err:
        msg = err.decode()
        lib.stf_close(h)
        raise IOError(f"fast_safetensors: {msg}: {path}")
    keeper = _MmapFile(h, lib)
    lib.stf_prefetch(h)

    out = StfDict()
    out._stf_keeper = keeper
    n = lib.stf_num_tensors(h)
    for i in range(n):
        name = lib.stf_name(h, i).decode()
        dt = lib.stf_dtype(h, i).decode()
        ndim = lib.stf_ndim(h, i)
        shape = (ctypes.c_int64 * max(ndim, 1))()
        lib.stf_shape(h, i, shape)
        shp = tuple(shape[d] for d in range(ndim))
        nbytes = lib.stf_nbytes(h, i)
        ptr = lib.stf_data(h, i)
        buf = (ctypes.c_uint8 * nbytes).from_address(
            ctypes.addressof(ptr.contents))
        if dt == "BF16":
            arr = np.frombuffer(buf, dtype=np.uint16).reshape(shp)
            try:
                import ml_dtypes
                arr = arr.view(ml_dtypes.bfloat16)
            except ImportError:
                arr = arr.astype(np.uint32) << 16
                arr = arr.view(np.float32)  # widen bf16 -> f32
        else:
            npdt = _DTYPES.get(dt)
            if npdt is None:
                raise IOError(f"fast_safetensors: unsupported dtype {dt}")
            arr = np.frombuffer(buf, dtype=npdt).reshape(shp)
        out[name] = arr
    return out
