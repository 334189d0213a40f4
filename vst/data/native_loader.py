"""ctypes binding for the native threaded .npy batch loader.

Builds ``libvstloader.so`` from ``vst/native/loader.cc`` on first use (g++,
cached beside the source); every call falls back to numpy per file on any
failure, so the pipeline never hard-depends on the native path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.dirname(__file__)), "native",
                    "loader.cc")
_SO = os.path.join(os.path.dirname(_SRC), "libvstloader.so")

_lib = None
_build_failed = False


def _get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    try:
        if (not os.path.exists(_SO)
                or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-o", _SO, _SRC,
                 "-lpthread"],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(_SO)
        lib.vst_load_npy_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_size_t), ctypes.c_int,
        ]
        lib.vst_load_npy_batch.restype = None
        _lib = lib
    except (subprocess.CalledProcessError, OSError):
        _build_failed = True
    return _lib


def native_available() -> bool:
    return _get_lib() is not None


def load_npy_batch(paths: List[str], shape, n_threads: int = 8) -> np.ndarray:
    """Reads len(paths) float32 .npy files of identical `shape` into one
    (N, *shape) array, file I/O parallelized in C++ (GIL released).
    Falls back to np.load per file."""
    n = len(paths)
    slot = int(np.prod(shape))
    out = np.empty((n, slot), np.float32)

    lib = _get_lib()
    if lib is not None:
        c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
        counts = (ctypes.c_size_t * n)()
        lib.vst_load_npy_batch(
            c_paths, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            slot, counts, n_threads,
        )
        for i in range(n):
            if counts[i] != slot:  # unsupported file → numpy fallback
                out[i] = np.load(paths[i]).astype(np.float32).reshape(-1)
    else:
        for i in range(n):
            out[i] = np.load(paths[i]).astype(np.float32).reshape(-1)
    return out.reshape((n,) + tuple(shape))
