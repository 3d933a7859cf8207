"""ctypes binding for the native threaded feature loader.

`load_feature_batch(paths, dim)` fills a (N, dim) float32 batch from
.npz/.npy feature files using the C++ thread pool in
native/feature_loader.cpp (built with `make -C native`); falls back to
numpy when the shared library isn't built. Failed/missing files become
zero rows — the reference's missing-media semantics (train.py:403-404).
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Sequence

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _find_lib() -> Optional[str]:
    here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    cand = os.path.join(here, "native", "libia2p_loader.so")
    return cand if os.path.exists(cand) else None


def _get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = _find_lib()
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    lib.ia2p_load_features.argtypes = [
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int,
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_longlong,
        ctypes.c_int,
    ]
    lib.ia2p_load_features.restype = ctypes.c_int
    _LIB = lib
    return _LIB


def native_available() -> bool:
    return _get_lib() is not None


def _numpy_fallback(paths: Sequence[str], dim: int, entry: str) -> np.ndarray:
    out = np.zeros((len(paths), dim), np.float32)
    for i, p in enumerate(paths):
        try:
            if p.endswith(".npy"):
                x = np.load(p)
            else:
                x = np.load(p)[entry]
            x = np.asarray(x, np.float32).reshape(-1)[:dim]
            out[i, : len(x)] = x
        except Exception:
            pass  # zero row, reference missing-media behavior
    return out


def load_feature_batch(
    paths: Sequence[str],
    dim: int,
    entry: str = "state",
    n_threads: int = 8,
) -> np.ndarray:
    """→ (len(paths), dim) float32; zero rows for unreadable files."""
    lib = _get_lib()
    if lib is None:
        return _numpy_fallback(paths, dim, entry)
    n = len(paths)
    out = np.zeros((n, dim), np.float32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    lib.ia2p_load_features(
        arr,
        n,
        entry.encode(),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        dim,
        n_threads,
    )
    return out


def build_native(verbose: bool = False) -> bool:
    """Invoke `make -C native`; returns True if the .so is available."""
    import subprocess

    here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    try:
        subprocess.run(
            ["make", "-C", os.path.join(here, "native")],
            check=True,
            capture_output=not verbose,
        )
    except Exception:
        return False
    global _TRIED
    _TRIED = False
    return native_available()
