"""ctypes bridge to the native C++ data-loading runtime (csrc/dataloader.cpp).

Compiled on demand with g++ (cached in ~/.cache/pytorch_generative_tpu); all
call sites fall back to the pure-NumPy pipeline when the toolchain is absent.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess

_LIB = None
_LIB_ERROR = None


def _source_path() -> str:
    here = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    return os.path.join(here, "csrc", "dataloader.cpp")


def load_library():
    """Compiles (once) and loads the native library; raises on failure."""
    global _LIB, _LIB_ERROR
    if _LIB is not None:
        return _LIB
    if _LIB_ERROR is not None:
        raise _LIB_ERROR

    try:
        src = _source_path()
        with open(src, "rb") as f:
            digest = hashlib.sha256(f.read()).hexdigest()[:16]
        cache_dir = os.path.expanduser("~/.cache/pytorch_generative_tpu")
        os.makedirs(cache_dir, exist_ok=True)
        so_path = os.path.join(cache_dir, f"libpgt_dataloader_{digest}.so")
        if not os.path.exists(so_path):
            subprocess.run(
                ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
                 src, "-o", so_path],
                check=True, capture_output=True)
        lib = ctypes.CDLL(so_path)
    except Exception as e:  # noqa: BLE001
        _LIB_ERROR = RuntimeError(f"native dataloader unavailable: {e}")
        raise _LIB_ERROR

    lib.pgt_loader_create.restype = ctypes.c_void_p
    lib.pgt_loader_create.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int, ctypes.c_int, ctypes.c_uint64,
        ctypes.c_int, ctypes.c_int]
    lib.pgt_loader_n_batches.restype = ctypes.c_int64
    lib.pgt_loader_n_batches.argtypes = [ctypes.c_void_p]
    lib.pgt_loader_start_epoch.restype = None
    lib.pgt_loader_start_epoch.argtypes = [ctypes.c_void_p, ctypes.c_uint64]
    lib.pgt_loader_next.restype = ctypes.c_int64
    lib.pgt_loader_next.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                    ctypes.c_void_p]
    lib.pgt_loader_destroy.restype = None
    lib.pgt_loader_destroy.argtypes = [ctypes.c_void_p]
    _LIB = lib
    return lib


def available() -> bool:
    try:
        load_library()
        return True
    except RuntimeError:
        return False
