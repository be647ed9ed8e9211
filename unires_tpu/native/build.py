"""Compile-and-cache loader for the native library (ctypes, no pybind11)."""
from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile
from functools import lru_cache

_SRC = os.path.join(os.path.dirname(__file__), "resample.cpp")


@lru_cache(maxsize=1)
def get_lib() -> ctypes.CDLL:
    """Build (if needed) and load the native shared library."""
    with open(_SRC, "rb") as f:
        tag = hashlib.sha256(f.read()).hexdigest()[:16]
    cache_dir = os.environ.get(
        "UNIRES_NATIVE_CACHE",
        os.path.join(tempfile.gettempdir(), "unires_tpu_native"))
    os.makedirs(cache_dir, exist_ok=True)
    so_path = os.path.join(cache_dir, f"unires_native_{tag}.so")
    if not os.path.exists(so_path):
        tmp = so_path + f".build{os.getpid()}"
        cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
               "-o", tmp, _SRC, "-lpthread"]
        subprocess.run(cmd, check=True, capture_output=True)
        os.replace(tmp, so_path)
    lib = ctypes.CDLL(so_path)
    for name in ("unires_pull_f32", "unires_push_f32"):
        getattr(lib, name).restype = None
    lib.unires_pull_grad_f32.restype = None
    return lib
