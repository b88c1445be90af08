"""ctypes binding for the C++ locality-aware NMS (native/lanms.cpp).

Builds the shared library on first use (g++ -O3) and caches it under
native/build/. The numpy fallback in mvuld_tpu/ocr/detect.py is used when no
compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO, "native", "lanms.cpp")
_BUILD = os.path.join(_REPO, "native", "build")
_SO = os.path.join(_BUILD, "liblanms.so")

_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
        os.makedirs(_BUILD, exist_ok=True)
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _SO],
            check=True, capture_output=True)
    lib = ctypes.CDLL(_SO)
    lib.lanms_merge_quadrangle.restype = ctypes.c_int
    lib.lanms_merge_quadrangle.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_float,
        ctypes.POINTER(ctypes.c_float)]
    _lib = lib
    return lib


def merge_quadrangle_n9(polys: np.ndarray, thresh: float = 0.2) -> np.ndarray:
    """[n, 9] float32 quads+score → kept/merged [m, 9]."""
    polys = np.ascontiguousarray(polys, np.float32)
    n = polys.shape[0]
    if n == 0:
        return polys
    lib = _load()
    out = np.zeros_like(polys)
    kept = lib.lanms_merge_quadrangle(
        polys.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n,
        ctypes.c_float(thresh),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out[:kept]
