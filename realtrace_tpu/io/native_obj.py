"""ctypes binding for the native OBJ parser (csrc/objloader.cpp).

Builds the shared library on first use (g++ is part of the toolchain); any
failure falls back to the pure-python parser in io/obj.py.
"""
from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_CSRC = Path(__file__).resolve().parent.parent.parent / "csrc"
_SO = _CSRC / "build" / "librtobj.so"
_lib = None


def _build() -> None:
    _SO.parent.mkdir(parents=True, exist_ok=True)
    subprocess.run(
        ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
         str(_CSRC / "objloader.cpp"), "-o", str(_SO)],
        check=True, capture_output=True)


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not _SO.exists():
        _build()
    lib = ctypes.CDLL(str(_SO))
    lib.rt_obj_parse.restype = ctypes.c_void_p
    lib.rt_obj_parse.argtypes = [ctypes.c_char_p]
    lib.rt_obj_counts.restype = None
    lib.rt_obj_counts.argtypes = [ctypes.c_void_p] + [ctypes.POINTER(ctypes.c_int64)] * 4
    lib.rt_obj_copy.restype = None
    lib.rt_obj_copy.argtypes = [ctypes.c_void_p] + [ctypes.c_void_p] * 5
    lib.rt_obj_free.restype = None
    lib.rt_obj_free.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def parse(path):
    """Parse an OBJ file natively. Returns
    (vertices (V,3) f64, normals (VN,3) f64, uvs (T,2) f64,
     faces_v (F,3) i32, faces_t (F,3) i32) or raises on failure."""
    lib = _load()
    h = lib.rt_obj_parse(str(path).encode())
    if not h:
        raise FileNotFoundError(path)
    try:
        nv, nvn, nvt, nf = (ctypes.c_int64() for _ in range(4))
        lib.rt_obj_counts(h, ctypes.byref(nv), ctypes.byref(nvn),
                          ctypes.byref(nvt), ctypes.byref(nf))
        v = np.empty((nv.value, 3), np.float64)
        vn = np.empty((nvn.value, 3), np.float64)
        vt = np.empty((nvt.value, 2), np.float64)
        fv = np.empty((nf.value, 3), np.int32)
        ft = np.empty((nf.value, 3), np.int32)
        lib.rt_obj_copy(h, v.ctypes.data_as(ctypes.c_void_p),
                        vn.ctypes.data_as(ctypes.c_void_p),
                        vt.ctypes.data_as(ctypes.c_void_p),
                        fv.ctypes.data_as(ctypes.c_void_p),
                        ft.ctypes.data_as(ctypes.c_void_p))
        return v, vn, vt, fv, ft
    finally:
        lib.rt_obj_free(h)
