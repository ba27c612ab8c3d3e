"""Native (C++) runtime components with lazy self-build and Python fallback.

The reference implements its data loader in C++ (/root/reference/src/ply_loader.cpp);
this package holds the framework's native equivalents, compiled on first use with
the system toolchain and loaded via ctypes (no pybind11 in this image). Every
native path has a pure-numpy fallback so the framework works without a compiler.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "gsply.cpp")
_LIB = os.path.join(_HERE, "libgsply.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False

# dtype string (numpy) -> native enum in gsply.cpp
DTYPE_ENUM = {
    "<f4": 0, "f4": 0,
    "<f8": 1, "f8": 1,
    "i1": 2,
    "u1": 3,
    "<i2": 4, "i2": 4,
    "<u2": 5, "u2": 5,
    "<i4": 6, "i4": 6,
    "<u4": 7, "u4": 7,
}


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-pthread", "-std=c++17",
        _SRC, "-o", _LIB + ".tmp",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(_LIB + ".tmp", _LIB)
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """The compiled library, building it on first use; None if unavailable."""
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if _build_failed:
        return None
    with _lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            if not _build():
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            _build_failed = True
            return None
        lib.gsply_deinterleave.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_void_p),
            ctypes.c_int32,
        ]
        lib.gsply_deinterleave.restype = None
        lib.gsply_interleave_f32.argtypes = [
            ctypes.POINTER(ctypes.c_void_p),
            ctypes.c_int64,
            ctypes.c_int32,
            ctypes.c_void_p,
            ctypes.c_int32,
        ]
        lib.gsply_interleave_f32.restype = None
        _lib = lib
        return _lib
