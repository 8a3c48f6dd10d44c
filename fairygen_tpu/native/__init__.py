"""Native (C++) runtime components, consumed via ctypes.

Build on first use (g++ is part of the baked toolchain); every entry point
has a pure-python fallback so the package works without a compiler.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

_HERE = os.path.dirname(__file__)
_SO_PATH = os.path.join(_HERE, "_fairygen_native.so")
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_FAILED = False


def _build() -> bool:
    src = os.path.join(_HERE, "loader.cpp")
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-pthread", "-std=c++17",
             src, "-o", _SO_PATH],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """The native library, building it on first use; None if unavailable."""
    global _LIB, _FAILED
    if _LIB is not None or _FAILED:
        return _LIB
    with _LOCK:
        if _LIB is not None or _FAILED:
            return _LIB
        if not os.path.exists(_SO_PATH) or os.path.getmtime(_SO_PATH) < os.path.getmtime(
            os.path.join(_HERE, "loader.cpp")
        ):
            if not _build():
                _FAILED = True
                return None
        try:
            lib = ctypes.CDLL(_SO_PATH)
            lib.fairygen_parallel_read.restype = ctypes.c_int
            lib.fairygen_parallel_read.argtypes = [
                ctypes.c_char_p, ctypes.c_int,
                ctypes.POINTER(ctypes.c_uint64),
                ctypes.POINTER(ctypes.c_uint64),
                ctypes.POINTER(ctypes.c_void_p),
                ctypes.POINTER(ctypes.c_int),
                ctypes.c_int,
            ]
            _LIB = lib
        except Exception:
            _FAILED = True
    return _LIB


def parallel_read(path: str, extents, n_threads: int = 8) -> bool:
    """extents: list of (offset, nbytes, dest_numpy_uint8_view, convert).

    Returns True if the native path ran successfully."""
    lib = get_lib()
    if lib is None:
        return False
    n = len(extents)
    offs = (ctypes.c_uint64 * n)(*[e[0] for e in extents])
    sizes = (ctypes.c_uint64 * n)(*[e[1] for e in extents])
    dests = (ctypes.c_void_p * n)(
        *[e[2].ctypes.data_as(ctypes.c_void_p).value for e in extents]
    )
    convs = (ctypes.c_int * n)(*[int(e[3]) for e in extents])
    rc = lib.fairygen_parallel_read(
        path.encode(), n, offs, sizes, dests, convs, n_threads
    )
    return rc == 0
