"""ctypes bindings for the native CPU oracle kernels (native/oracle.cpp).

Auto-builds liboracle.so on first use if a toolchain is available; callers
fall back to the pure-Python loops when the library can't be loaded.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_TRIED = False

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    so = os.path.join(_NATIVE_DIR, "liboracle.so")
    if not os.path.exists(so):
        try:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        return None

    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    lib.fs3_sweeps.argtypes = [
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_float,
        f32p, ctypes.c_int64, f32p, i64p,
    ]
    lib.fs3_sweeps.restype = None
    lib.fs2_sweeps.argtypes = [
        ctypes.c_int, ctypes.c_int, ctypes.c_float,
        f32p, ctypes.c_int64, f32p, i64p,
    ]
    lib.fs2_sweeps.restype = None
    _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


def fs3_sweeps(nx, ny, nz, radius, pc, phi, closest) -> bool:
    """In-place 8-octant triple sweeps; returns False if lib unavailable."""
    lib = _load()
    if lib is None:
        return False
    pc = np.ascontiguousarray(pc, np.float32)
    assert phi.flags.c_contiguous and closest.flags.c_contiguous
    lib.fs3_sweeps(
        nx, ny, nz, np.float32(radius), pc.reshape(-1), pc.shape[0],
        phi.reshape(-1), closest.reshape(-1),
    )
    return True


def fs2_sweeps(nx, ny, radius, pc, phi, closest) -> bool:
    lib = _load()
    if lib is None:
        return False
    pc = np.ascontiguousarray(pc, np.float32)
    lib.fs2_sweeps(
        nx, ny, np.float32(radius), pc.reshape(-1), pc.shape[0],
        phi.reshape(-1), closest.reshape(-1),
    )
    return True
