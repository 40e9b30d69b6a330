"""ctypes bindings for the native host-side bitpack library.

Build-on-first-use with graceful degradation: if no C++ toolchain is
available (or compilation fails) every entry point returns ``None``-guarded
fallbacks and the pure-JAX implementations take over — the same contract as
the reference's ``safe_import`` placeholder modules
(``utils/safe_import.py:75-112``).

The compiled ``.so`` is cached next to this file (or ``BIE_TPU_CACHE`` if
the package directory is read-only).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "bitpack.cpp")
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _so_path() -> str:
    cache = os.environ.get("BIE_TPU_CACHE", _HERE)
    # "lib" prefix: NOT an importable-module name, so package walkers don't
    # try to import a ctypes-only shared object
    return os.path.join(cache, "libbitpack.so")


def _build() -> Optional[str]:
    so = _so_path()
    if os.path.exists(so) and os.path.getmtime(so) >= os.path.getmtime(_SRC):
        return so
    cxx = os.environ.get("CXX", "g++")
    cmd = [
        cxx,
        "-O3",
        "-march=native",
        "-shared",
        "-fPIC",
        "-fopenmp",
        _SRC,
        "-o",
        so,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return so
    except (subprocess.SubprocessError, OSError) as e:
        sys.stderr.write(f"bitorch_engine_tpu.native: build failed ({e}); "
                         "falling back to pure-JAX packing\n")
        return None


def _lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        so = _build()
        if so is None:
            return None
        try:
            lib = ctypes.CDLL(so)
        except OSError as e:
            sys.stderr.write(f"bitorch_engine_tpu.native: load failed ({e})\n")
            return None
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        u32p = np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS")
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        lib.repack_gptq_to_tpu_tiled.argtypes = [
            i32p, i32p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int, ctypes.c_int
        ]
        lib.unpack_gptq_codes.argtypes = [i32p, u8p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int]
        lib.pack_gptq_codes.argtypes = [u8p, i32p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int]
        lib.pack_signs_f32.argtypes = [f32p, u32p, ctypes.c_int64, ctypes.c_int64]
        _LIB = lib
        return _LIB


def available() -> bool:
    return _lib() is not None


def repack_gptq_to_tpu_tiled(
    packed: np.ndarray, w_bit: int, group_size: int
) -> Optional[np.ndarray]:
    """GPTQ-order packed int32 (K/ppw, N) → tpu_tiled order; None if no lib."""
    lib = _lib()
    if lib is None:
        return None
    packed = np.ascontiguousarray(packed, np.int32)
    kw, n = packed.shape
    k = kw * (32 // w_bit)
    out = np.empty_like(packed)
    lib.repack_gptq_to_tpu_tiled(packed, out, k, n, w_bit, group_size)
    return out


def unpack_gptq_codes(packed: np.ndarray, w_bit: int) -> Optional[np.ndarray]:
    lib = _lib()
    if lib is None:
        return None
    packed = np.ascontiguousarray(packed, np.int32)
    kw, n = packed.shape
    k = kw * (32 // w_bit)
    out = np.empty((k, n), np.uint8)
    lib.unpack_gptq_codes(packed, out, k, n, w_bit)
    return out


def pack_gptq_codes(codes: np.ndarray, w_bit: int) -> Optional[np.ndarray]:
    lib = _lib()
    if lib is None:
        return None
    codes = np.ascontiguousarray(codes, np.uint8)
    k, n = codes.shape
    ppw = 32 // w_bit
    out = np.empty((k // ppw, n), np.int32)
    lib.pack_gptq_codes(codes, out, k, n, w_bit)
    return out


def pack_signs(x: np.ndarray) -> Optional[np.ndarray]:
    lib = _lib()
    if lib is None:
        return None
    x = np.ascontiguousarray(x, np.float32)
    rows, cols = x.shape
    out = np.empty((rows, cols // 32), np.uint32)
    lib.pack_signs_f32(x, out, rows, cols)
    return out
