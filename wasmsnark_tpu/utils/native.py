"""ctypes binding for the native marshal library (csrc/marshal.cpp).

Builds lazily with `make -C csrc` on first use if g++ is available; all
callers fall back to the numpy implementations in utils/serialize.py when
the library is absent, so the package works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_CSRC = os.path.join(os.path.dirname(__file__), "..", "..", "csrc")
_LIB_PATH = os.path.abspath(os.path.join(_CSRC, "libmarshal.so"))
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if os.environ.get("WASMSNARK_TPU_NO_NATIVE"):
        return None
    src = os.path.join(os.path.abspath(_CSRC), "marshal.cpp")
    stale = (not os.path.exists(_LIB_PATH)
             or (os.path.exists(src)
                 and os.path.getmtime(src) > os.path.getmtime(_LIB_PATH)))
    if stale:
        try:
            subprocess.run(["make", "-C", os.path.abspath(_CSRC), "-B"],
                           capture_output=True, timeout=120, check=True)
        except Exception:
            if not os.path.exists(_LIB_PATH):
                return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        u32p = ctypes.POINTER(ctypes.c_uint32)
        lib.bytes_to_planes.argtypes = [u8p, ctypes.c_size_t, ctypes.c_size_t,
                                        u32p, ctypes.c_size_t]
        lib.planes_to_bytes.argtypes = [u32p, ctypes.c_size_t, ctypes.c_size_t,
                                        u8p, ctypes.c_size_t]
        lib.points_to_planes.argtypes = [u8p, ctypes.c_size_t, ctypes.c_size_t,
                                         ctypes.c_size_t, u32p, ctypes.c_size_t]
        i32p = ctypes.POINTER(ctypes.c_int32)
        if hasattr(lib, "count_sparse_coefs"):
            lib.count_sparse_coefs.argtypes = [
                u8p, ctypes.c_size_t, ctypes.c_size_t, ctypes.c_size_t]
            lib.count_sparse_coefs.restype = ctypes.c_size_t
            lib.parse_sparse.argtypes = [
                u8p, ctypes.c_size_t, ctypes.c_size_t, i32p, i32p, u8p]
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def bytes_to_planes(data: bytes, elem_bytes: int, n_limbs: int):
    """Native path for serialize.bytes_to_limbs; returns None if no lib."""
    lib = _load()
    if lib is None:
        return None
    n = len(data) // elem_bytes
    out = np.empty((n_limbs, n), dtype=np.uint32)
    buf = np.frombuffer(data, dtype=np.uint8)
    lib.bytes_to_planes(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), n, elem_bytes,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), n_limbs)
    return out


def parse_sparse(data, n_signals: int, n8: int):
    """Native sparse-pkey-section parse; returns (sig_idx, coef_idx,
    coef_bytes) numpy arrays or None when the lib is absent/stale."""
    lib = _load()
    if lib is None or not hasattr(lib, "count_sparse_coefs"):
        return None
    buf = np.frombuffer(data, dtype=np.uint8)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    total = lib.count_sparse_coefs(
        buf.ctypes.data_as(u8p), len(buf), n_signals, n8)
    if total == ctypes.c_size_t(-1).value:
        raise ValueError("truncated sparse pkey section")
    sig_idx = np.empty(total, dtype=np.int32)
    coef_idx = np.empty(total, dtype=np.int32)
    coef_bytes = np.empty(total * n8, dtype=np.uint8)
    i32p = ctypes.POINTER(ctypes.c_int32)
    lib.parse_sparse(
        buf.ctypes.data_as(u8p), n_signals, n8,
        sig_idx.ctypes.data_as(i32p), coef_idx.ctypes.data_as(i32p),
        coef_bytes.ctypes.data_as(u8p))
    return sig_idx, coef_idx, coef_bytes


def planes_to_bytes(planes, elem_bytes: int):
    lib = _load()
    if lib is None:
        return None
    a = np.ascontiguousarray(planes, dtype=np.uint32)
    L, n = a.shape
    out = np.empty(n * elem_bytes, dtype=np.uint8)
    lib.planes_to_bytes(
        a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), L, n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), elem_bytes)
    return out.tobytes()
