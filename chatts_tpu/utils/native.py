"""Loader for the native host-packing extension (csrc/host_pack.cpp).

Builds the shared library on first use with g++ (cached next to the package)
and binds it via ctypes — no pybind11 needed in this image.  Every entry
point has a pure-numpy fallback so the framework works without a compiler.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Tuple

import numpy as np

_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "csrc", "host_pack.cpp")
_OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "_native")
_SO_PATH = os.path.join(_OUT_DIR, "libhostpack.so")


def _host_tag() -> str:
    """Fingerprint of this host's CPU feature set.  The library builds with
    -march=native, so a cached .so from a different machine can SIGILL —
    rebuild whenever the fingerprint recorded at build time changes."""
    import hashlib

    try:
        with open("/proc/cpuinfo") as f:
            flags = next((ln for ln in f if ln.startswith("flags")), "")
    except OSError:
        import platform

        flags = platform.processor()
    return hashlib.sha1(flags.encode()).hexdigest()[:12]


def _build() -> Optional[str]:
    if not os.path.exists(_SRC):
        return None
    os.makedirs(_OUT_DIR, exist_ok=True)
    stamp = _SO_PATH + ".host"
    tag = _host_tag()
    if (os.path.exists(_SO_PATH)
            and os.path.getmtime(_SO_PATH) >= os.path.getmtime(_SRC)):
        try:
            with open(stamp) as f:
                if f.read().strip() == tag:
                    return _SO_PATH
        except OSError:
            pass  # no stamp: rebuild (pre-stamp cache or foreign binary)
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", _SRC, "-o", _SO_PATH]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        with open(stamp, "w") as f:
            f.write(tag)
        return _SO_PATH
    except (subprocess.CalledProcessError, FileNotFoundError, subprocess.TimeoutExpired):
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        path = _build()
        if path is None:
            return None
        try:
            lib = ctypes.CDLL(path)
        except OSError:
            return None
        lib.sp_encode_pack.restype = ctypes.c_int
        lib.sp_encode_pack.argtypes = [
            ctypes.POINTER(ctypes.c_double),  # in
            ctypes.POINTER(ctypes.c_int64),  # lengths
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float),  # values
            ctypes.POINTER(ctypes.c_float),  # mask
            ctypes.POINTER(ctypes.c_int32),  # patch_cnt
            ctypes.POINTER(ctypes.c_double),  # offsets
            ctypes.POINTER(ctypes.c_double),  # scales
        ]
        lib.build_scatter_map.restype = ctypes.c_int
        lib.build_scatter_map.argtypes = [
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
        ]
        _LIB = lib
        return _LIB


def _ptr(arr: np.ndarray, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def sp_encode_pack(
    series: List[np.ndarray],
    n_pad: int,
    lmax: int,
    patch_size: int,
) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]]:
    """Fused sp-encode + pad + patch-count over a ragged batch.

    Returns (values (n_pad, lmax) f32, mask f32, patch_cnt (n_pad,) i32,
    offsets (n,) f64, scales (n,) f64), or None when the native library is
    unavailable.
    """
    lib = get_lib()
    if lib is None:
        return None
    n = len(series)
    flat = (
        np.ascontiguousarray(np.concatenate([np.asarray(s, np.float64).reshape(-1) for s in series]))
        if n else np.zeros(0, np.float64)
    )
    lengths = np.asarray([len(np.asarray(s).reshape(-1)) for s in series], np.int64)
    values = np.empty((n_pad, lmax), np.float32)
    mask = np.empty((n_pad, lmax), np.float32)
    patch_cnt = np.empty((n_pad,), np.int32)
    offsets = np.zeros((max(n, 1),), np.float64)
    scales = np.ones((max(n, 1),), np.float64)
    rc = lib.sp_encode_pack(
        _ptr(flat, ctypes.c_double), _ptr(lengths, ctypes.c_int64),
        n, n_pad, lmax, patch_size,
        _ptr(values, ctypes.c_float), _ptr(mask, ctypes.c_float),
        _ptr(patch_cnt, ctypes.c_int32),
        _ptr(offsets, ctypes.c_double), _ptr(scales, ctypes.c_double),
    )
    if rc != 0:
        return None
    return values, mask, patch_cnt, offsets[:n], scales[:n]


def build_scatter_map(
    patch_cnt: np.ndarray,
    seq_of: np.ndarray,
    starts: np.ndarray,
    n_pad: int,
    p_max: int,
    seq_sentinel: int,
    tok_sentinel: int,
) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    lib = get_lib()
    if lib is None:
        return None
    n = len(patch_cnt)
    patch_cnt = np.ascontiguousarray(patch_cnt, np.int32)
    seq_of = np.ascontiguousarray(seq_of, np.int32)
    starts = np.ascontiguousarray(starts, np.int32)
    scatter_seq = np.empty((n_pad, p_max), np.int32)
    scatter_tok = np.empty((n_pad, p_max), np.int32)
    rc = lib.build_scatter_map(
        _ptr(patch_cnt, ctypes.c_int32), _ptr(seq_of, ctypes.c_int32),
        _ptr(starts, ctypes.c_int32),
        n, n_pad, p_max, seq_sentinel, tok_sentinel,
        _ptr(scatter_seq, ctypes.c_int32), _ptr(scatter_tok, ctypes.c_int32),
    )
    if rc != 0:
        return None
    return scatter_seq, scatter_tok
