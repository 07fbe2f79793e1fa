"""ctypes bindings for the native host-data runtime (native/vmlmf_native.cpp).

The library is built on demand with `make -C native` (g++ only, no deps) and
loaded lazily; every entry point has a NumPy fallback so the framework works
without a compiler.  Disable explicitly with VMLMF_NO_NATIVE=1.

Native-vs-fallback parity is covered by tests/test_native.py.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO, "native")
_SO = os.path.join(_NATIVE_DIR, "libvmlmf_native.so")

_lib = None
_tried = False

_i64 = ctypes.c_int64
_f32p = ctypes.POINTER(ctypes.c_float)
_f64p = ctypes.POINTER(ctypes.c_double)
_i64p = ctypes.POINTER(ctypes.c_int64)
_i32p = ctypes.POINTER(ctypes.c_int32)


def _build():
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception as e:  # no compiler / sandbox — fall back silently
        print(f"[vmlmf_tpu] native build unavailable ({e}); using NumPy fallbacks",
              file=sys.stderr)
        return False


def get_lib():
    """The loaded native library, or None (NumPy fallbacks used)."""
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if os.environ.get("VMLMF_NO_NATIVE") == "1":
        return None
    if not os.path.exists(_SO) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    lib.count_matrix.restype = _i64
    lib.count_matrix.argtypes = [ctypes.c_char_p, _i64, _i64p]
    lib.parse_matrix_f64.restype = _i64
    lib.parse_matrix_f64.argtypes = [ctypes.c_char_p, _i64, _f64p, _i64]
    lib.sliding_window_f32.restype = None
    lib.sliding_window_f32.argtypes = [_f32p, _i64, _i64, _i64, _i64, _f32p]
    lib.interp_nan_f32.restype = None
    lib.interp_nan_f32.argtypes = [_f32p, _i64, _i64]
    lib.gather_rows_f32.restype = None
    lib.gather_rows_f32.argtypes = [_f32p, _i64p, _i64, _i64, _f32p]
    lib.gather_rows_i32.restype = None
    lib.gather_rows_i32.argtypes = [_i32p, _i64p, _i64, _i64, _i32p]
    lib.norm_clamp_f32.restype = None
    lib.norm_clamp_f32.argtypes = [_f32p, _i64, _i64, _f32p, _f32p]
    assert lib.vmlmf_native_abi_version() == 1
    _lib = lib
    return _lib


def _ptr(a, ty):
    return a.ctypes.data_as(ty)


def loadtxt(source) -> np.ndarray:
    """np.loadtxt-compatible parse of a whitespace float matrix.

    `source`: bytes, str path, or file-like with .read().
    """
    if isinstance(source, (bytes, bytearray)):
        buf = bytes(source)
    elif isinstance(source, str):
        with open(source, "rb") as f:
            buf = f.read()
    else:
        buf = source.read()
        if isinstance(buf, str):
            buf = buf.encode()
    lib = get_lib()
    if lib is None:
        import io
        return np.loadtxt(io.BytesIO(buf))
    rows = _i64(0)
    n = lib.count_matrix(buf, len(buf), ctypes.byref(rows))
    out = np.empty(n, np.float64)
    got = lib.parse_matrix_f64(buf, len(buf), _ptr(out, _f64p), n)
    assert got == n, (got, n)
    r = rows.value
    if r > 1 and n % r == 0:
        return out.reshape(r, n // r)
    return out  # single row squeezes to 1-D, matching np.loadtxt


def sliding_window_f32(x: np.ndarray, window: int, step: int) -> np.ndarray:
    """[n, feat] f32 (C-contiguous) -> [nw, window, feat]."""
    lib = get_lib()
    n, feat = x.shape
    if n < window:
        return np.empty((0, window, feat), np.float32)
    nw = (n - window) // step + 1
    if lib is None or not x.flags.c_contiguous or x.dtype != np.float32:
        view = np.lib.stride_tricks.sliding_window_view(x, window, axis=0)
        return np.ascontiguousarray(np.moveaxis(view, -1, 1)[::step])
    out = np.empty((nw, window, feat), np.float32)
    lib.sliding_window_f32(_ptr(x, _f32p), n, feat, window, step, _ptr(out, _f32p))
    return out


def interp_nan_f32(x: np.ndarray) -> np.ndarray:
    """Per-channel NaN interpolation (see opp_preprocess.interpolate_nan)."""
    lib = get_lib()
    if lib is None or x.dtype != np.float32:
        from vmlmf_tpu.data.opp_preprocess import interpolate_nan
        return interpolate_nan(x)
    out = np.ascontiguousarray(x, np.float32).copy() if not x.flags.c_contiguous \
        else x.copy()
    lib.interp_nan_f32(_ptr(out, _f32p), out.shape[0], out.shape[1])
    return out


def gather_rows(src: np.ndarray, idx: np.ndarray) -> np.ndarray:
    """src[idx] for 2-D+ C-contiguous f32/i32 arrays (fast batch assembly)."""
    lib = get_lib()
    if (lib is None or not isinstance(src, np.ndarray)  # jax arrays etc.
            or not src.flags.c_contiguous or src.dtype not in (
                np.dtype(np.float32), np.dtype(np.int32))):
        return src[idx]
    idx = np.ascontiguousarray(idx, np.int64)
    out = np.empty((len(idx),) + src.shape[1:], src.dtype)
    row_elems = int(np.prod(src.shape[1:], dtype=np.int64)) if src.ndim > 1 else 1
    if src.dtype == np.float32:
        lib.gather_rows_f32(_ptr(src, _f32p), _ptr(idx, _i64p), len(idx),
                            row_elems, _ptr(out, _f32p))
    else:
        lib.gather_rows_i32(_ptr(src, _i32p), _ptr(idx, _i64p), len(idx),
                            row_elems, _ptr(out, _i32p))
    return out


def norm_clamp_f32(x: np.ndarray, mn: np.ndarray, mx: np.ndarray) -> np.ndarray:
    """(x - mn)/(mx - mn) with the OPP clamp (>1 -> 0.99, <0 -> 0)."""
    lib = get_lib()
    if lib is None or x.dtype != np.float32:
        mn = np.asarray(mn, np.float32)
        mx = np.asarray(mx, np.float32)
        y = (np.asarray(x, np.float32) - mn) / (mx - mn)
        y = np.where(y > 1.0, np.float32(0.99), y)
        return np.where(y < 0.0, np.float32(0.0), y)
    out = x.copy() if x.flags.c_contiguous else np.ascontiguousarray(x)
    mn = np.ascontiguousarray(mn, np.float32)
    mx = np.ascontiguousarray(mx, np.float32)
    lib.norm_clamp_f32(_ptr(out, _f32p), out.shape[0], out.shape[1],
                       _ptr(mn, _f32p), _ptr(mx, _f32p))
    return out
