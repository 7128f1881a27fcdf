"""ctypes bindings for the native C++ geometry core (native/gdm_native.cpp).

Builds the shared library on first use (g++ -O3); all entry points have
pure-numpy fallbacks so the framework works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SRC = os.path.join(_ROOT, "native", "gdm_native.cpp")
_LIB = os.path.join(_ROOT, "native", "libgdm_native.so")

_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if os.environ.get("GDM_DISABLE_NATIVE") == "1":
        return None
    try:
        if (not os.path.exists(_LIB)) or (
            os.path.getmtime(_LIB) < os.path.getmtime(_SRC)
        ):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", _LIB],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(_LIB)
        lib.gdm_batched_real_roots.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64, ctypes.c_int,
            ctypes.c_double, ctypes.c_double, ctypes.c_double,
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_int32),
        ]
        lib.gdm_batched_polyval.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64, ctypes.c_int,
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double),
        ]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def batched_real_roots(coeffs: np.ndarray, lo: float, hi: float,
                       root_tol: float = 1e-11):
    """Real roots in (lo, hi) of many polynomials.

    coeffs: (n, degree+1) ascending.  Returns (roots (n, degree) NaN-padded
    sorted, counts (n,)).
    """
    coeffs = np.ascontiguousarray(coeffs, dtype=np.float64)
    n, d1 = coeffs.shape
    degree = d1 - 1
    lib = _load()
    if lib is None:
        roots = np.full((n, degree), np.nan)
        counts = np.zeros(n, dtype=np.int32)
        for i in range(n):
            c = np.trim_zeros(coeffs[i][::-1], "f")
            if len(c) <= 1:
                continue
            r = np.roots(c)
            r = r[np.abs(r.imag) < 1e-9].real
            r = np.sort(r[(r > lo + root_tol) & (r < hi - root_tol)])
            roots[i, : len(r)] = r
            counts[i] = len(r)
        return roots, counts
    roots = np.full((n, degree), np.nan)
    counts = np.zeros(n, dtype=np.int32)
    lib.gdm_batched_real_roots(
        coeffs.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_int64(n), ctypes.c_int(degree),
        ctypes.c_double(lo), ctypes.c_double(hi), ctypes.c_double(root_tol),
        roots.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return roots, counts
