"""ctypes bindings for the native C++ oracle (native/kmb_native.cpp).

Provides `native_kernel_product`, a float64 OpenMP-threaded streaming
kernel product with the exact semantics of
`bruteforce_numpy.blocked_kernel_product`.  The shared library is built by
`python install.py` (or `make -C native`); everything degrades gracefully
to the NumPy oracle when it is absent.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

KERNEL_IDS = {
    "gaussian": 0,
    "absolute-exponential": 1,
    "inverse-distance": 2,
    "exponential": 3,
}

_LIB_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "native", "libkmb_native.so")
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    double_p = ctypes.POINTER(ctypes.c_double)
    lib.kmb_kernel_product.restype = ctypes.c_int
    lib.kmb_kernel_product.argtypes = [
        double_p, double_p, double_p, double_p, double_p,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int64,
    ]
    lib.kmb_num_threads.restype = ctypes.c_int
    lib.kmb_num_threads.argtypes = []
    _lib = lib
    return _lib


def is_available() -> bool:
    return _load() is not None


def num_threads() -> int:
    lib = _load()
    return lib.kmb_num_threads() if lib else 0


def native_kernel_product(*, kernel, source_points, target_points=None,
                          source_signal=None, normalize_rows=False,
                          row_offset=0, return_rowsums=False):
    """a = K(x, y) @ b in float64 via the native library.

    Args mirror bruteforce_numpy.blocked_kernel_product; `row_offset`
    shifts the global row index for inverse-distance diagonal masking when
    called on a slab of target rows.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError(
            "native library not built; run `python install.py`")
    if kernel not in KERNEL_IDS:
        raise NotImplementedError(f"Unknown kernel {kernel!r}.")

    y = np.ascontiguousarray(source_points, dtype=np.float64)
    x = y if target_points is None else np.ascontiguousarray(
        target_points, dtype=np.float64)
    m, d = y.shape
    n = x.shape[0]
    if source_signal is None:
        b = np.ones((m, 1), dtype=np.float64)
    else:
        b = np.ascontiguousarray(source_signal, dtype=np.float64)
    e = b.shape[1]

    out = np.empty((n, e), dtype=np.float64)
    rowsums = np.empty((n,), dtype=np.float64)

    def ptr(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))

    status = lib.kmb_kernel_product(
        ptr(x), ptr(y), ptr(b), ptr(out), ptr(rowsums),
        n, m, d, e, KERNEL_IDS[kernel], int(bool(normalize_rows)),
        1, int(row_offset))
    if status != 0:
        raise RuntimeError(f"native kernel product failed ({status})")
    if return_rowsums:
        return out, rowsums
    return out
