"""ctypes bindings to the native C++ parser (native/parse.cpp).

The reference's ingestion layer is native C++ (Parse.cpp); ours is a small
C++ shared library doing the hot text->arrays scan, loaded lazily via
ctypes. If the library hasn't been built (``make -C native``), callers fall
back to the vectorised numpy parser transparently.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_TRIED = False


def _lib():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    for cand in (
        os.path.join(here, "native", "libmgpgcr_io.so"),
        os.path.join(os.path.dirname(__file__), "libmgpgcr_io.so"),
    ):
        if os.path.exists(cand):
            try:
                lib = ctypes.CDLL(cand)
            except OSError:
                continue
            lib.parse_parsed_txt_header.restype = ctypes.c_int
            lib.parse_parsed_txt_header.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_longlong),  # nrow, ncol, nnz
            ]
            lib.parse_parsed_txt_fill.restype = ctypes.c_int
            lib.parse_parsed_txt_fill.argtypes = [
                ctypes.c_char_p,
                ctypes.c_longlong,
                ctypes.c_longlong,
                np.ctypeslib.ndpointer(np.int64, flags="C"),
                np.ctypeslib.ndpointer(np.int64, flags="C"),
                np.ctypeslib.ndpointer(np.float64, flags="C"),
            ]
            _LIB = lib
            break
    return _LIB


def read_parsed_txt_native(path: str):
    """Returns (indptr, indices, data, shape) or None if the native lib is
    unavailable or fails."""
    lib = _lib()
    if lib is None:
        return None
    hdr = (ctypes.c_longlong * 3)()
    if lib.parse_parsed_txt_header(path.encode(), hdr) != 0:
        return None
    nrow, ncol, nnz = int(hdr[0]), int(hdr[1]), int(hdr[2])
    indptr = np.empty(nrow + 1, dtype=np.int64)
    indices = np.empty(nnz, dtype=np.int64)
    data_ri = np.empty(2 * nnz, dtype=np.float64)
    if lib.parse_parsed_txt_fill(path.encode(), nrow, nnz, indptr, indices, data_ri) != 0:
        return None
    data = data_ri[0::2] + 1j * data_ri[1::2]
    return indptr, indices, data, (nrow, ncol)
