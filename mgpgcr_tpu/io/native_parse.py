"""ctypes bindings to the native C++ parser (native/parse.cpp).

The reference's ingestion layer is native C++ (Parse.cpp); ours is a small
C++ shared library doing the hot text->arrays scans (reference CSR cache
"parsed.txt", MatrixMarket .mtx, and the cache writer), loaded lazily via
ctypes. If the library hasn't been built (``make -C native``), callers fall
back to the vectorised numpy parsers transparently.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_TRIED = False

_I64 = np.ctypeslib.ndpointer(np.int64, flags="C")
_F64 = np.ctypeslib.ndpointer(np.float64, flags="C")
_I64RO = np.ctypeslib.ndpointer(np.int64, flags="C")
_F64RO = np.ctypeslib.ndpointer(np.float64, flags="C")


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
            # refuse stale builds with a different exported ABI (the
            # library is never committed; `make -C native` rebuilds it)
            try:
                lib.mgpgcr_io_abi_version.restype = ctypes.c_longlong
                if lib.mgpgcr_io_abi_version() != 2:
                    continue
            except AttributeError:
                continue
            ll3 = ctypes.POINTER(ctypes.c_longlong)
            lib.parse_parsed_txt_header.restype = ctypes.c_int
            lib.parse_parsed_txt_header.argtypes = [ctypes.c_char_p, ll3]
            lib.parse_parsed_txt_fill.restype = ctypes.c_int
            lib.parse_parsed_txt_fill.argtypes = [
                ctypes.c_char_p,
                ctypes.c_longlong,
                ctypes.c_longlong,
                _I64,
                _I64,
                _F64,
            ]
            lib.parse_mtx_header.restype = ctypes.c_int
            lib.parse_mtx_header.argtypes = [ctypes.c_char_p, ll3, ll3]
            lib.parse_mtx_fill.restype = ctypes.c_int
            lib.parse_mtx_fill.argtypes = [
                ctypes.c_char_p,
                ctypes.c_longlong,
                ctypes.c_longlong,
                _I64,
                _I64,
                _F64,
            ]
            lib.write_parsed_txt_native.restype = ctypes.c_int
            lib.write_parsed_txt_native.argtypes = [
                ctypes.c_char_p,
                ctypes.c_longlong,
                ctypes.c_longlong,
                ctypes.c_longlong,
                _I64RO,
                _I64RO,
                _F64RO,
            ]
            _LIB = lib
            break
    return _LIB


def available() -> bool:
    return _lib() is not None


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


def read_mtx_native(path: str):
    """Returns (rows, cols, vals, shape, symmetric, hermitian, skew) or None."""
    lib = _lib()
    if lib is None:
        return None
    hdr = (ctypes.c_longlong * 4)()
    sym = (ctypes.c_longlong * 3)()
    if lib.parse_mtx_header(path.encode(), hdr, sym) != 0:
        return None
    nrow, ncol, nnz, field = (int(hdr[i]) for i in range(4))
    rows = np.empty(nnz, dtype=np.int64)
    cols = np.empty(nnz, dtype=np.int64)
    data_ri = np.empty(2 * nnz, dtype=np.float64)
    if lib.parse_mtx_fill(path.encode(), nnz, field, rows, cols, data_ri) != 0:
        return None
    if field == 1:
        vals = data_ri[0::2] + 1j * data_ri[1::2]
    else:
        vals = data_ri[0::2].copy()
    return rows, cols, vals, (nrow, ncol), bool(sym[0]), bool(sym[1]), bool(sym[2])


def write_parsed_txt_native(path: str, indptr, indices, data, shape) -> bool:
    """Write the reference cache layout via the native writer; False if the
    library is unavailable."""
    lib = _lib()
    if lib is None:
        return False
    indptr = np.ascontiguousarray(indptr, dtype=np.int64)
    indices = np.ascontiguousarray(indices, dtype=np.int64)
    data = np.asarray(data, dtype=np.complex128)
    data_ri = np.empty(2 * len(indices), dtype=np.float64)
    data_ri[0::2] = data.real
    data_ri[1::2] = data.imag
    nnz = len(indices)
    return (
        lib.write_parsed_txt_native(
            path.encode(), int(shape[0]), int(shape[1]), nnz, indptr, indices, data_ri
        )
        == 0
    )
