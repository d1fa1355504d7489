"""Reader/writer for the reference's CSR text cache ("parsed.txt") format.

Format (written by the reference's ``parse_data``, Parse.cpp:39-59):
  line 1: ``nrow ncol nnz``
  line 2: the CSR row-pointer array (``nrow`` or ``nrow+1`` entries)
  then one line per nonzero: ``col (re,im)``

The reference reads it back in ``read_data`` (Parse.cpp:65-91) from a
hardcoded relative path; here the path is an argument. Parsing is vectorised
with numpy (the 4^4 fixture has 119,808 nonzeros; a Python line loop would
be painfully slow). A native C++ fast-path parser lives in ``native/`` and
is used automatically when built.
"""

from __future__ import annotations

import os

import numpy as np

from mgpgcr_tpu.ops.csr import CSRMatrix


def read_parsed_txt(path: str | os.PathLike) -> CSRMatrix:
    from mgpgcr_tpu.io import native_parse

    fast = native_parse.read_parsed_txt_native(str(path))
    if fast is not None:
        indptr, indices, data, shape = fast
        return CSRMatrix(indptr, indices, data, shape)

    with open(path, "r") as f:
        header = f.readline().split()
        nrow, ncol, nnz = int(header[0]), int(header[1]), int(header[2])
        row_line = f.readline()
        rest = f.read()

    indptr = np.fromstring(row_line, dtype=np.int64, sep=" ")
    if len(indptr) == nrow:  # reference writes ROW[0..nrow-1]; append end
        indptr = np.append(indptr, nnz)
    assert len(indptr) == nrow + 1, "malformed row-pointer line"

    # entries look like: "12 (-0.502679,0.364411)" — strip punctuation and
    # bulk-parse as a flat float stream [col, re, im, col, re, im, ...]
    table = str.maketrans({"(": " ", ")": " ", ",": " "})
    flat = np.fromstring(rest.translate(table), dtype=np.float64, sep=" ")
    assert len(flat) == 3 * nnz, f"expected {3*nnz} tokens, got {len(flat)}"
    flat = flat.reshape(nnz, 3)
    indices = flat[:, 0].astype(np.int64)
    data = flat[:, 1] + 1j * flat[:, 2]
    return CSRMatrix(indptr, indices, data, (nrow, ncol))


def write_parsed_txt(path: str | os.PathLike, m: CSRMatrix) -> None:
    """Write the cache in the exact reference layout (Parse.cpp:42-59)."""
    from mgpgcr_tpu.io import native_parse

    if native_parse.write_parsed_txt_native(
        str(path), m.indptr, m.indices, m.data, m.shape
    ):
        return
    with open(path, "w") as f:
        f.write(f"{m.shape[0]} {m.shape[1]} {m.nnz}\n")
        f.write(" ".join(str(int(r)) for r in m.indptr[:-1]) + " \n")
        for c, v in zip(m.indices, m.data):
            f.write(f"{int(c)} ({v.real:.6g},{v.imag:.6g})\n")
