"""MatrixMarket (.mtx) coordinate-format reader.

Equivalent of the reference's ``parse_data`` (Parse.cpp:10-62): skips ``%``
comment lines, reads ``rows cols nnz``, then 1-based triplets. Supports
complex, real, and integer value fields; pattern matrices get unit values.
"""

from __future__ import annotations

import os

import numpy as np

from mgpgcr_tpu.ops.coo import COOMatrix


def read_matrix_market(path: str | os.PathLike) -> COOMatrix:
    from mgpgcr_tpu.io import native_parse

    fast = native_parse.read_mtx_native(str(path))
    if fast is not None:
        rows, cols, vals, shape, symmetric, hermitian, skew = fast
        if symmetric:
            off = rows != cols
            mirror = vals[off]
            if hermitian:
                mirror = np.conj(mirror)
            elif skew:
                mirror = -mirror
            rows, cols = (
                np.concatenate([rows, cols[off]]),
                np.concatenate([cols, rows[off]]),
            )
            vals = np.concatenate([vals, mirror])
        return COOMatrix(rows, cols, vals, shape)

    with open(path, "r") as f:
        first = f.readline()
        field = "real"
        if first.startswith("%%MatrixMarket"):
            toks = first.lower().split()
            for cand in ("complex", "real", "integer", "pattern"):
                if cand in toks:
                    field = cand
            skew = "skew-symmetric" in toks
            symmetric = "symmetric" in toks or "hermitian" in toks or skew
            hermitian = "hermitian" in toks
        else:
            symmetric = hermitian = skew = False
            f.seek(0)
        line = f.readline()
        while line.lstrip().startswith("%"):
            line = f.readline()
        nrow, ncol, nnz = (int(t) for t in line.split()[:3])
        body = f.read()

    flat = np.fromstring(body, dtype=np.float64, sep=" ")
    ncols_per = {"complex": 4, "real": 3, "integer": 3, "pattern": 2}[field]
    assert len(flat) == ncols_per * nnz, "malformed MatrixMarket body"
    flat = flat.reshape(nnz, ncols_per)
    rows = flat[:, 0].astype(np.int64) - 1  # 1-based -> 0-based (Parse.cpp:33-34)
    cols = flat[:, 1].astype(np.int64) - 1
    if field == "complex":
        vals = flat[:, 2] + 1j * flat[:, 3]
    elif field == "pattern":
        vals = np.ones(nnz, dtype=np.float64)
    else:
        vals = flat[:, 2]

    if symmetric:
        off = rows != cols
        mirror = vals[off]
        if hermitian:
            mirror = np.conj(mirror)
        elif skew:
            mirror = -mirror
        rows, cols, vals = (
            np.concatenate([rows, cols[off]]),
            np.concatenate([cols, rows[off]]),
            np.concatenate([vals, mirror]),
        )
    return COOMatrix(rows, cols, vals, (nrow, ncol))
