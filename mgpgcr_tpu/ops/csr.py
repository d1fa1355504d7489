"""CSR sparse matrix — ingestion/interchange format.

Capability parity with the reference's ``Sparse<T>`` (Operator.h:57-552):
construction from dense (Operator.h:194-227) and from sorted triplets with
duplicate merging (Operator.h:251-294), SpMV (Operator.h:331-346), element
lookup (391-397), add/sub via two-pointer merge (405-534 — implemented here
correctly, without the reference's negated-column bug Q4), scalar scale
(538-544), and conjugate transpose (297-328).

CSR is kept as a *host-side* (numpy) container: on TPU, ragged rows are a
poor fit for the vector units, so the device compute formats are ELL
(``ops/ell.py``) and block-sparse (``ops/bsr.py``); ``to_ell()`` is the
bridge. A jax ``segment_sum`` SpMV is provided for completeness/testing.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from mgpgcr_tpu.ops.ell import ELLOperator


@dataclass(frozen=True)
class CSRMatrix:
    indptr: np.ndarray  # (n_rows + 1,) int64
    indices: np.ndarray  # (nnz,) int32/int64
    data: np.ndarray  # (nnz,) complex
    shape: tuple[int, int]

    # ---- constructors ----
    @staticmethod
    def from_dense(a: np.ndarray, tol: float = 0.0) -> "CSRMatrix":
        """Dense -> CSR (reference Operator.h:194-227)."""
        a = np.asarray(a)
        mask = np.abs(a) > tol
        counts = mask.sum(axis=1)
        indptr = np.zeros(a.shape[0] + 1, dtype=np.int64)
        np.cumsum(counts, out=indptr[1:])
        rows, cols = np.nonzero(mask)
        return CSRMatrix(indptr, cols.astype(np.int64), a[rows, cols], a.shape)

    @staticmethod
    def from_triplets(
        rows: np.ndarray,
        cols: np.ndarray,
        vals: np.ndarray,
        shape: tuple[int, int],
        sum_duplicates: bool = True,
    ) -> "CSRMatrix":
        """Triplets -> CSR with sort + duplicate merge (Operator.h:251-294)."""
        rows = np.asarray(rows, dtype=np.int64)
        cols = np.asarray(cols, dtype=np.int64)
        vals = np.asarray(vals)
        order = np.lexsort((cols, rows))
        rows, cols, vals = rows[order], cols[order], vals[order]
        if sum_duplicates and len(rows):
            key_new = np.empty(len(rows), dtype=bool)
            key_new[0] = True
            key_new[1:] = (rows[1:] != rows[:-1]) | (cols[1:] != cols[:-1])
            group = np.cumsum(key_new) - 1
            n_unique = group[-1] + 1
            merged = np.zeros(n_unique, dtype=vals.dtype)
            np.add.at(merged, group, vals)
            rows, cols, vals = rows[key_new], cols[key_new], merged
        indptr = np.zeros(shape[0] + 1, dtype=np.int64)
        np.add.at(indptr, rows + 1, 1)
        np.cumsum(indptr, out=indptr)
        return CSRMatrix(indptr, cols, vals, shape)

    # ---- queries ----
    @property
    def nnz(self) -> int:
        return len(self.data)

    @property
    def dim(self) -> int:
        return self.shape[0]

    def val_at(self, row: int, col: int):
        """Element lookup (Operator.h:391-397)."""
        lo, hi = self.indptr[row], self.indptr[row + 1]
        seg = self.indices[lo:hi]
        hit = np.searchsorted(seg, col)
        if hit < len(seg) and seg[hit] == col:
            return self.data[lo + hit]
        return self.data.dtype.type(0)

    # ---- algebra ----
    def spmv(self, x: np.ndarray) -> np.ndarray:
        """Host CSR SpMV (Operator.h:331-346) — the float64 oracle path."""
        prod = self.data * x[self.indices]
        out = np.zeros(self.shape[0], dtype=np.result_type(self.data, x))
        np.add.at(out, np.repeat(np.arange(self.shape[0]), np.diff(self.indptr)), prod)
        return out

    def spmv_jax(self, x: jnp.ndarray) -> jnp.ndarray:
        """Device CSR SpMV via segment-sum (correctness/interop path)."""
        seg_ids = jnp.asarray(
            np.repeat(np.arange(self.shape[0]), np.diff(self.indptr))
        )
        prod = jnp.asarray(self.data) * x[jnp.asarray(self.indices)]
        return jax.ops.segment_sum(prod, seg_ids, num_segments=self.shape[0])

    def __add__(self, other: "CSRMatrix") -> "CSRMatrix":
        return self._merge(other, +1)

    def __sub__(self, other: "CSRMatrix") -> "CSRMatrix":
        return self._merge(other, -1)

    def _merge(self, other: "CSRMatrix", sign: int) -> "CSRMatrix":
        """Sparse add/sub (Operator.h:405-534, fixing quirk Q4)."""
        assert self.shape == other.shape
        r1 = np.repeat(np.arange(self.shape[0]), np.diff(self.indptr))
        r2 = np.repeat(np.arange(other.shape[0]), np.diff(other.indptr))
        rows = np.concatenate([r1, r2])
        cols = np.concatenate([self.indices, other.indices])
        vals = np.concatenate([self.data, sign * other.data])
        return CSRMatrix.from_triplets(rows, cols, vals, self.shape)

    def scale(self, s) -> "CSRMatrix":
        """Scalar multiply (Operator.h:538-544)."""
        return CSRMatrix(self.indptr, self.indices, self.data * s, self.shape)

    def matmul(self, other: "CSRMatrix") -> "CSRMatrix":
        """SpGEMM: CSR @ CSR (host-side row-merge; the device-side Galerkin
        triple product uses batched einsum instead, solvers/mg.py)."""
        assert self.shape[1] == other.shape[0]
        import scipy.sparse as sp

        a = sp.csr_matrix((self.data, self.indices, self.indptr), self.shape)
        b = sp.csr_matrix((other.data, other.indices, other.indptr), other.shape)
        c = (a @ b).tocsr()
        c.sort_indices()
        return CSRMatrix(
            c.indptr.astype(np.int64),
            c.indices.astype(np.int64),
            c.data,
            (self.shape[0], other.shape[1]),
        )

    def dagger(self) -> "CSRMatrix":
        """Conjugate transpose (Operator.h:297-328)."""
        rows = np.repeat(np.arange(self.shape[0]), np.diff(self.indptr))
        return CSRMatrix.from_triplets(
            self.indices,
            rows,
            np.conj(self.data),
            (self.shape[1], self.shape[0]),
            sum_duplicates=False,
        )

    # ---- conversions ----
    def to_dense(self) -> np.ndarray:
        out = np.zeros(self.shape, dtype=self.data.dtype)
        rows = np.repeat(np.arange(self.shape[0]), np.diff(self.indptr))
        out[rows, self.indices] = self.data
        return out

    def to_ell(self, dtype=None, cf: bool = False) -> ELLOperator:
        return ELLOperator.from_csr(
            self.indptr, self.indices, self.data, self.shape[1], dtype=dtype, cf=cf
        )
