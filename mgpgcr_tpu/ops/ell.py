"""ELLPACK sparse operator — the primary TPU compute format.

The reference's compute format is CSR with a serial row-loop SpMV
(Operator.h:331-346). On TPU, variable-length rows defeat the vector units,
but the Wilson--Dirac operators this framework targets have a *fixed* number
of nonzeros per row (exactly 39 for the checked-in fixture — see
data/sample_matrix/4x4parsed.txt header), so ELLPACK is lossless: values and
column indices live in dense (n_rows, K) arrays, padded with zero values /
row-local column indices. SpMV is one gather + one fused multiply-reduce,
entirely static-shaped.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from mgpgcr_tpu.ops.base import LinearOperator, operator_dataclass


@operator_dataclass(meta=("n_cols",))
class ELLOperator(LinearOperator):
    vals: jnp.ndarray  # (n_rows, K) complex, zero-padded
    cols: jnp.ndarray  # (n_rows, K) int32, padding points at row index (any valid col)
    n_cols: int

    @property
    def shape(self) -> tuple[int, int]:
        return (self.vals.shape[0], self.n_cols)

    @property
    def k_max(self) -> int:
        return self.vals.shape[1]

    @property
    def nnz(self) -> int:
        """Padded nnz; exact nnz if built zero-free."""
        return int(self.vals.shape[0] * self.vals.shape[1])

    def apply(self, x: jnp.ndarray) -> jnp.ndarray:
        """SpMV / SpMM. x: (n_cols,) or (..., n_cols) stacked fields;
        complex arrays or split re/im ``cplx.CF`` pairs."""
        from mgpgcr_tpu import cplx

        gathered = x[self.cols] if x.ndim == 1 else x[..., self.cols]
        return cplx.sum_axis(self.vals * gathered, -1)

    def scale(self, s) -> "ELLOperator":
        """Scalar multiply (reference Sparse scalar scale, Operator.h:538-544)."""
        return ELLOperator(self.vals * s, self.cols, self.n_cols)

    def to_dense(self) -> jnp.ndarray:
        n, k = self.vals.shape
        dense = jnp.zeros((n, self.n_cols), dtype=self.vals.dtype)
        rows = jnp.broadcast_to(jnp.arange(n)[:, None], (n, k))
        return dense.at[rows, self.cols].add(self.vals)

    @staticmethod
    def from_csr(
        indptr: np.ndarray,
        indices: np.ndarray,
        data: np.ndarray,
        n_cols: int,
        dtype=None,
        cf: bool = False,
    ) -> "ELLOperator":
        """Pad CSR rows to the max row length. Padding entries have value 0
        and column = their own row (a always-valid gather index).

        ``cf=True`` stores the values as split re/im ``cplx.CF`` (dtype is
        then the REAL dtype, default f32). The split happens host-side:
        complex HBM transfers are unimplemented on TPU backends, so a
        complex ``jnp.asarray`` would poison the device queue."""
        indptr = np.asarray(indptr)
        n_rows = len(indptr) - 1
        counts = np.diff(indptr)
        k = int(counts.max()) if n_rows else 0
        dt = data.dtype if dtype is None or cf else dtype
        vals = np.zeros((n_rows, k), dtype=dt)
        cols = np.tile(
            np.minimum(np.arange(n_rows), n_cols - 1)[:, None], (1, max(k, 1))
        ).astype(np.int32)
        # ragged scatter, host-side (ingestion path only)
        idx_in_row = np.arange(len(indices)) - np.repeat(indptr[:-1], counts)
        row_of = np.repeat(np.arange(n_rows), counts)
        vals[row_of, idx_in_row] = data.astype(dt)
        cols[row_of, idx_in_row] = indices.astype(np.int32)
        if cf:
            from mgpgcr_tpu import cplx

            rdt = dtype or jnp.float32
            return ELLOperator(
                cplx.from_numpy(vals, rdt), jnp.asarray(cols), int(n_cols)
            )
        return ELLOperator(jnp.asarray(vals), jnp.asarray(cols), int(n_cols))
