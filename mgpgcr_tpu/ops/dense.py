"""Dense complex operator.

Equivalent of the reference's ``Dense<T>`` (Operator.h:33-190): matvec, add,
matmul, conjugate transpose, element access. Matvec/matmul run on the MXU
via jnp.dot / einsum — no hand-written kernels needed for dense.
"""

from __future__ import annotations

import jax.numpy as jnp

from mgpgcr_tpu import cplx
from mgpgcr_tpu.ops.base import LinearOperator, operator_dataclass


@operator_dataclass
class DenseOperator(LinearOperator):
    a: jnp.ndarray  # (m, n) complex array or split re/im cplx.CF

    @property
    def shape(self) -> tuple[int, int]:
        return self.a.shape

    def apply(self, x):
        """Matvec (Operator.h:160-173). Supports stacked fields (..., n)
        and the split re/im CF representation."""
        return cplx.einsum2("ij,...j->...i", self.a, x)

    def val_at(self, row: int, col: int):
        return self.a[row, col]

    def __add__(self, other: "DenseOperator") -> "DenseOperator":
        return DenseOperator(self.a + other.a)

    def __sub__(self, other: "DenseOperator") -> "DenseOperator":
        return DenseOperator(self.a - other.a)

    def matmul(self, other: "DenseOperator") -> "DenseOperator":
        """Dense @ dense (Operator.h:150-157)."""
        return DenseOperator(self.a @ other.a)

    def dagger(self) -> "DenseOperator":
        """Conjugate transpose (Operator.h:176-183)."""
        return DenseOperator(cplx.conj(cplx.swapaxes(self.a, -1, -2)))
