"""Wilson--Dirac wrapper A = I - k D.

Equivalent of the reference's ``DiracOp`` (Operator.h:105-574): wraps any
hopping operator D as ``A(x) = x - k * D(x)`` with a runtime-settable complex
hopping parameter k. D may be an ELL matrix (ingested fixture) or the
matrix-free stencil operator (``ops/wilson.py``).
"""

from __future__ import annotations

import jax.numpy as jnp

from mgpgcr_tpu.ops.base import LinearOperator, operator_dataclass


@operator_dataclass
class DiracOperator(LinearOperator):
    d: LinearOperator  # any pytree operator
    k: jnp.ndarray  # complex scalar (dynamic so k-sweeps don't recompile)

    @property
    def shape(self) -> tuple[int, int]:
        return self.d.shape

    def apply(self, x: jnp.ndarray) -> jnp.ndarray:
        """x - k * D(x) (Operator.h:570-574). Operators exposing
        ``apply_dirac`` (the fused Pallas kernel) compute the whole
        expression in one HBM pass."""
        if hasattr(self.d, "apply_dirac"):
            return self.d.apply_dirac(x, self.k)
        return x - self.k * self.d.apply(x)

    def with_k(self, k) -> "DiracOperator":
        """Rebind k (reference ``set_k``, Operator.h:116)."""
        return DiracOperator(self.d, jnp.asarray(k, dtype=self.k.dtype))

    def val_at(self, row: int, col: int):
        """(I - kD)_{rc} (Operator.h:111-112); requires d.val_at."""
        diag = 1.0 if row == col else 0.0
        return diag - self.k * self.d.val_at(row, col)


def make_dirac(d: LinearOperator, k, dtype=None) -> DiracOperator:
    if dtype is None:
        dtype = getattr(d, "vals", getattr(d, "a", None))
        dtype = dtype.dtype if dtype is not None else jnp.complex64
    return DiracOperator(d, jnp.asarray(k, dtype=dtype))
