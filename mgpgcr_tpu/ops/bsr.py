"""Block-sparse operator (block-ELL layout) — the coarse-grid format.

Equivalent of the reference's ``HierarchicalSparse<T, cT>`` block-CSR of
dense sub-operators (HierarchicalSparse.h:22-199). The reference stores
``Operator*`` values in a CSR-of-blocks and runs an OpenMP loop of dense
matvecs (HierarchicalSparse.h:102-161). Here the structure is *uniform* —
the Galerkin coarse operator has exactly 9 blocks per block-row (self + 8
neighbours, MG.h:229-276) — so a block-ELL layout is lossless: values in a
dense ``(n_block_rows, K, ne, ne)`` tensor and block column ids in
``(n_block_rows, K)``. The matvec is one batched einsum that maps straight
onto the MXU; duplicate (row, col) blocks are legal and simply sum, which is
the reference's documented semantics (HierarchicalSparse.h:20-21, quirk Q10)
made implicit.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from mgpgcr_tpu import cplx
from mgpgcr_tpu.ops.base import LinearOperator, operator_dataclass


@operator_dataclass
class BlockSparseOperator(LinearOperator):
    blocks: jnp.ndarray  # (nb, K, ne, ne) complex dense blocks
    block_cols: jnp.ndarray  # (nb, K) int32 block column ids

    @property
    def n_block_rows(self) -> int:
        return self.blocks.shape[0]

    @property
    def block_size(self) -> int:
        return self.blocks.shape[-1]

    @property
    def shape(self) -> tuple[int, int]:
        n = self.n_block_rows * self.block_size
        return (n, n)

    def apply(self, x: jnp.ndarray) -> jnp.ndarray:
        """Block SpMV: (..., nb*ne) -> (..., nb*ne).

        Per block-row r: y_r = sum_k blocks[r, k] @ x[block_cols[r, k]]
        (HierarchicalSparse.h:102-161, as one einsum instead of an OpenMP
        loop of virtual dense matvecs). Representation-generic: blocks and
        x may each be native complex arrays or split re/im ``cplx.CF``
        pairs (the TPU path — solvers/mg.py builds CF blocks there)."""
        nb, ne = self.n_block_rows, self.block_size
        lead = x.shape[:-1]
        xb = x.reshape(lead + (nb, ne))
        gathered = xb[..., self.block_cols, :]  # (..., nb, K, ne)
        yb = cplx.einsum2("rkij,...rkj->...ri", self.blocks, gathered)
        return yb.reshape(lead + (nb * ne,))

    def val_at(self, row: int, col: int):
        """Scalar element lookup summing duplicate blocks
        (HierarchicalSparse.h:165-178)."""
        ne = self.block_size
        br, bi = divmod(int(row), ne)
        bc, bj = divmod(int(col), ne)
        cols = np.asarray(self.block_cols[br])
        total = 0.0 + 0.0j
        for k, c in enumerate(cols):
            if int(c) == bc:
                b = self.blocks[br, k, bi, bj]
                if cplx.is_cf(b):
                    total += complex(float(b.re), float(b.im))
                else:
                    total += complex(b)
        return total

    def to_dense(self) -> jnp.ndarray:
        nb, k, ne, _ = self.blocks.shape
        n = nb * ne
        if cplx.is_cf(self.blocks):
            z = jnp.zeros((n, n), dtype=self.blocks.dtype)
            dense = cplx.CF(z, z)
        else:
            dense = jnp.zeros((n, n), dtype=self.blocks.dtype)
        for r in range(nb):
            for kk in range(k):
                c = int(self.block_cols[r, kk])
                dense = dense.at[
                    r * ne : (r + 1) * ne, c * ne : (c + 1) * ne
                ].add(self.blocks[r, kk])
        return dense
