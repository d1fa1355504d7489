"""Stencil-structured block-sparse operator — the TPU compute format for
ingested lattice matrices.

The reference's device compute format for ingested matrices is CSR with a
serial row loop (Operator.h:331-346). A TPU-native SpMV cannot be built
around per-element gathers: Mosaic's dynamic gather is lane-local (a
128-wide register shuffle), so ``x[cols]`` with arbitrary 32-bit indices
has no efficient kernel form. What the ingested Dirac matrices (and the
Galerkin coarse operators, MG.h:229-276) actually are, though, is
*uniform 9-point block stencils*: n_sites x n_sites blocks of a fixed
``ne x ne`` size, each block row coupling only to itself and its eight
+-mu lattice neighbours. For that structure the "gather" is a set of
contiguous shifted windows — pure data movement with no indirection:

    y[r] = B_self[r] @ x[r] + sum_mu B_{+mu}[r] @ x[shift_{+mu}(r)]
                            + sum_mu B_{-mu}[r] @ x[shift_{-mu}(r)]

``detect_block_stencil`` verifies a CSR matrix against this structure
(given the lattice geometry) and extracts the dense block tensor;
``StencilBlockOperator`` applies it as 9 batched einsums over rolled
fields (XLA path, any backend), or via the fused single-pass Pallas
kernel (ops/pallas/spmv.py) on TPU.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from mgpgcr_tpu import cplx
from mgpgcr_tpu.ops.base import LinearOperator, operator_dataclass


def _strides(dims: tuple[int, ...]) -> list[int]:
    """Row-major flat-index strides (dim 0 outermost)."""
    s = [1] * len(dims)
    for i in range(len(dims) - 2, -1, -1):
        s[i] = s[i + 1] * dims[i + 1]
    return s


def stencil_neighbor_table(dims: tuple[int, ...]) -> np.ndarray:
    """(nb, 2*ndim+1) table [self, +d0, -d0, +d1, -d1, ...], periodic —
    same slot convention as BlockMap.neighbor_table (mesh.py)."""
    nd = len(dims)
    nb = int(np.prod(dims))
    grids = np.indices(dims).reshape(nd, nb)
    strides = np.asarray(_strides(dims))[:, None]
    table = np.empty((nb, 2 * nd + 1), dtype=np.int32)
    table[:, 0] = np.arange(nb)
    for d in range(nd):
        for j, sgn in ((1 + 2 * d, +1), (2 + 2 * d, -1)):
            coords = grids.copy()
            coords[d] = (coords[d] + sgn) % dims[d]
            table[:, j] = (coords * strides).sum(axis=0)
    return table


def detect_block_stencil(
    csr, dims: tuple[int, ...], ne: int
) -> np.ndarray | None:
    """Verify ``csr`` is an ``ne x ne``-blocked periodic nearest-neighbour
    stencil on the ``dims`` grid; return the (nb, 2*ndim+1, ne, ne) complex
    block tensor, or None if the sparsity does not fit the structure.

    Duplicate stencil slots on short dims (extent <= 2, where +mu and -mu
    coincide) are merged into the first matching slot, mirroring
    ``coarse_to_block_ell``'s duplicate handling (solvers/mg.py).
    """
    n = csr.shape[0]
    nb = int(np.prod(dims))
    if csr.shape[0] != csr.shape[1] or n != nb * ne:
        return None
    indptr = np.asarray(csr.indptr)
    cols = np.asarray(csr.indices)
    vals = np.asarray(csr.data)
    table = stencil_neighbor_table(dims)
    k = table.shape[1]

    rows = np.repeat(np.arange(n), np.diff(indptr))
    br, ri = rows // ne, rows % ne
    bc, ci = cols // ne, cols % ne
    # slot of each nnz: first stencil slot of its block row matching its
    # block column (first-match merges duplicate +-mu slots on short dims)
    match = table[br] == bc[:, None]  # (nnz, k)
    if not match.any(axis=1).all():
        return None  # coupling outside the 9-point stencil
    slot = match.argmax(axis=1)

    blocks = np.zeros((nb, k, ne, ne), dtype=np.complex128)
    np.add.at(blocks, (br, slot, ri, ci), vals)
    return blocks


@operator_dataclass(meta=("dims", "backend"))
class StencilBlockOperator(LinearOperator):
    """Uniform block-stencil operator. ``blocks``: (nb, 2*ndim+1, ne, ne)
    complex array or split re/im ``cplx.CF``; slot order [self, +d0, -d0,
    ...]; block rows flat row-major over ``dims``. Fields are flat
    (..., nb*ne) vectors (the ingested-matrix representation).

    backend: "xla" = per-direction roll + batched einsum; "pallas" = the
    fused single-pass kernel (TPU); "pallas_interpret" = same kernel in
    interpreter mode (parity tests on CPU).
    """

    blocks: jnp.ndarray  # or cplx.CF
    dims: tuple[int, ...]
    backend: str = "xla"

    @property
    def ne(self) -> int:
        return self.blocks.shape[-1]

    @property
    def n_blocks(self) -> int:
        return self.blocks.shape[0]

    @property
    def shape(self) -> tuple[int, int]:
        n = self.n_blocks * self.ne
        return (n, n)

    def with_block_dtype(self, dtype) -> "StencilBlockOperator":
        """Reduced-precision block storage (CF only): the SpMV is HBM-bound
        on the block tensor, so bf16 blocks double its effective
        bandwidth — the gauge-compression trick applied to the ingested
        format."""
        return StencilBlockOperator(
            self.blocks.astype(dtype), self.dims, self.backend
        )

    def with_backend(self, backend: str) -> "StencilBlockOperator":
        return StencilBlockOperator(self.blocks, self.dims, backend)

    def apply(self, x):
        if self.backend.startswith("pallas") and cplx.is_cf(x):
            from mgpgcr_tpu.ops.pallas.spmv import stencil_spmv

            return stencil_spmv(
                self.blocks,
                x,
                self.dims,
                interpret=self.backend == "pallas_interpret",
            )
        return self._apply_xla(x)

    def _apply_xla(self, x):
        nd = len(self.dims)
        nb, ne = self.n_blocks, self.ne
        lead = x.shape[:-1]
        xg = x.reshape(lead + tuple(self.dims) + (ne,))
        bg = self.blocks.reshape(tuple(self.dims) + self.blocks.shape[1:])
        sub_b = "".join(chr(ord("a") + i) for i in range(nd))
        sub_x = "..." + sub_b
        eq = f"{sub_b}ij,{sub_x}j->{sub_x}i"
        y = cplx.einsum2(eq, bg[..., 0, :, :], xg)
        for d in range(nd):
            ax = x.ndim - 1 + d  # grid axis d of xg (after the lead dims)
            plus = cplx.roll(xg, -1, ax)  # x at coord+1
            minus = cplx.roll(xg, +1, ax)
            y = y + cplx.einsum2(eq, bg[..., 1 + 2 * d, :, :], plus)
            y = y + cplx.einsum2(eq, bg[..., 2 + 2 * d, :, :], minus)
        return y.reshape(lead + (nb * ne,))

    @staticmethod
    def from_csr(
        csr, dims: tuple[int, ...], ne: int, dtype=None, cf: bool = False
    ) -> "StencilBlockOperator | None":
        """Detect + build from an ingested CSR matrix; None if the matrix
        is not an ne-blocked stencil on ``dims``."""
        blocks = detect_block_stencil(csr, dims, ne)
        if blocks is None:
            return None
        if cf:
            rdt = dtype or jnp.float32
            return StencilBlockOperator(cplx.from_numpy(blocks, rdt), dims)
        cdt = dtype or jnp.complex128
        return StencilBlockOperator(jnp.asarray(blocks, cdt), dims)
