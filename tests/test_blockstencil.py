"""Stencil-structured block SpMV: detection, XLA and Pallas parity.

The ingested-matrix device path (reference CSR SpMV, Operator.h:331-346)
on TPU is the block-stencil format + fused Pallas kernel
(ops/blockstencil.py, ops/pallas/spmv.py). Oracles: dense matmul and the
ELL gather path on the checked-in 4^4 fixture.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mgpgcr_tpu import cplx
from mgpgcr_tpu.ops.blockstencil import (
    StencilBlockOperator,
    detect_block_stencil,
    stencil_neighbor_table,
)
from mgpgcr_tpu.ops.pallas.spmv import stencil_spmv


def _random_stencil(dims, ne, seed=0):
    """Random stencil blocks with duplicate slots zeroed (extent<=2 dims),
    plus the dense oracle."""
    rng = np.random.default_rng(seed)
    nb = int(np.prod(dims))
    k = 2 * len(dims) + 1
    blocks = rng.standard_normal((nb, k, ne, ne)) + 1j * rng.standard_normal(
        (nb, k, ne, ne)
    )
    table = stencil_neighbor_table(dims)
    for r in range(nb):
        seen = set()
        for j in range(k):
            c = int(table[r, j])
            if c in seen:
                blocks[r, j] = 0.0
            seen.add(c)
    n = nb * ne
    dense = np.zeros((n, n), complex)
    for r in range(nb):
        for j in range(k):
            c = int(table[r, j])
            dense[r * ne : (r + 1) * ne, c * ne : (c + 1) * ne] += blocks[r, j]
    return blocks, dense


class _CsrLike:
    def __init__(self, dense, tol=0.0):
        import scipy.sparse as sp

        c = sp.csr_matrix(dense)
        self.shape, self.indptr, self.indices, self.data = (
            c.shape,
            c.indptr,
            c.indices,
            c.data,
        )


def test_xla_apply_matches_dense_oracle():
    dims, ne = (4, 2, 4, 2), 3
    blocks, dense = _random_stencil(dims, ne)
    rng = np.random.default_rng(1)
    x = rng.standard_normal(dense.shape[0]) + 1j * rng.standard_normal(
        dense.shape[0]
    )
    op = StencilBlockOperator(jnp.asarray(blocks), dims)
    y = np.asarray(op.apply(jnp.asarray(x)))
    np.testing.assert_allclose(y, dense @ x, rtol=1e-12, atol=1e-12)


def test_pallas_kernel_matches_dense_oracle():
    dims, ne = (4, 2, 4, 2), 3
    blocks, dense = _random_stencil(dims, ne)
    rng = np.random.default_rng(2)
    x = rng.standard_normal(dense.shape[0]) + 1j * rng.standard_normal(
        dense.shape[0]
    )
    y = cplx.to_numpy(
        stencil_spmv(
            cplx.from_numpy(blocks, jnp.float64),
            cplx.from_numpy(x, jnp.float64),
            dims,
            interpret=True,
        )
    )
    np.testing.assert_allclose(y, dense @ x, rtol=1e-12, atol=1e-12)


def test_detection_roundtrip_and_rejection():
    dims, ne = (2, 2, 2, 2), 2
    blocks, dense = _random_stencil(dims, ne, seed=3)
    det = detect_block_stencil(_CsrLike(dense), dims, ne)
    np.testing.assert_allclose(det, blocks, rtol=0, atol=1e-14)
    # a coupling outside the stencil must be rejected, not mis-binned
    bad = dense.copy()
    bad[0, dense.shape[0] - 1] += 1.0  # (0,0,0,0) <-> far corner: no slot
    assert detect_block_stencil(_CsrLike(bad), dims, ne) is None


def test_vmap_batched_apply():
    dims, ne = (2, 4, 2, 2), 3
    blocks, dense = _random_stencil(dims, ne, seed=4)
    rng = np.random.default_rng(5)
    xb = rng.standard_normal((5, dense.shape[0])) + 1j * rng.standard_normal(
        (5, dense.shape[0])
    )
    op = StencilBlockOperator(jnp.asarray(blocks), dims)
    yb = np.asarray(jax.vmap(op.apply)(jnp.asarray(xb)))
    np.testing.assert_allclose(yb, xb @ dense.T, rtol=1e-12, atol=1e-12)
    cfb = cplx.from_numpy(blocks, jnp.float64)
    ybp = cplx.to_numpy(
        jax.vmap(lambda v: stencil_spmv(cfb, v, dims, interpret=True))(
            cplx.from_numpy(xb, jnp.float64)
        )
    )
    np.testing.assert_allclose(ybp, xb @ dense.T, rtol=1e-12, atol=1e-12)


def test_fixture_detects_and_matches_ell(dirac44_csr, dirac44_ell):
    m, ell = dirac44_csr, dirac44_ell
    op = StencilBlockOperator.from_csr(m, (4, 4, 4, 4), 12)
    assert op is not None
    rng = np.random.default_rng(6)
    x = rng.standard_normal(3072) + 1j * rng.standard_normal(3072)
    y_ell = np.asarray(ell.apply(jnp.asarray(x)))
    y_st = np.asarray(op.apply(jnp.asarray(x)))
    np.testing.assert_allclose(y_st, y_ell, rtol=1e-12, atol=1e-12)
    # CF + Pallas interpreter path
    cf_op = StencilBlockOperator.from_csr(
        m, (4, 4, 4, 4), 12, cf=True, dtype=jnp.float64
    ).with_backend("pallas_interpret")
    y_pl = cplx.to_numpy(cf_op.apply(cplx.from_numpy(x, jnp.float64)))
    np.testing.assert_allclose(y_pl, y_ell, rtol=1e-11, atol=1e-11)


def test_bf16_block_storage_close():
    dims, ne = (2, 2, 2, 2), 3
    blocks, dense = _random_stencil(dims, ne, seed=7)
    rng = np.random.default_rng(8)
    x = rng.standard_normal(dense.shape[0]) + 1j * rng.standard_normal(
        dense.shape[0]
    )
    cf_op = StencilBlockOperator(cplx.from_numpy(blocks, jnp.float32), dims)
    lo = cf_op.with_block_dtype(jnp.bfloat16)
    y32 = cplx.to_numpy(cf_op.apply(cplx.from_numpy(x, jnp.float32)))
    ylo = cplx.to_numpy(lo.apply(cplx.from_numpy(x, jnp.float32)))
    rel = np.linalg.norm(ylo - y32) / np.linalg.norm(y32)
    assert rel < 2e-2, rel
