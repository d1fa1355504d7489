"""Matrix-format tests (reference analogue: test_LA, main.cpp:303-521;
oracle = dense numpy algebra, tol 1e-13)."""

import jax.numpy as jnp
import numpy as np
import pytest

from mgpgcr_tpu.ops.bsr import BlockSparseOperator
from mgpgcr_tpu.ops.coo import COOMatrix
from mgpgcr_tpu.ops.csr import CSRMatrix
from mgpgcr_tpu.ops.dense import DenseOperator
from mgpgcr_tpu.ops.dirac import make_dirac
from mgpgcr_tpu.ops.ell import ELLOperator


def _rand_sparse(rng, n=40, density=0.15):
    a = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    mask = rng.random((n, n)) < density
    np.fill_diagonal(mask, True)
    return np.where(mask, a, 0.0)


def test_dense_ops(rng):
    a = rng.standard_normal((8, 8)) + 1j * rng.standard_normal((8, 8))
    b = rng.standard_normal((8, 8)) + 1j * rng.standard_normal((8, 8))
    x = rng.standard_normal(8) + 1j * rng.standard_normal(8)
    da, db = DenseOperator(jnp.asarray(a)), DenseOperator(jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(da.apply(jnp.asarray(x))), a @ x, atol=1e-13)
    np.testing.assert_allclose(np.asarray((da + db).a), a + b, atol=1e-15)
    np.testing.assert_allclose(np.asarray(da.matmul(db).a), a @ b, atol=1e-13)
    np.testing.assert_allclose(np.asarray(da.dagger().a), a.conj().T, atol=1e-15)


def test_csr_from_dense_and_spmv(rng):
    a = _rand_sparse(rng)
    m = CSRMatrix.from_dense(a)
    x = rng.standard_normal(a.shape[1]) + 1j * rng.standard_normal(a.shape[1])
    np.testing.assert_allclose(m.spmv(x), a @ x, atol=1e-13)
    np.testing.assert_allclose(np.asarray(m.spmv_jax(jnp.asarray(x))), a @ x, atol=1e-13)
    np.testing.assert_allclose(m.to_dense(), a, atol=0)


def test_csr_from_triplets_merges_duplicates():
    rows = np.array([0, 1, 0, 1, 0])
    cols = np.array([1, 0, 1, 1, 0])
    vals = np.array([1.0, 2.0, 3.0, 4.0, 5.0], dtype=np.complex128)
    m = CSRMatrix.from_triplets(rows, cols, vals, (2, 2))
    expected = np.array([[5.0, 4.0], [2.0, 4.0]])
    np.testing.assert_allclose(m.to_dense(), expected, atol=0)
    assert m.nnz == 4
    assert m.val_at(0, 1) == 4.0
    assert m.val_at(1, 1) == 4.0


def test_csr_add_sub_scale_dagger(rng):
    a, b = _rand_sparse(rng, 30), _rand_sparse(rng, 30)
    ma, mb = CSRMatrix.from_dense(a), CSRMatrix.from_dense(b)
    np.testing.assert_allclose((ma + mb).to_dense(), a + b, atol=1e-14)
    np.testing.assert_allclose((ma - mb).to_dense(), a - b, atol=1e-14)
    np.testing.assert_allclose(ma.scale(2.5j).to_dense(), 2.5j * a, atol=1e-14)
    np.testing.assert_allclose(ma.dagger().to_dense(), a.conj().T, atol=0)


def test_ell_matches_csr(rng):
    a = _rand_sparse(rng)
    m = CSRMatrix.from_dense(a)
    ell = m.to_ell()
    x = rng.standard_normal(a.shape[1]) + 1j * rng.standard_normal(a.shape[1])
    np.testing.assert_allclose(np.asarray(ell.apply(jnp.asarray(x))), a @ x, atol=1e-13)
    np.testing.assert_allclose(np.asarray(ell.to_dense()), a, atol=0)
    # stacked SpMM
    xs = rng.standard_normal((5, a.shape[1])) + 1j * rng.standard_normal((5, a.shape[1]))
    np.testing.assert_allclose(
        np.asarray(ell.apply(jnp.asarray(xs))), xs @ a.T, atol=1e-13
    )
    np.testing.assert_allclose(
        np.asarray(ell.scale(2.0).apply(jnp.asarray(x))), 2 * (a @ x), atol=1e-12
    )


def test_ell_cf_split_matches_complex(rng):
    """cf=True stores split re/im values (host-side split: complex device
    transfers are unimplemented on TPU) and must apply identically."""
    from mgpgcr_tpu import cplx

    a = _rand_sparse(rng)
    m = CSRMatrix.from_dense(a)
    ell_cf = m.to_ell(dtype=jnp.float64, cf=True)
    assert cplx.is_cf(ell_cf.vals)
    x = rng.standard_normal(a.shape[1]) + 1j * rng.standard_normal(a.shape[1])
    y = ell_cf.apply(cplx.from_numpy(x, jnp.float64))
    np.testing.assert_allclose(cplx.to_numpy(y), a @ x, atol=1e-13)


def test_coo_roundtrip(rng):
    a = _rand_sparse(rng, 20)
    rows, cols = np.nonzero(a)
    coo = COOMatrix(rows, cols, a[rows, cols], a.shape)
    np.testing.assert_allclose(coo.to_dense(), a, atol=0)
    np.testing.assert_allclose(coo.to_csr().to_dense(), a, atol=0)


def test_bsr_apply_matches_dense(rng):
    nb, k, ne = 4, 3, 5
    blocks = rng.standard_normal((nb, k, ne, ne)) + 1j * rng.standard_normal(
        (nb, k, ne, ne)
    )
    cols = rng.integers(0, nb, size=(nb, k)).astype(np.int32)
    op = BlockSparseOperator(jnp.asarray(blocks), jnp.asarray(cols))
    x = rng.standard_normal(nb * ne) + 1j * rng.standard_normal(nb * ne)
    dense = np.asarray(op.to_dense())
    np.testing.assert_allclose(
        np.asarray(op.apply(jnp.asarray(x))), dense @ x, atol=1e-12
    )
    # duplicate blocks must sum (HierarchicalSparse quirk-Q10 semantics)
    cols_dup = np.zeros((nb, k), dtype=np.int32)
    op2 = BlockSparseOperator(jnp.asarray(blocks), jnp.asarray(cols_dup))
    dense2 = np.asarray(op2.to_dense())
    np.testing.assert_allclose(
        np.asarray(op2.apply(jnp.asarray(x))), dense2 @ x, atol=1e-12
    )
    assert abs(op.val_at(0, 0) - dense[0, 0]) < 1e-12


def test_bsr_apply_cf_blocks(rng):
    """Split re/im CF blocks + CF fields — the TPU path solvers/mg.py
    builds (round-2 VERDICT reproducer: einsum on CF blocks crashed)."""
    from mgpgcr_tpu import cplx

    nb, k, ne = 4, 3, 5
    blocks = rng.standard_normal((nb, k, ne, ne)) + 1j * rng.standard_normal(
        (nb, k, ne, ne)
    )
    cols = rng.integers(0, nb, size=(nb, k)).astype(np.int32)
    op = BlockSparseOperator(
        cplx.from_numpy(blocks, jnp.float64), jnp.asarray(cols)
    )
    x = rng.standard_normal(nb * ne) + 1j * rng.standard_normal(nb * ne)
    dense = cplx.to_numpy(op.to_dense())
    got = op.apply(cplx.from_numpy(x, jnp.float64))
    np.testing.assert_allclose(cplx.to_numpy(got), dense @ x, atol=1e-12)
    assert abs(op.val_at(2, 3) - dense[2, 3]) < 1e-12
    # batched leading axis, as the coarse GCR stacks use
    xb = rng.standard_normal((2, nb * ne)) + 1j * rng.standard_normal(
        (2, nb * ne)
    )
    got_b = op.apply(cplx.from_numpy(xb, jnp.float64))
    np.testing.assert_allclose(
        cplx.to_numpy(got_b), xb @ dense.T, atol=1e-12
    )


def test_dirac_operator(rng):
    a = _rand_sparse(rng, 24)
    ell = CSRMatrix.from_dense(a).to_ell()
    dirac = make_dirac(ell, 0.3 + 0.1j)
    x = rng.standard_normal(24) + 1j * rng.standard_normal(24)
    expected = x - (0.3 + 0.1j) * (a @ x)
    np.testing.assert_allclose(
        np.asarray(dirac.apply(jnp.asarray(x))), expected, atol=1e-13
    )
    d2 = dirac.with_k(0.5)
    np.testing.assert_allclose(
        np.asarray(d2.apply(jnp.asarray(x))), x - 0.5 * (a @ x), atol=1e-13
    )


def test_reference_fixture_structure(dirac44_csr):
    """The checked-in 4^4 matrix: 3072^2, nnz=119,808, uniform 39 nnz/row."""
    m = dirac44_csr
    assert m.shape == (3072, 3072)
    assert m.nnz == 119808
    assert (np.diff(m.indptr) == 39).all()


def test_reference_fixture_gamma5_hermiticity(dirac44_csr):
    """gamma5 D gamma5 = D^dagger — the Wilson--Dirac hopping matrix is
    gamma5-hermitian (reference analogue: test_hermiticity, main.cpp:541-570)."""
    import jax

    from mgpgcr_tpu import fields
    from mgpgcr_tpu.mesh import LatticeMesh

    mesh = LatticeMesh((4, 4, 4, 4, 4, 3))
    ell = dirac44_csr.to_ell()
    v = fields.random_field(jax.random.PRNGKey(0), mesh)
    w = fields.random_field(jax.random.PRNGKey(1), mesh)
    # <v, g5 D g5 w> == <D v, w>  <=>  g5 D g5 = D^dagger
    lhs = complex(
        fields.dot(v, fields.gamma5(ell.apply(fields.gamma5(w, mesh)), mesh))
    )
    rhs = complex(fields.dot(ell.apply(v), w))
    assert abs(lhs - rhs) / abs(rhs) < 1e-10
