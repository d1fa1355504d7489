"""Ingestion tests (reference analogue: Parse.cpp parse_data/read_data and
test_data, main.cpp:524-539)."""

import jax.numpy as jnp
import numpy as np

from mgpgcr_tpu.io.matrix_market import read_matrix_market
from mgpgcr_tpu.io.npz_cache import load_ell_npz, save_ell_npz
from mgpgcr_tpu.io.parsed_txt import read_parsed_txt, write_parsed_txt
from mgpgcr_tpu.ops.csr import CSRMatrix


def _rand_csr(rng, n=12):
    a = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    a[rng.random((n, n)) < 0.6] = 0.0
    np.fill_diagonal(a, 1.0)
    return CSRMatrix.from_dense(a)


def test_parsed_txt_roundtrip(tmp_path, rng):
    m = _rand_csr(rng)
    p = tmp_path / "parsed.txt"
    write_parsed_txt(p, m)
    m2 = read_parsed_txt(p)
    assert m2.shape == m.shape and m2.nnz == m.nnz
    np.testing.assert_array_equal(m2.indptr, m.indptr)
    np.testing.assert_array_equal(m2.indices, m.indices)
    np.testing.assert_allclose(m2.data, m.data, rtol=1e-5)  # %.6g text precision


def test_matrix_market_complex(tmp_path):
    content = """%%MatrixMarket matrix coordinate complex general
% a comment
3 3 4
1 1 1.5 -0.5
2 1 2.0 0.25
2 2 -1.0 0.0
3 3 0.0 3.0
"""
    p = tmp_path / "m.mtx"
    p.write_text(content)
    coo = read_matrix_market(p)
    dense = coo.to_dense()
    assert dense.shape == (3, 3)
    assert dense[0, 0] == 1.5 - 0.5j
    assert dense[1, 0] == 2.0 + 0.25j
    assert dense[2, 2] == 3.0j
    assert coo.nnz == 4


def test_matrix_market_real_symmetric(tmp_path):
    content = """%%MatrixMarket matrix coordinate real symmetric
2 2 2
1 1 2.0
2 1 -3.0
"""
    p = tmp_path / "s.mtx"
    p.write_text(content)
    dense = read_matrix_market(p).to_dense()
    np.testing.assert_allclose(dense, np.array([[2.0, -3.0], [-3.0, 0.0]]), atol=0)


def test_npz_cache_roundtrip(tmp_path, rng):
    m = _rand_csr(rng)
    ell = m.to_ell()
    p = tmp_path / "m.npz"
    save_ell_npz(p, ell)
    ell2 = load_ell_npz(p)
    np.testing.assert_array_equal(np.asarray(ell2.vals), np.asarray(ell.vals))
    np.testing.assert_array_equal(np.asarray(ell2.cols), np.asarray(ell.cols))
    assert ell2.n_cols == ell.n_cols
    x = jnp.asarray(rng.standard_normal(m.shape[1]) + 0j)
    np.testing.assert_allclose(
        np.asarray(ell2.apply(x)), np.asarray(ell.apply(x)), atol=0
    )


def test_reference_fixture_loads(dirac44_csr):
    # spot values: first row, first entry is column 12 (file line 3)
    assert dirac44_csr.indices[0] == 12
    assert abs(dirac44_csr.data[0] - (-0.502679 + 0.364411j)) < 1e-6
