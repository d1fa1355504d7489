"""Oracle-trajectory validation + the reference's matrix property battery.

Covers the reference's hand-rolled checks (SURVEY.md §4): hermiticity
probes (``test_hermiticity``, main.cpp:541-570), gamma5/Dirac identities
(``test_gamma5``/``test_dirac``, main.cpp:680-694, 967-1004), and the
double-precision trajectory comparison the reference never had.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from oracle_gcr import oracle_gcr

from mgpgcr_tpu import fields
from mgpgcr_tpu.mesh import LatticeMesh
from mgpgcr_tpu.ops.dirac import make_dirac
from mgpgcr_tpu.ops.wilson import WilsonDiracOperator, random_links
from mgpgcr_tpu.solvers.gcr import gcr_solve
from mgpgcr_tpu.solvers.params import GCRParams

MESH44 = LatticeMesh((4, 4, 4, 4, 4, 3))


def test_gcr_trajectory_matches_numpy_oracle(dirac44_ell, rng):
    """Our lax.while_loop GCR must walk the same residual trajectory as an
    independent numpy re-execution with identical semantics."""
    k = 0.15
    a = make_dirac(dirac44_ell, k=k)
    rhs = fields.random_field(jax.random.PRNGKey(42), MESH44)
    params = GCRParams(tol=1e-10, max_iter=400, restart=5)
    res = gcr_solve(a, rhs, params)
    assert bool(res.converged)

    x_o, hist_o = oracle_gcr(
        lambda v: np.asarray(a.apply(jnp.asarray(v))),
        np.asarray(rhs),
        tol=1e-10,
        max_iter=400,
        restart=5,
    )
    hist = np.asarray(res.res_history)
    hist = hist[~np.isnan(hist)]
    assert len(hist) == len(hist_o)
    np.testing.assert_allclose(hist, hist_o, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(res.x), x_o, atol=1e-9)


def test_reference_convention_oracle_converges(dirac44_ell):
    """The reference's conjugated-coefficient GCR (GCR.h:230, quirk) also
    converges on its gamma5-hermitian fixture — documented behavior."""
    a = make_dirac(dirac44_ell, k=0.15)
    rhs = np.asarray(fields.random_field(jax.random.PRNGKey(42), MESH44))
    _, hist = oracle_gcr(
        lambda v: np.asarray(a.apply(jnp.asarray(v))),
        rhs,
        tol=1e-8,
        max_iter=1000,
        restart=5,
        conjugate_coeffs=True,
    )
    assert hist[-1] <= 1e-8


def test_fixture_gamma5_hermiticity(dirac44_csr, rng):
    """gamma5 D gamma5 = D^dagger for the 4^4 Wilson hopping matrix
    (test_hermiticity, main.cpp:541-570)."""
    v = rng.standard_normal(3072) + 1j * rng.standard_normal(3072)
    lhs = fields.gamma5(
        jnp.asarray(dirac44_csr.spmv(np.asarray(fields.gamma5(jnp.asarray(v), MESH44)))),
        MESH44,
    )
    rhs = dirac44_csr.dagger().spmv(v)
    np.testing.assert_allclose(np.asarray(lhs), rhs, atol=1e-10)


def test_synthetic_wilson_gamma5_hermiticity():
    """Our stencil generator satisfies the same symmetry — it builds
    operators interchangeable with the reference fixtures."""
    from mgpgcr_tpu.ops.wilson import materialize_csr

    mesh = LatticeMesh((4, 4, 2, 2, 4, 3))
    links = random_links(jax.random.PRNGKey(3), mesh)
    d = WilsonDiracOperator(links, mesh)
    v = fields.random_field(jax.random.PRNGKey(5), mesh)
    lhs = fields.gamma5(d.apply(fields.gamma5(v, mesh)), mesh)
    rhs = materialize_csr(links, mesh).dagger().spmv(np.asarray(v))
    np.testing.assert_allclose(np.asarray(lhs), rhs, atol=1e-12)


def test_dirac_identity(dirac44_ell):
    """DiracOp(f) == f - k D(f) (test_dirac, main.cpp:680-694)."""
    k = 0.137
    a = make_dirac(dirac44_ell, k=k)
    v = fields.random_field(jax.random.PRNGKey(6), MESH44)
    np.testing.assert_allclose(
        np.asarray(a.apply(v)),
        np.asarray(v - k * dirac44_ell.apply(v)),
        atol=1e-12,
    )


def test_multi_rhs_vmapped_solve(dirac44_ell):
    """Batched independent right-hand sides via vmap — the data-parallel
    axis the reference lacks (SURVEY.md §2 parallelism inventory)."""
    a = make_dirac(dirac44_ell, k=0.1)
    params = GCRParams(tol=1e-8, max_iter=200, restart=5)
    batch = jnp.stack(
        [
            np.asarray(fields.random_field(jax.random.PRNGKey(s), MESH44))
            for s in range(3)
        ]
    )
    res = jax.vmap(lambda b: gcr_solve(a, b, params))(batch)
    assert bool(jnp.all(res.converged))
    for i in range(3):
        r = batch[i] - a.apply(res.x[i])
        assert float(fields.norm(r) / fields.norm(batch[i])) < 2e-8


def test_generator_matches_fixture_sparsity_pattern(dirac44_csr):
    """The synthetic Wilson-Dirac generator produces the reference
    fixture's sparsity structure EXACTLY — identical CSR indptr and
    indices on the 4^4 lattice (the reference's probe_order experiment,
    main.cpp:572-677, inverted: we verified the index order and gamma
    assignment against the fixture's coupling pattern). Only the values
    differ (different gauge configuration)."""
    from mgpgcr_tpu.ops.wilson import materialize_csr, random_links

    mesh = LatticeMesh((4, 4, 4, 4, 4, 3))
    ours = materialize_csr(random_links(jax.random.PRNGKey(0), mesh), mesh)
    np.testing.assert_array_equal(ours.indptr, dirac44_csr.indptr)
    np.testing.assert_array_equal(ours.indices, dirac44_csr.indices)
