"""Two-level adaptive MG: algebraic property tests + convergence.

Mirrors the reference's hand-rolled battery (SURVEY.md §4):
- ``MG::test_MG`` (MG.h:433-512): Galerkin consistency T·R·M ≈ T·m_coarse·R,
  (TR)^2 = TR projector, per-block P^H P = I;
- ``test_MG_precompute`` (main.cpp:786-831): restrict∘expand round-trip;
- ``test_MG`` / ``k_critical_mg_precond`` (main.cpp:744-875): MG-GCR
  converges near critical k in far fewer iterations than plain GCR.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mgpgcr_tpu import fields
from mgpgcr_tpu.mesh import LatticeMesh
from mgpgcr_tpu.ops.dirac import make_dirac
from mgpgcr_tpu.solvers.gcr import gcr_solve
from mgpgcr_tpu.solvers.mg import (
    MGPreconditioner,
    chiral_double,
    setup_mg,
)
from mgpgcr_tpu.solvers.params import GCRParams, MGParams

K_NEAR_CRITICAL = 0.2  # fixture's critical k = 0.20611 (main.cpp:699)


@pytest.fixture(scope="module")
def mg_setup(dirac44_ell_mod):
    mesh = LatticeMesh((4, 4, 4, 4, 4, 3))
    a = make_dirac(dirac44_ell_mod, k=K_NEAR_CRITICAL)
    params = MGParams(block=2, n_nullvecs=4)
    mgp = setup_mg(jax.random.PRNGKey(3), a, mesh, params)
    return mesh, a, mgp


@pytest.fixture(scope="module")
def dirac44_ell_mod():
    import os

    path = os.environ.get(
        "MGPGCR_REFERENCE_MATRIX",
        "/root/reference/data/sample_matrix/4x4parsed.txt",
    )
    if not os.path.exists(path):
        pytest.skip("reference 4x4 fixture not available")
    from mgpgcr_tpu.io.parsed_txt import read_parsed_txt

    return read_parsed_txt(path).to_ell()


def test_block_basis_orthonormal(mg_setup):
    """P^H P = I per block (MG.h:496-510)."""
    _, _, mgp = mg_setup
    q = np.asarray(mgp.q)  # (ne, nb, bl)
    gram = np.einsum("ebk,fbk->bef", q.conj(), q)
    eye = np.broadcast_to(np.eye(q.shape[0]), gram.shape)
    np.testing.assert_allclose(gram, eye, atol=1e-12)


def test_restrict_prolong_projector(mg_setup):
    """(P R)^2 = P R and R P = I on the coarse space (MG.h:433-512)."""
    mesh, _, mgp = mg_setup
    v = fields.random_field(jax.random.PRNGKey(11), mesh)
    pr = mgp.prolong(mgp.restrict(v))
    pr2 = mgp.prolong(mgp.restrict(pr))
    np.testing.assert_allclose(np.asarray(pr2), np.asarray(pr), atol=1e-12)

    vc = fields.random_field(jax.random.PRNGKey(12), mgp.coarse.shape[0])
    rt = mgp.restrict(mgp.prolong(vc))
    np.testing.assert_allclose(np.asarray(rt), np.asarray(vc), atol=1e-12)


def test_galerkin_consistency(mg_setup):
    """R A P = C: the coarse operator is exactly Galerkin (MG.h:461-477,
    without the reference's -mu basis bug Q3)."""
    mesh, a, mgp = mg_setup
    vc = fields.random_field(jax.random.PRNGKey(13), mgp.coarse.shape[0])
    lhs = mgp.restrict(a.apply(mgp.prolong(vc)))
    rhs = mgp.coarse.apply(vc)
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-10)


def test_chiral_doubling(mg_setup):
    """gamma5 phi_± = ± phi_± (MG.h:317-345)."""
    mesh = LatticeMesh((4, 4, 4, 4, 4, 3))
    v = fields.random_field(jax.random.PRNGKey(14), mesh)[None, :]
    doubled = chiral_double(v, mesh)
    plus, minus = doubled[0], doubled[1]
    np.testing.assert_allclose(
        np.asarray(fields.gamma5(plus, mesh)), np.asarray(plus), atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(fields.gamma5(minus, mesh)), np.asarray(-minus), atol=1e-12
    )


def test_mg_apply_is_deterministic(mg_setup):
    """Flexible GCR tolerates a nonlinear preconditioner (inner Krylov
    solves are nonlinear in the rhs) but it must be *deterministic* — the
    reference's solver-as-operator seeds x0 randomly per call (GCR.h:62-68,
    quirk), which ours must not."""
    mesh, _, mgp = mg_setup
    r = fields.random_field(jax.random.PRNGKey(15), mesh)
    np.testing.assert_array_equal(
        np.asarray(mgp.apply(r)), np.asarray(mgp.apply(r))
    )
    # and homogeneous under real scaling up to roundoff (sanity that no
    # hidden state enters)
    lhs = mgp.apply(2.0 * r)
    rhs = 2.0 * mgp.apply(r)
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), rtol=1e-8)


def test_mg_gcr_beats_plain_gcr_near_critical(mg_setup):
    """Iterations-to-tol: MG-GCR must be several times cheaper in outer
    iterations at k near critical (SemesterProject.pdf §4.2, Fig. 1)."""
    mesh, a, mgp = mg_setup
    rhs = fields.random_field(jax.random.PRNGKey(7), mesh)
    plain = gcr_solve(a, rhs, GCRParams(tol=1e-10, max_iter=3000, restart=5))
    prec = gcr_solve(
        a, rhs, GCRParams(tol=1e-10, max_iter=500, restart=5), precond=mgp.apply
    )
    assert bool(plain.converged) and bool(prec.converged)
    assert int(prec.n_iters) * 3 < int(plain.n_iters)
    # independent residual check
    r = rhs - a.apply(prec.x)
    assert float(fields.norm(r) / fields.norm(rhs)) < 5e-10


@pytest.mark.parametrize(
    "dims,block",
    [
        ((4, 4, 4, 4), 2),        # bpd 2 per dim (merged +-mu couplings)
        ((8, 4, 2, 4), (2, 1, 2, 4)),  # mixed bpd: 4, 4, 1, 1
        ((6, 4, 2, 2), (2, 2, 2, 2)),  # bpd 3 (root-of-unity Vandermonde)
    ],
)
def test_phased_assembly_matches_column_sweep(dims, block):
    """Phase-probed Galerkin blocks reproduce the per-block-column sweep
    exactly (up to roundoff) on the synthetic Wilson operator, across
    blocks-per-dim = 1, 2, 3, and 4."""
    from mgpgcr_tpu.ops.wilson import WilsonDiracOperator, random_links
    from mgpgcr_tpu.solvers.mg import (
        blocks_to_dense,
        coarse_to_block_ell,
        galerkin_coarse_blocks,
        galerkin_coarse_matrix,
    )

    mesh = LatticeMesh((*dims, 4, 3))
    links = random_links(jax.random.PRNGKey(2), mesh)
    d = WilsonDiracOperator(links, mesh)
    a = make_dirac(d, k=0.1)
    block_map = mesh.blocking(block)

    rng = np.random.default_rng(0)
    ne = 3
    vecs = jnp.asarray(
        rng.standard_normal((ne, mesh.size)) + 1j * rng.standard_normal((ne, mesh.size))
    )
    from mgpgcr_tpu.solvers.mg import block_orthonormalize

    q = block_orthonormalize(vecs, block_map)

    c_ref = galerkin_coarse_matrix(a, q, block_map)
    blocks, table = galerkin_coarse_blocks(a, q, block_map)

    # dense reconstruction matches
    np.testing.assert_allclose(
        np.asarray(blocks_to_dense(blocks, table)), np.asarray(c_ref), atol=1e-11
    )
    # block-ELL slots match the extracted-and-deduped reference blocks
    bsr_ref = coarse_to_block_ell(c_ref, block_map, ne)
    np.testing.assert_allclose(
        np.asarray(blocks), np.asarray(bsr_ref.blocks), atol=1e-11
    )
    np.testing.assert_array_equal(np.asarray(table), np.asarray(bsr_ref.block_cols))


def test_phased_assembly_tpu_layout():
    """Phased assembly on split re/im CF fields in the TPU layout."""
    from mgpgcr_tpu import cplx
    from mgpgcr_tpu.ops.dirac import DiracOperator
    from mgpgcr_tpu.ops.wilson import random_links_cf
    from mgpgcr_tpu.ops.wilson_tpu import TpuWilsonDirac
    from mgpgcr_tpu.solvers.mg import (
        blocks_to_dense,
        block_orthonormalize,
        galerkin_coarse_blocks,
        galerkin_coarse_matrix,
    )

    mesh = LatticeMesh((4, 4, 2, 4, 4, 3))
    links = random_links_cf(4, mesh, jnp.float64)
    d = TpuWilsonDirac.build(links, mesh)
    a = DiracOperator(d, cplx.from_scalar(0.1, jnp.float64))
    block_map = mesh.blocking(2)

    vecs = cplx.random(jax.random.PRNGKey(5), (3, *d.field_shape), jnp.float64)
    q = block_orthonormalize(vecs, block_map, layout="tpu")
    c_ref = galerkin_coarse_matrix(a, q, block_map, layout="tpu")
    blocks, table = galerkin_coarse_blocks(a, q, block_map, layout="tpu")
    got = blocks_to_dense(blocks, table)
    np.testing.assert_allclose(
        np.asarray(got.re) + 1j * np.asarray(got.im),
        np.asarray(c_ref.re) + 1j * np.asarray(c_ref.im),
        atol=1e-11,
    )
