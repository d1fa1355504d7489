"""MG on the TPU path: split re/im CF fields in the (4,3,T,Z,Y*X) layout.

The blocked representation coincides with the canonical one
(BlockMap.to_blocked_tpu), so the TPU-layout MG must build the same coarse
space and precondition just as well.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mgpgcr_tpu import cplx, fields
from mgpgcr_tpu.mesh import LatticeMesh
from mgpgcr_tpu.ops.dirac import DiracOperator
from mgpgcr_tpu.ops.wilson import WilsonDiracOperator, random_links
from mgpgcr_tpu.ops.wilson_tpu import TpuWilsonDirac, field_to_tpu
from mgpgcr_tpu.solvers.gcr import gcr_solve
from mgpgcr_tpu.solvers.mg import setup_mg
from mgpgcr_tpu.solvers.params import GCRParams, MGParams


@pytest.fixture(scope="module")
def tpu_problem():
    mesh = LatticeMesh((4, 4, 4, 4, 4, 3))
    links = random_links(jax.random.PRNGKey(0), mesh)
    k = 0.12
    d_cf = TpuWilsonDirac.build(cplx.ascf(links), mesh)
    a_cf = DiracOperator(d_cf, cplx.from_scalar(k, jnp.float64))
    a_cx = DiracOperator(WilsonDiracOperator(links, mesh), jnp.asarray(k + 0j))
    return mesh, a_cf, a_cx


def test_setup_mg_tpu_layout_and_solve(tpu_problem):
    mesh, a_cf, a_cx = tpu_problem
    params = MGParams(block=2, n_nullvecs=3)
    mgp = setup_mg(jax.random.PRNGKey(3), a_cf, mesh, params, layout="tpu")

    # basis orthonormality per block
    q = cplx.to_numpy(mgp.q)
    gram = np.einsum("bke,bkf->bef", q.conj(), q)
    eye = np.broadcast_to(np.eye(q.shape[2]), gram.shape)
    np.testing.assert_allclose(gram, eye, atol=1e-10)

    # Galerkin consistency in the CF representation
    nc = mgp.coarse.shape[0]
    vc = cplx.ascf(fields.random_field(jax.random.PRNGKey(13), nc))
    lhs = mgp.restrict(a_cf.apply(mgp.prolong(vc)))
    rhs = mgp.coarse.apply(vc)
    np.testing.assert_allclose(
        cplx.to_numpy(lhs), cplx.to_numpy(rhs), atol=1e-9
    )

    # preconditioned solve converges much faster than plain GCR
    b = cplx.random(jax.random.PRNGKey(7), a_cf.d.field_shape, jnp.float64)
    plain = gcr_solve(a_cf, b, GCRParams(tol=1e-9, max_iter=2000, restart=5))
    prec = gcr_solve(
        a_cf, b, GCRParams(tol=1e-9, max_iter=300, restart=5), precond=mgp.apply
    )
    assert bool(plain.converged) and bool(prec.converged)
    assert int(prec.n_iters) < int(plain.n_iters)
    r = b - a_cf.apply(prec.x)
    assert float(jnp.sqrt(cplx.abs2_sum(r) / cplx.abs2_sum(b))) < 5e-9


def test_tpu_and_flat_mg_build_same_coarse_space(tpu_problem):
    """Same null vectors in → same Galerkin coarse matrix (up to the
    orthonormalisation's basis choice, checked via subspace projectors)."""
    mesh, a_cf, a_cx = tpu_problem
    from mgpgcr_tpu.solvers.mg import block_orthonormalize, chiral_double

    v = fields.random_field(jax.random.PRNGKey(21), mesh)[None, :]
    doubled_flat = chiral_double(v, mesh, "flat")
    v_tpu = field_to_tpu(cplx.ascf(v), mesh)
    doubled_tpu = chiral_double(v_tpu, mesh, "tpu")

    bm = mesh.blocking(2)
    q_flat = np.asarray(block_orthonormalize(doubled_flat, bm, "flat"))
    q_tpu = cplx.to_numpy(block_orthonormalize(doubled_tpu, bm, "tpu"))
    # projectors onto the per-block spans must agree regardless of basis
    p_flat = np.einsum("bke,ble->bkl", q_flat, q_flat.conj())
    p_tpu = np.einsum("bke,ble->bkl", q_tpu, q_tpu.conj())
    np.testing.assert_allclose(p_flat, p_tpu, atol=1e-9)
