"""Fused-kernel GCR (Pallas streaming iteration algebra) vs the generic
XLA path: identical trajectories on the same problems.

Runs the kernels in Pallas interpreter mode on the CPU backend (the
compiled path is exercised on real TPU hardware by benchmarks/ and
bench.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mgpgcr_tpu import cplx
from mgpgcr_tpu.mesh import LatticeMesh
from mgpgcr_tpu.ops.dirac import DiracOperator
from mgpgcr_tpu.ops.wilson import random_links_cf
from mgpgcr_tpu.ops.wilson_tpu import TpuWilsonDirac
from mgpgcr_tpu.solvers.gcr import gcr_solve
from mgpgcr_tpu.solvers.params import GCRParams


@pytest.fixture(scope="module")
def problem():
    mesh = LatticeMesh((4, 4, 2, 4, 4, 3))
    links = random_links_cf(11, mesh, jnp.float64)
    d = TpuWilsonDirac.build(links, mesh)
    a = DiracOperator(d, cplx.from_scalar(0.12, jnp.float64))
    rhs = cplx.random(jax.random.PRNGKey(5), d.field_shape, jnp.float64)
    return a, rhs


@pytest.mark.parametrize(
    "params",
    [
        GCRParams(tol=1e-9, max_iter=60, restart=5),
        GCRParams(tol=1e-9, max_iter=60, truncation=4),
        GCRParams(tol=1e-9, max_iter=40, restart=3, residual_refresh=7),
    ],
    ids=["restart", "truncation", "refresh"],
)
def test_fused_matches_generic(problem, params):
    a, rhs = problem
    ref = gcr_solve(a, rhs, params)
    got = gcr_solve(a, rhs, params, fused=True)
    assert int(got.n_iters) == int(ref.n_iters)
    h_ref = np.asarray(ref.res_history)
    h_got = np.asarray(got.res_history)
    mask = ~np.isnan(h_ref)
    np.testing.assert_allclose(h_got[mask], h_ref[mask], rtol=1e-10, atol=1e-13)
    np.testing.assert_allclose(
        cplx.to_numpy(got.x), cplx.to_numpy(ref.x), rtol=1e-8, atol=1e-10
    )


def test_fused_with_preconditioner(problem):
    a, rhs = problem
    params = GCRParams(tol=1e-8, max_iter=50, restart=5)
    inner = GCRParams(tol=0.0, max_iter=3, truncation=3)

    def precond(r):
        return gcr_solve(a, r, inner).x

    ref = gcr_solve(a, rhs, params, precond=precond)
    got = gcr_solve(a, rhs, params, precond=precond, fused=True)
    assert int(got.n_iters) == int(ref.n_iters)
    np.testing.assert_allclose(
        cplx.to_numpy(got.x), cplx.to_numpy(ref.x), rtol=1e-7, atol=1e-9
    )


def test_fused_independent_residual(problem):
    """The fused solver's bookkeeping matches a from-scratch residual."""
    a, rhs = problem
    res = gcr_solve(a, rhs, GCRParams(tol=1e-10, max_iter=200, restart=6), fused=True)
    assert bool(res.converged)
    r = rhs - a.apply(res.x)
    rel = float(jnp.sqrt(cplx.abs2_sum(r) / cplx.abs2_sum(rhs)))
    assert rel < 5e-10, rel
