"""Mixed-precision iterative refinement: f32 inner solves reach the
reference's complex128 tolerances (BASELINE.md acceptance: "converges to
identical tolerance")."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mgpgcr_tpu import cplx, fields
from mgpgcr_tpu.mesh import LatticeMesh
from mgpgcr_tpu.ops.dirac import DiracOperator
from mgpgcr_tpu.ops.wilson import WilsonDiracOperator, random_links
from mgpgcr_tpu.ops.wilson_tpu import TpuWilsonDirac
from mgpgcr_tpu.solvers.params import GCRParams
from mgpgcr_tpu.solvers.refine import refined_solve, wilson_refined_solve


def test_refined_solve_generic_reaches_f64_tolerance():
    """Low-precision (complex64) ELL solves refined to 1e-12."""
    import os

    path = os.environ.get(
        "MGPGCR_REFERENCE_MATRIX",
        "/root/reference/data/sample_matrix/4x4parsed.txt",
    )
    if not os.path.exists(path):
        pytest.skip("fixture unavailable")
    from mgpgcr_tpu.io import read_parsed_txt
    from mgpgcr_tpu.ops.dirac import make_dirac
    from mgpgcr_tpu.solvers.gcr import gcr_solve_jit

    ell = read_parsed_txt(path).to_ell()
    k = 0.15
    a64 = make_dirac(ell, k=k)  # complex128
    ell32 = type(ell)(ell.vals.astype(jnp.complex64), ell.cols, ell.n_cols)
    a32 = DiracOperator(ell32, jnp.asarray(k, jnp.complex64))

    rhs = np.asarray(
        fields.random_field(jax.random.PRNGKey(5), ell.shape[0])
    )
    inner = GCRParams(tol=1e-5, max_iter=400, restart=5)

    def solve_lo(r):
        scale = np.max(np.abs(r))
        rj = jnp.asarray((r / scale).astype(np.complex64))
        return np.asarray(gcr_solve_jit(a32, rj, inner).x).astype(np.complex128) * scale

    def apply_hi(x):
        return np.asarray(a64.apply(jnp.asarray(x)))

    res = refined_solve(solve_lo, apply_hi, rhs, tol=1e-12)
    assert res.converged, res.history
    # trusted residual really is 1e-12 in complex128
    assert res.final_relres <= 1e-12
    # each round contracted (low-precision solver tol 1e-5 -> ~5 rounds)
    assert res.n_refine <= 10


def test_wilson_refined_solve_tpu_layout():
    """CF f32 TPU-layout inner solves + complex128 residual -> 1e-12."""
    mesh = LatticeMesh((4, 4, 2, 2, 4, 3))
    links = random_links(jax.random.PRNGKey(0), mesh)
    k = 0.1

    a_hi = DiracOperator(WilsonDiracOperator(links, mesh), jnp.asarray(k + 0j))
    d_lo = TpuWilsonDirac.build(cplx.ascf(links, jnp.float32), mesh)
    a_lo = DiracOperator(d_lo, cplx.from_scalar(k, jnp.float32))

    rhs = np.asarray(fields.random_field(jax.random.PRNGKey(5), mesh))

    def apply_hi(x):
        return np.asarray(a_hi.apply(jnp.asarray(x)))

    res = wilson_refined_solve(
        a_lo,
        mesh,
        rhs,
        GCRParams(tol=1e-4, max_iter=300, restart=5),
        apply_hi,
        tol=1e-12,
    )
    assert res.converged, res.history
    assert res.final_relres <= 1e-12
    # monotone contraction across rounds
    assert all(b < a for a, b in zip(res.history, res.history[1:]))


def test_refined_solve_zero_rhs():
    res = refined_solve(lambda r: r, lambda x: x, np.zeros(8, np.complex128))
    assert res.converged and res.final_relres == 0.0
