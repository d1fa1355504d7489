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


@pytest.mark.slow
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


@pytest.mark.slow
def test_fused_independent_residual(problem):
    """The fused solver's bookkeeping matches a from-scratch residual."""
    a, rhs = problem
    res = gcr_solve(a, rhs, GCRParams(tol=1e-10, max_iter=200, restart=6), fused=True)
    assert bool(res.converged)
    r = rhs - a.apply(res.x)
    rel = float(jnp.sqrt(cplx.abs2_sum(r) / cplx.abs2_sum(rhs)))
    assert rel < 5e-10, rel


@pytest.mark.slow
def test_fused_mega_step_pallas_operator(problem):
    """The one-pass fused step (r-update + Dslash + beta dots in one
    kernel, ops/pallas/gcr_dslash.py) engages for the streaming Pallas
    operator and reproduces the generic trajectory."""
    from mgpgcr_tpu.ops.pallas.dslash import PallasWilsonDirac
    from mgpgcr_tpu.solvers.gcr import _mega_step_config

    a_ref, rhs = problem
    mesh = a_ref.d.mesh
    # rebuild D as the streaming Pallas operator (interpret mode on CPU)
    links = random_links_cf(11, mesh, jnp.float64)
    d = PallasWilsonDirac.build(links, mesh, interpret=True)
    a = DiracOperator(d, cplx.from_scalar(0.12, jnp.float64))
    assert _mega_step_config(a, None) is not None, "mega path did not engage"

    params = GCRParams(tol=1e-9, max_iter=60, restart=5)
    ref = gcr_solve(a_ref, rhs, params)  # generic path, slab operator
    got = gcr_solve(a, rhs, params, fused=True)
    assert int(got.n_iters) == int(ref.n_iters)
    np.testing.assert_allclose(
        cplx.to_numpy(got.x), cplx.to_numpy(ref.x), rtol=1e-8, atol=1e-10
    )
    r = rhs - a_ref.apply(got.x)
    rel = float(jnp.sqrt(cplx.abs2_sum(r) / cplx.abs2_sum(rhs)))
    assert rel < 5e-9, rel


@pytest.mark.slow
def test_mega_step_kernel_matches_composition(problem):
    """gcr_stream_step == update_r + A-apply + beta_dots, directly."""
    from mgpgcr_tpu.ops.pallas import gcr_kernels as gk
    from mgpgcr_tpu.ops.pallas.dslash import PallasWilsonDirac
    from mgpgcr_tpu.ops.pallas.gcr_dslash import gcr_stream_step

    _, rhs = problem
    mesh = LatticeMesh((4, 4, 2, 4, 4, 3))
    links = random_links_cf(11, mesh, jnp.float64)
    d = PallasWilsonDirac.build(links, mesh, interpret=True)
    k = cplx.from_scalar(0.12, jnp.float64)
    a = DiracOperator(d, k)

    S = 4
    key = jax.random.PRNGKey(9)
    aps = cplx.random(key, (S, *d.field_shape), jnp.float64)
    r = cplx.random(jax.random.PRNGKey(10), d.field_shape, jnp.float64)
    alpha = cplx.CF(jnp.asarray(0.3, jnp.float64), jnp.asarray(-0.7, jnp.float64))

    for lim in (1, 2, 4):
        rp, az, r2, raw, aprd = gcr_stream_step(
            d.links, r, aps, alpha, k, lim, mesh
        )
        # reference composition
        ap_slot = cplx.CF(aps.re[lim - 1], aps.im[lim - 1])
        rp_ref = r - alpha * ap_slot
        az_ref = a.apply(rp_ref)
        raw_ref = gk.beta_dots(aps, az_ref, lim=lim)
        np.testing.assert_allclose(
            cplx.to_numpy(rp), cplx.to_numpy(rp_ref), atol=1e-12
        )
        np.testing.assert_allclose(
            cplx.to_numpy(az), cplx.to_numpy(az_ref), atol=1e-11
        )
        np.testing.assert_allclose(
            float(r2), float(cplx.abs2_sum(rp_ref)), rtol=1e-12
        )
        np.testing.assert_allclose(
            cplx.to_numpy(raw), cplx.to_numpy(raw_ref), rtol=1e-10, atol=1e-11
        )
        # the extra dot family: <ap_j, r'> rows and <az, r'> in the tail
        for j in range(lim):
            ref_dot = cplx.vdot(cplx.CF(aps.re[j], aps.im[j]), rp_ref)
            got_dot = complex(float(aprd.re[j]), float(aprd.im[j]))
            np.testing.assert_allclose(
                got_dot,
                complex(float(ref_dot.re), float(ref_dot.im)),
                rtol=1e-10,
                atol=1e-11,
            )
        ref_azr = cplx.vdot(az_ref, rp_ref)
        np.testing.assert_allclose(
            complex(float(aprd.re[S]), float(aprd.im[S])),
            complex(float(ref_azr.re), float(ref_azr.im)),
            rtol=1e-10,
            atol=1e-11,
        )


@pytest.mark.slow
def test_z_step_kernel_matches_composition(problem):
    """gcr_z_step (preconditioned one-pass: Dslash on z + beta dots +
    alpha-numerator dots) == A-apply + beta_dots + explicit vdots."""
    from mgpgcr_tpu.ops.pallas import gcr_kernels as gk
    from mgpgcr_tpu.ops.pallas.dslash import PallasWilsonDirac
    from mgpgcr_tpu.ops.pallas.gcr_dslash import gcr_z_step

    mesh = LatticeMesh((4, 4, 2, 4, 4, 3))
    links = random_links_cf(11, mesh, jnp.float64)
    d = PallasWilsonDirac.build(links, mesh, interpret=True)
    k = cplx.from_scalar(0.12, jnp.float64)
    a = DiracOperator(d, k)

    S = 4
    aps = cplx.random(jax.random.PRNGKey(9), (S, *d.field_shape), jnp.float64)
    r = cplx.random(jax.random.PRNGKey(10), d.field_shape, jnp.float64)
    z = cplx.random(jax.random.PRNGKey(12), d.field_shape, jnp.float64)

    for lim in (1, 2, 4):
        az, raw, aprd = gcr_z_step(d.links, z, r, aps, k, lim, mesh)
        az_ref = a.apply(z)
        raw_ref = gk.beta_dots(aps, az_ref, lim=lim)
        np.testing.assert_allclose(
            cplx.to_numpy(az), cplx.to_numpy(az_ref), atol=1e-11
        )
        np.testing.assert_allclose(
            cplx.to_numpy(raw), cplx.to_numpy(raw_ref), rtol=1e-10, atol=1e-11
        )
        for j in range(lim):
            ref_dot = cplx.vdot(cplx.CF(aps.re[j], aps.im[j]), r)
            np.testing.assert_allclose(
                complex(float(aprd.re[j]), float(aprd.im[j])),
                complex(float(ref_dot.re), float(ref_dot.im)),
                rtol=1e-10,
                atol=1e-11,
            )
        for j in range(lim, S):
            assert float(aprd.re[j]) == 0.0 and float(aprd.im[j]) == 0.0
            assert float(raw.re[j]) == 0.0 and float(raw.im[j]) == 0.0
        ref_azr = cplx.vdot(az_ref, r)
        np.testing.assert_allclose(
            complex(float(aprd.re[S]), float(aprd.im[S])),
            complex(float(ref_azr.re), float(ref_azr.im)),
            rtol=1e-10,
            atol=1e-11,
        )


def test_z_step_anti_t_matches_operator():
    """gcr_z_step with the in-kernel anti-periodic temporal BC matches
    the anti-periodic operator applied by the slab path."""
    from mgpgcr_tpu.ops.pallas.dslash import PallasWilsonDirac
    from mgpgcr_tpu.ops.pallas.gcr_dslash import gcr_z_step

    mesh = LatticeMesh((4, 4, 2, 4, 4, 3))
    links = random_links_cf(3, mesh, jnp.float64)
    d = PallasWilsonDirac.build(links, mesh, interpret=True, antiperiodic_t=True)
    k = cplx.from_scalar(0.1, jnp.float64)
    a = DiracOperator(d, k)
    aps = cplx.random(jax.random.PRNGKey(1), (2, *d.field_shape), jnp.float64)
    r = cplx.random(jax.random.PRNGKey(2), d.field_shape, jnp.float64)
    z = cplx.random(jax.random.PRNGKey(4), d.field_shape, jnp.float64)
    az, _, _ = gcr_z_step(d.links, z, r, aps, k, 2, mesh, anti_t=True)
    np.testing.assert_allclose(
        cplx.to_numpy(az), cplx.to_numpy(a.apply(z)), atol=1e-11
    )


@pytest.mark.parametrize("unroll", ["loop", "cycles"])
@pytest.mark.slow
def test_fused_precond_z_step_trajectory(problem, unroll):
    """Preconditioned fused GCR on the streaming Pallas operator (both
    body forms engage gcr_z_step) reproduces the generic trajectory."""
    from mgpgcr_tpu.ops.pallas.dslash import PallasWilsonDirac
    from mgpgcr_tpu.solvers.gcr import _z_step_config

    a_ref, rhs = problem
    mesh = a_ref.d.mesh
    links = random_links_cf(11, mesh, jnp.float64)
    d = PallasWilsonDirac.build(links, mesh, interpret=True)
    a = DiracOperator(d, cplx.from_scalar(0.12, jnp.float64))
    assert _z_step_config(a) is not None, "z-step path did not engage"

    inner = GCRParams(tol=0.0, max_iter=3, truncation=3)

    def precond_of(op):
        return lambda r: gcr_solve(op, r, inner).x

    params = GCRParams(tol=1e-8, max_iter=50, restart=5, unroll=unroll)
    ref = gcr_solve(a_ref, rhs, params, precond=precond_of(a_ref))
    got = gcr_solve(a, rhs, params, precond=precond_of(a), fused=True)
    assert int(got.n_iters) == int(ref.n_iters)
    h_ref = np.asarray(ref.res_history)
    h_got = np.asarray(got.res_history)
    mask = ~np.isnan(h_ref)
    np.testing.assert_allclose(h_got[mask], h_ref[mask], rtol=1e-8, atol=1e-12)
    np.testing.assert_allclose(
        cplx.to_numpy(got.x), cplx.to_numpy(ref.x), rtol=1e-7, atol=1e-9
    )
