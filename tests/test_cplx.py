"""Split re/im (cplx.CF) representation: algebra + operator/solver parity.

The TPU path carries all complex data as CF pairs (TPU backends have no
complex transfers/registers); these tests pin the contract that CF results
are bit-for-bit-tolerance identical to the native complex128 path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mgpgcr_tpu import cplx, fields
from mgpgcr_tpu.mesh import LatticeMesh
from mgpgcr_tpu.ops.dirac import DiracOperator
from mgpgcr_tpu.ops.wilson import WilsonDiracOperator, random_links
from mgpgcr_tpu.ops.wilson_tpu import (
    TpuWilsonDirac,
    field_from_tpu,
    field_to_tpu,
)
from mgpgcr_tpu.solvers.gcr import gcr_solve
from mgpgcr_tpu.solvers.params import GCRParams


@pytest.fixture(scope="module")
def zw(rng_mod):
    z = rng_mod.uniform(-1, 1, (6, 7)) + 1j * rng_mod.uniform(-1, 1, (6, 7))
    w = rng_mod.uniform(-1, 1, (6, 7)) + 1j * rng_mod.uniform(-1, 1, (6, 7))
    return z, w


@pytest.fixture(scope="module")
def rng_mod():
    return np.random.default_rng(42)


def _cf(z):
    return cplx.from_numpy(z, jnp.float64)


def test_cf_elementwise(zw):
    z, w = zw
    a, b = _cf(z), _cf(w)
    np.testing.assert_allclose(cplx.to_numpy(a + b), z + w, atol=1e-15)
    np.testing.assert_allclose(cplx.to_numpy(a - b), z - w, atol=1e-15)
    np.testing.assert_allclose(cplx.to_numpy(a * b), z * w, atol=1e-15)
    np.testing.assert_allclose(cplx.to_numpy(a / b), z / w, atol=1e-13)
    np.testing.assert_allclose(cplx.to_numpy(-a), -z, atol=1e-15)
    np.testing.assert_allclose(cplx.to_numpy(a.conj()), z.conj(), atol=1e-15)
    np.testing.assert_allclose(cplx.to_numpy((1 + 2j) * a), (1 + 2j) * z, atol=1e-15)
    np.testing.assert_allclose(cplx.to_numpy(a * 2.5), z * 2.5, atol=1e-15)


def test_cf_reductions(zw):
    z, w = zw
    a, b = _cf(z), _cf(w)
    np.testing.assert_allclose(float(cplx.abs2_sum(a)), np.sum(np.abs(z) ** 2))
    np.testing.assert_allclose(
        complex(*map(float, (cplx.vdot(a, b).re, cplx.vdot(a, b).im))),
        np.vdot(z, w),
        atol=1e-13,
    )


def test_cf_einsum2_matches_complex(zw):
    z, w = zw
    got = cplx.to_numpy(cplx.einsum2("ij,jk->ik", _cf(z), _cf(w[:7].T[:7, :6])))
    want = np.einsum("ij,jk->ik", z, w.T[:7, :6])
    np.testing.assert_allclose(got, want, atol=1e-13)


def test_cf_stack_helpers(zw):
    z, _ = zw
    a = _cf(z)
    buf = cplx.stack_zeros(3, a).at[1].set(a)
    np.testing.assert_allclose(cplx.to_numpy(buf[1]), z, atol=1e-15)
    np.testing.assert_allclose(cplx.to_numpy(buf[0]), np.zeros_like(z))
    coeffs = _cf(np.array([0.5 + 1j, 2.0, -1j]))
    got = cplx.to_numpy(cplx.weighted_stack_sum(coeffs, buf))
    np.testing.assert_allclose(got, (2.0) * z, atol=1e-14)
    raw = cplx.conj_contract_stack(buf, a)
    want = np.array([0, np.vdot(z, z), 0])
    np.testing.assert_allclose(cplx.to_numpy(raw), want, atol=1e-12)


@pytest.fixture(scope="module")
def wilson_problem():
    mesh = LatticeMesh((4, 6, 2, 8, 4, 3))  # asymmetric: catches axis mixups
    links = random_links(jax.random.PRNGKey(0), mesh)
    psi = fields.random_field(jax.random.PRNGKey(1), mesh)
    return mesh, links, psi


def test_wilson_cf_matches_complex(wilson_problem):
    mesh, links, psi = wilson_problem
    ref = WilsonDiracOperator(links, mesh).apply(psi)
    op_cf = WilsonDiracOperator(cplx.ascf(links), mesh)
    got = cplx.to_numpy(op_cf.apply(cplx.ascf(psi)))
    np.testing.assert_allclose(got, np.asarray(ref), atol=1e-13)


def test_tpu_layout_roundtrip(wilson_problem):
    mesh, _, psi = wilson_problem
    rt = field_from_tpu(field_to_tpu(psi, mesh), mesh)
    np.testing.assert_array_equal(np.asarray(rt), np.asarray(psi))


def test_tpu_layout_wilson_matches_canonical(wilson_problem):
    """TpuWilsonDirac (spin/colour-first, merged Y*X, unrolled slab
    contractions) computes exactly the canonical stencil."""
    mesh, links, psi = wilson_problem
    ref = WilsonDiracOperator(links, mesh).apply(psi)

    op = TpuWilsonDirac.build(links, mesh)
    got = field_from_tpu(op.apply(field_to_tpu(psi, mesh)), mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-13)

    op_cf = TpuWilsonDirac.build(cplx.ascf(links), mesh)
    out_cf = op_cf.apply(field_to_tpu(cplx.ascf(psi), mesh))
    got_cf = cplx.to_numpy(field_from_tpu(out_cf, mesh))
    np.testing.assert_allclose(got_cf, np.asarray(ref), atol=1e-13)


def test_gcr_cf_trajectory_matches_complex(wilson_problem):
    """Same operator, same rhs: CF and complex solves must take the same
    iteration path (cross-representation determinism)."""
    mesh, links, psi = wilson_problem
    params = GCRParams(tol=1e-10, max_iter=300, restart=10)
    a = DiracOperator(WilsonDiracOperator(links, mesh), jnp.asarray(0.08 + 0j))
    res = gcr_solve(a, psi, params)

    a_cf = DiracOperator(
        WilsonDiracOperator(cplx.ascf(links), mesh), cplx.from_scalar(0.08, jnp.float64)
    )
    res_cf = gcr_solve(a_cf, cplx.ascf(psi), params)

    assert bool(res.converged) and bool(res_cf.converged)
    assert int(res.n_iters) == int(res_cf.n_iters)
    np.testing.assert_allclose(
        cplx.to_numpy(res_cf.x), np.asarray(res.x), atol=1e-9
    )
    h1 = np.asarray(res.res_history)
    h2 = np.asarray(res_cf.res_history)
    mask = ~np.isnan(h1)
    np.testing.assert_allclose(h2[mask], h1[mask], rtol=1e-6)
