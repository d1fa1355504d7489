"""Even-odd (red-black) decomposition: parity blocks vs the full stencil,
Schur-complement solve exactness, and iteration-count behaviour.

The reference has no even-odd path (it always solves the full system,
GCR.h:159-302); these tests pin the beyond-parity capability to the same
operator semantics: D restricted to parity blocks must match the full
``TpuWilsonDirac`` hopping matrix, and the reconstructed Schur solution
must solve the original A x = b."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mgpgcr_tpu import cplx, fields
from mgpgcr_tpu.mesh import LatticeMesh
from mgpgcr_tpu.ops.dirac import DiracOperator
from mgpgcr_tpu.ops.eo import (
    EvenOddWilson,
    field_from_eo,
    field_to_eo,
    make_schur,
)
from mgpgcr_tpu.ops.wilson import random_links
from mgpgcr_tpu.ops.wilson_tpu import TpuWilsonDirac, field_to_tpu, links_to_tpu
from mgpgcr_tpu.solvers.eo import eo_solve
from mgpgcr_tpu.solvers.gcr import gcr_solve
from mgpgcr_tpu.solvers.params import GCRParams

DIMS = (4, 4, 2, 8, 4, 3)


def _problem(dims=DIMS, seed=0):
    mesh = LatticeMesh(dims)
    links = random_links(jax.random.PRNGKey(seed), mesh)
    links_t = links_to_tpu(cplx.ascf(links, jnp.float64), mesh)
    psi = field_to_tpu(
        cplx.ascf(fields.random_field(jax.random.PRNGKey(seed + 1), mesh), jnp.float64),
        mesh,
    )
    full = TpuWilsonDirac(links_t, mesh)
    eo = EvenOddWilson.from_full(links_t, mesh)
    return mesh, full, eo, psi


def _parity_mask(mesh):
    """(T, Z, Y*X) bool: True on odd-parity sites."""
    t, z, y, xx = mesh.spacetime_dims
    tt, zz, yy, xv = np.meshgrid(
        np.arange(t), np.arange(z), np.arange(y), np.arange(xx), indexing="ij"
    )
    m = (tt + zz + yy + xv) % 2 == 1
    return jnp.asarray(m.reshape(t, z, y * xx))


def test_split_roundtrip():
    mesh, _, _, psi = _problem()
    e, o = field_to_eo(psi, mesh)
    back = field_from_eo(e, o, mesh)
    np.testing.assert_array_equal(cplx.to_numpy(back), cplx.to_numpy(psi))


def test_split_selects_parities():
    """Even field holds exactly the even-parity sites."""
    mesh, _, _, psi = _problem()
    odd_mask = _parity_mask(mesh)
    only_even = cplx.where(odd_mask, cplx.zeros_like(psi), psi)
    e, o = field_to_eo(only_even, mesh)
    assert float(jnp.max(jnp.abs(o.re))) == 0.0
    assert float(jnp.max(jnp.abs(o.im))) == 0.0
    assert float(jnp.max(jnp.abs(e.re))) > 0.0


@pytest.mark.parametrize("parity_out", [0, 1])
def test_parity_blocks_match_full_stencil(parity_out):
    """D_eo / D_oe equal the full hopping matrix restricted by parity."""
    mesh, full, eo, psi = _problem()
    odd_mask = _parity_mask(mesh)
    # zero out the non-input parity, apply full D, read the output parity
    if parity_out == 0:  # input odd
        masked = cplx.where(odd_mask, psi, cplx.zeros_like(psi))
    else:
        masked = cplx.where(odd_mask, cplx.zeros_like(psi), psi)
    ref_e, ref_o = field_to_eo(full.apply(masked), mesh)
    in_e, in_o = field_to_eo(psi, mesh)
    if parity_out == 0:
        got, ref = eo.apply_eo(in_o), ref_e
    else:
        got, ref = eo.apply_oe(in_e), ref_o
    np.testing.assert_allclose(
        cplx.to_numpy(got), cplx.to_numpy(ref), atol=1e-13
    )


def test_schur_solve_solves_full_system():
    """eo_solve's reconstructed x satisfies (I - kD) x = b to tolerance."""
    mesh, full, eo, _ = _problem()
    k = 0.12
    b = field_to_tpu(
        cplx.ascf(fields.random_field(jax.random.PRNGKey(7), mesh), jnp.float64),
        mesh,
    )
    params = GCRParams(tol=1e-12, max_iter=400, restart=10)
    res = eo_solve(eo, k, b, params)
    assert bool(res.converged)
    a = DiracOperator(full, cplx.from_scalar(k, jnp.float64))
    r = b - a.apply(res.x)
    relres = float(
        jnp.sqrt(cplx.abs2_sum(r) / cplx.abs2_sum(b))
    )
    assert relres < 1e-10


def test_schur_iterations_beat_full_solve():
    """The Schur system (squared spectrum) converges in fewer iterations
    than the full system at the same k and tolerance."""
    mesh, full, eo, _ = _problem()
    k = 0.14
    b = field_to_tpu(
        cplx.ascf(fields.random_field(jax.random.PRNGKey(9), mesh), jnp.float64),
        mesh,
    )
    params = GCRParams(tol=1e-10, max_iter=600, restart=10)
    res_full = gcr_solve(
        DiracOperator(full, cplx.from_scalar(k, jnp.float64)), b, params
    )
    res_eo = eo_solve(eo, k, b, params)
    assert bool(res_full.converged) and bool(res_eo.converged)
    assert int(res_eo.n_iters) < int(res_full.n_iters)


def test_schur_operator_shape():
    mesh, _, eo, _ = _problem()
    s = make_schur(eo, 0.1, jnp.float64)
    assert s.shape == (mesh.size // 2, mesh.size // 2)


@pytest.mark.slow
def test_eo_mg_preconditioner_converges_faster():
    """MG built over the Schur operator (setup_eo_mg: half mesh, exact
    column-sweep Galerkin — S hops two sites so its coarse coupling is
    3^4-point) cuts Schur-GCR iterations at near-critical k."""
    from mgpgcr_tpu.solvers.eo import eo_half_mesh, setup_eo_mg
    from mgpgcr_tpu.solvers.params import MGParams

    mesh, full, eo, _ = _problem()
    k = 0.19
    b = field_to_tpu(
        cplx.ascf(fields.random_field(jax.random.PRNGKey(3), mesh), jnp.float64),
        mesh,
    )
    mh = eo_half_mesh(mesh)
    assert mh.spacetime_dims == (4, 4, 2, 4)

    s, mgp = setup_eo_mg(
        jax.random.PRNGKey(11),
        eo,
        k,
        MGParams(block=2, n_nullvecs=4),
    )
    params = GCRParams(tol=1e-9, max_iter=600, restart=10)
    res_plain = eo_solve(eo, k, b, params)
    res_mg = eo_solve(eo, k, b, params, precond=mgp.apply)
    assert bool(res_plain.converged) and bool(res_mg.converged)
    assert int(res_mg.n_iters) < int(res_plain.n_iters) // 2, (
        int(res_mg.n_iters),
        int(res_plain.n_iters),
    )
    # the reconstructed full-system solution must solve A x = b
    a = DiracOperator(full, cplx.from_scalar(k, jnp.float64))
    r = b - a.apply(res_mg.x)
    rel = float(jnp.sqrt(cplx.abs2_sum(r) / cplx.abs2_sum(b)))
    assert rel < 1e-8, rel


@pytest.mark.slow
def test_eo_sharded_gspmd_matches_single_device():
    """GSPMD-partitioned Schur solve (links + fields under a T/Z
    NamedSharding; XLA inserts the halo collectives) reproduces the
    single-device trajectory on the 8-virtual-device mesh."""
    from jax.sharding import Mesh as DeviceMesh

    from mgpgcr_tpu.solvers.eo import eo_field_sharding, eo_sharded

    mesh, full, eo, _ = _problem(dims=(8, 4, 2, 8, 4, 3))
    k = 0.12
    b = field_to_tpu(
        cplx.ascf(fields.random_field(jax.random.PRNGKey(5), mesh), jnp.float64),
        mesh,
    )
    params = GCRParams(tol=1e-10, max_iter=200, restart=5)
    ref = eo_solve(eo, k, b, params)

    devs = np.array(jax.devices()[:8]).reshape(4, 2)
    dmesh = DeviceMesh(devs, ("t", "z"))
    eo_sh = eo_sharded(eo, dmesh)
    sh = eo_field_sharding(dmesh)
    b_sh = cplx.CF(jax.device_put(b.re, sh), jax.device_put(b.im, sh))

    solve = jax.jit(lambda e, kk, bb: eo_solve(e, kk, bb, params))
    got = solve(eo_sh, cplx.from_scalar(k, jnp.float64), b_sh)
    assert int(got.n_iters) == int(ref.n_iters)
    np.testing.assert_allclose(
        cplx.to_numpy(got.x), cplx.to_numpy(ref.x), rtol=1e-8, atol=1e-10
    )


@pytest.mark.slow
def test_from_dirac_antiperiodic_solves_requested_system():
    """from_dirac on a streaming Pallas operator with the in-kernel
    anti-periodic BC (anti_t=True, pristine stored links) must fold the
    boundary sign into the Schur split: the reconstructed x has to solve
    the ANTI-PERIODIC full system, not the periodic one (advisor r4 high
    finding: relres was ~0.27 against the requested operator)."""
    from mgpgcr_tpu.ops.pallas.dslash import PallasWilsonDirac

    dims = (4, 8, 2, 8, 4, 3)
    mesh = LatticeMesh(dims)
    links = cplx.ascf(random_links(jax.random.PRNGKey(3), mesh), jnp.float32)
    d = PallasWilsonDirac.build(
        links, mesh, interpret=True, antiperiodic_t=True
    )
    assert d.anti_t, "test needs the in-kernel BC configuration"
    eo = EvenOddWilson.from_dirac(d)
    k = 0.10
    kcf = cplx.from_scalar(k, jnp.float32)
    b = cplx.random(jax.random.PRNGKey(11), d.field_shape, jnp.float32)
    params = GCRParams(tol=1e-6, max_iter=300, restart=10)
    res = eo_solve(eo, kcf, b, params, mesh=mesh)
    assert bool(res.converged)
    a = DiracOperator(d, kcf)  # the anti-periodic operator as requested
    r = b - a.apply(res.x)
    relres = float(jnp.sqrt(cplx.abs2_sum(r) / cplx.abs2_sum(b)))
    assert relres < 1e-5


def test_from_dirac_rejects_two_row_links():
    from mgpgcr_tpu.ops.pallas.dslash import PallasWilsonDirac

    dims = (4, 8, 2, 8, 4, 3)
    mesh = LatticeMesh(dims)
    links = cplx.ascf(random_links(jax.random.PRNGKey(3), mesh), jnp.float32)
    d = PallasWilsonDirac.build(links, mesh, interpret=True, compress=True)
    with pytest.raises(ValueError, match="3-row"):
        EvenOddWilson.from_dirac(d)
