"""Sharded MG setup + distributed MG-GCR (solvers/mg_dist.py) on the faked
8-device CPU mesh.

Parity contract: seeded with the same global b0, ``setup_mg_sharded`` must
build the SAME hierarchy as the single-device ``setup_mg`` (the per-shard
phases are the same algebra, reductions psummed), and the distributed
MG-GCR solve must converge with the per-shard production kernels.

Reference being scaled out: MG::initialise (MG.h:132-285), the coarse
assembly hot loop MG.h:206-278.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.dist

from mgpgcr_tpu import cplx
from mgpgcr_tpu.mesh import LatticeMesh
from mgpgcr_tpu.ops.dirac import DiracOperator
from mgpgcr_tpu.ops.pallas.dslash import PallasWilsonDirac
from mgpgcr_tpu.ops.wilson import random_links
from mgpgcr_tpu.ops.wilson_tpu import TpuWilsonDirac
from mgpgcr_tpu.parallel import make_lattice_device_mesh
from mgpgcr_tpu.solvers.gcr import gcr_solve
from mgpgcr_tpu.solvers.mg import setup_mg
from mgpgcr_tpu.solvers.mg_dist import (
    mg_gcr_solve_sharded,
    setup_mg_sharded,
)
from mgpgcr_tpu.solvers.params import GCRParams, MGParams


K = 0.08


def _mg_params(**overrides):
    base = dict(
        block=2,
        n_nullvecs=2,
        setup_power_iters=2,
        setup_gcr=GCRParams(tol=1e-6, max_iter=4, restart=4),
        coarse_gcr=GCRParams(tol=1e-3, max_iter=20, restart=10),
        smoother_gcr=GCRParams(tol=0.0, max_iter=2, restart=2),
    )
    base.update(overrides)
    return MGParams(**base)


@pytest.fixture(scope="module")
def problem():
    mesh = LatticeMesh((8, 4, 2, 2, 4, 3))
    links = cplx.ascf(random_links(jax.random.PRNGKey(7), mesh), jnp.float64)
    k = cplx.from_scalar(K, jnp.float64)
    a_single = DiracOperator(
        PallasWilsonDirac.build(links, mesh, interpret=True), k
    )
    t, z, y, xx = mesh.spacetime_dims
    b0 = cplx.random(jax.random.PRNGKey(3), (4, 3, t, z, y * xx), jnp.float64)
    rhs = cplx.random(jax.random.PRNGKey(9), (4, 3, t, z, y * xx), jnp.float64)
    return mesh, links, k, a_single, b0, rhs


def _sharded_op(links, mesh, k, axes, sizes):
    dmesh = make_lattice_device_mesh(
        int(np.prod(sizes)), axis_names=axes, axis_sizes=sizes
    )
    kw = dict(axis_t="t" if "t" in axes else None,
              axis_z="z" if "z" in axes else None)
    d = PallasWilsonDirac.build_sharded(
        links, mesh, dmesh, interpret=True, **kw
    )
    return DiracOperator(d, k)


@pytest.mark.parametrize(
    "axes,sizes", [(("t", "z"), (4, 2)), (("t",), (4,)), (("z",), (2,))]
)
def test_sharded_setup_matches_single_device(problem, axes, sizes):
    """Same b0 seed => same near-null space => same Galerkin coarse blocks
    (up to psum reduction-order rounding at f64)."""
    mesh, links, k, a_single, b0, _ = problem
    params = _mg_params()

    mgp_ref = setup_mg(
        jax.random.PRNGKey(3), a_single, mesh, params, layout="tpu"
    )
    a = _sharded_op(links, mesh, k, axes, sizes)
    mgp = setup_mg_sharded(jax.random.PRNGKey(3), a, params, b0=b0)

    # coarse operators agree (the basis itself is only defined up to
    # per-block unitary mixing, but with identical inputs + algebra the
    # whole hierarchy must match numerically)
    np.testing.assert_allclose(
        cplx.to_numpy(mgp.coarse.a),
        cplx.to_numpy(mgp_ref.coarse.a),
        atol=1e-8,
    )
    # the sharded-setup b0 default path must equal setup_mg's b0 (same key)
    # so the no-b0 call is reproducible too
    mgp2 = setup_mg_sharded(jax.random.PRNGKey(3), a, params)
    np.testing.assert_allclose(
        cplx.to_numpy(mgp2.coarse.a), cplx.to_numpy(mgp.coarse.a), atol=0
    )


def test_sharded_precond_apply_matches_single_device(problem):
    """One V-cycle application: sharded == single-device on the same
    residual field (same hierarchy by seeding)."""
    mesh, links, k, a_single, b0, rhs = problem
    params = _mg_params()
    mgp_ref = setup_mg(
        jax.random.PRNGKey(3), a_single, mesh, params, layout="tpu"
    )
    a = _sharded_op(links, mesh, k, ("t", "z"), (4, 2))
    mgp = setup_mg_sharded(jax.random.PRNGKey(3), a, params, b0=b0)

    got = jax.jit(mgp.apply)(a.d.shard_field(rhs))
    ref = jax.jit(mgp_ref.apply)(rhs)
    np.testing.assert_allclose(
        cplx.to_numpy(got), cplx.to_numpy(ref), atol=1e-8
    )


@pytest.mark.parametrize("smoother", [True, False])
def test_distributed_mg_gcr_solve(problem, smoother):
    """Full distributed MG-GCR through mg_gcr_solve_sharded: converges and
    the solution satisfies the SINGLE-DEVICE operator independently.
    smoother=False exercises the reference's config-of-record cycle
    (additive coarse deflation, main.cpp:840-858)."""
    mesh, links, k, a_single, b0, rhs = problem
    params = _mg_params(
        smoother_gcr=GCRParams(tol=0.0, max_iter=2, restart=2)
        if smoother
        else None
    )
    a = _sharded_op(links, mesh, k, ("t", "z"), (4, 2))
    mgp = setup_mg_sharded(jax.random.PRNGKey(3), a, params, b0=b0)

    gp = GCRParams(tol=1e-8, max_iter=80, restart=5)
    res = jax.jit(
        lambda r: mg_gcr_solve_sharded(r, gp, mgp)
    )(a.d.shard_field(rhs))
    assert bool(res.converged)

    r = rhs - a_single.apply(res.x)
    rel = float(jnp.sqrt(cplx.abs2_sum(r) / cplx.abs2_sum(rhs)))
    assert rel < 1e-7

    # parity: the single-device MG-GCR with the same (seeded-identical)
    # hierarchy takes the same number of iterations (±1 for psum
    # reduction-order rounding near the tolerance)
    mgp_ref = setup_mg(
        jax.random.PRNGKey(3), a_single, mesh, params, layout="tpu"
    )
    ref = gcr_solve(a_single, rhs, gp, precond=mgp_ref.apply)
    assert abs(int(res.n_iters) - int(ref.n_iters)) <= 1
    if smoother:
        # with smoothing, MG genuinely beats plain GCR on this problem
        plain = gcr_solve(
            a_single, rhs, GCRParams(tol=1e-8, max_iter=200, restart=5)
        )
        assert int(res.n_iters) < int(plain.n_iters)


def test_sharded_setup_rejects_straddling_blocks(problem):
    mesh, links, k, _, _, _ = problem
    a = _sharded_op(links, mesh, k, ("t",), (4,))
    with pytest.raises(ValueError, match="divide the PER-SHARD lattice"):
        setup_mg_sharded(jax.random.PRNGKey(0), a, _mg_params(block=4))


def test_distributed_mg_gcr_bsr_coarse(problem):
    """coarse_format='bsr' (block-ELL CF path — the round-2 crash) through
    the sharded setup + distributed solve."""
    mesh, links, k, a_single, b0, rhs = problem
    params = _mg_params(coarse_format="bsr")
    a = _sharded_op(links, mesh, k, ("t", "z"), (4, 2))
    mgp = setup_mg_sharded(jax.random.PRNGKey(3), a, params, b0=b0)

    gp = GCRParams(tol=1e-8, max_iter=80, restart=5)
    res = jax.jit(lambda r: mg_gcr_solve_sharded(r, gp, mgp))(
        a.d.shard_field(rhs)
    )
    assert bool(res.converged)
    r = rhs - a_single.apply(res.x)
    rel = float(jnp.sqrt(cplx.abs2_sum(r) / cplx.abs2_sum(rhs)))
    assert rel < 1e-7


@pytest.mark.parametrize("axes,sizes", [(("t",), (2,))])
def test_shard_local_coarse_stencil_interior_planes(problem, axes, sizes):
    """Operator parity with MULTI-plane local block grids (bpd_loc t = 2):
    the local roll + boundary-ghost replacement path, not just the
    single-plane whole-ghost case the 4x2 mesh exercises."""
    from jax.sharding import PartitionSpec as P

    from mgpgcr_tpu.solvers.mg_dist import ShardLocalCoarseStencil

    mesh, links, k, a_single, b0, rhs = problem
    a = _sharded_op(links, mesh, k, axes, sizes)
    mgp = setup_mg_sharded(
        jax.random.PRNGKey(3), a, _mg_params(coarse_format="stencil"), b0=b0
    )
    mgp_dense = setup_mg_sharded(
        jax.random.PRNGKey(3), a, _mg_params(coarse_format="dense"), b0=b0
    )
    g = mgp.geom
    assert g.bpd_loc[0] > 1  # interior + boundary planes both present
    ne = mgp.coarse.ne
    xc = cplx.random(jax.random.PRNGKey(5), (g.nb * ne,), jnp.float64)
    ref_y = mgp_dense.coarse.apply(xc)
    xg = xc.reshape(g.bpd[0], g.bpd[1], g.byx, ne)

    def local(blocks_loc, x_loc):
        op = ShardLocalCoarseStencil(blocks_loc, g)
        return op.apply(x_loc.reshape(-1)).reshape(x_loc.shape)

    fn = jax.shard_map(
        local,
        mesh=a.d.device_mesh,
        in_specs=(P("t"), P("t")),
        out_specs=P("t"),
        check_vma=False,
    )
    got_y = fn(mgp.coarse.blocks, xg).reshape(g.nb * ne)
    np.testing.assert_allclose(
        cplx.to_numpy(got_y), cplx.to_numpy(ref_y), atol=1e-10
    )


def test_distributed_mg_gcr_sharded_stencil_coarse(problem):
    """coarse_format='stencil' in the sharded setup keeps the coarse level
    DISTRIBUTED (ShardLocalCoarseStencil): no per-V-cycle all_gather, the
    coarse GCR runs on local block rows with psummed dots and ppermute
    stencil halos. Checks (a) the sharded coarse apply equals the
    replicated dense assembly of the seed-identical hierarchy, (b) the
    full distributed solve converges with the same iteration count."""
    from jax.sharding import PartitionSpec as P

    from mgpgcr_tpu.solvers.mg_dist import ShardLocalCoarseStencil

    mesh, links, k, a_single, b0, rhs = problem
    a = _sharded_op(links, mesh, k, ("t", "z"), (4, 2))
    mgp = setup_mg_sharded(
        jax.random.PRNGKey(3), a, _mg_params(coarse_format="stencil"), b0=b0
    )
    assert isinstance(mgp.coarse, ShardLocalCoarseStencil)
    mgp_dense = setup_mg_sharded(
        jax.random.PRNGKey(3), a, _mg_params(coarse_format="dense"), b0=b0
    )

    # (a) operator parity on a random coarse vector
    g = mgp.geom
    ne = mgp.coarse.ne
    xc = cplx.random(jax.random.PRNGKey(5), (g.nb * ne,), jnp.float64)
    ref_y = mgp_dense.coarse.apply(xc)
    xg = xc.reshape(g.bpd[0], g.bpd[1], g.byx, ne)

    def local(blocks_loc, x_loc):
        op = ShardLocalCoarseStencil(blocks_loc, g)
        return op.apply(x_loc.reshape(-1)).reshape(x_loc.shape)

    fn = jax.shard_map(
        local,
        mesh=a.d.device_mesh,
        in_specs=(P("t", "z"), P("t", "z")),
        out_specs=P("t", "z"),
        check_vma=False,
    )
    got_y = fn(mgp.coarse.blocks, xg).reshape(g.nb * ne)
    np.testing.assert_allclose(
        cplx.to_numpy(got_y), cplx.to_numpy(ref_y), atol=1e-10
    )

    # (b) end-to-end distributed solve
    gp = GCRParams(tol=1e-8, max_iter=80, restart=5)
    res = jax.jit(lambda r: mg_gcr_solve_sharded(r, gp, mgp))(
        a.d.shard_field(rhs)
    )
    assert bool(res.converged)
    r = rhs - a_single.apply(res.x)
    rel = float(jnp.sqrt(cplx.abs2_sum(r) / cplx.abs2_sum(rhs)))
    assert rel < 1e-7
    res_dense = jax.jit(lambda r: mg_gcr_solve_sharded(r, gp, mgp_dense))(
        a.d.shard_field(rhs)
    )
    assert abs(int(res.n_iters) - int(res_dense.n_iters)) <= 1


@pytest.mark.parametrize("coarse_format", ["dense", "stencil"])
def test_sharded_checkpoint_roundtrip(tmp_path, problem, coarse_format):
    """save_mg_setup_sharded / load_mg_setup_sharded: the restored
    hierarchy (sharded q5 + shard-local stencil rows OR replicated
    coarse) applies IDENTICALLY to the original — V-cycle output parity
    on the faked mesh, and the distributed solve still converges."""
    from mgpgcr_tpu.io.checkpoint import (
        load_mg_setup_sharded,
        save_mg_setup_sharded,
    )

    mesh, links, k, a_single, b0, rhs = problem
    params = _mg_params(coarse_format=coarse_format)
    a = _sharded_op(links, mesh, k, ("t", "z"), (4, 2))
    mgp = setup_mg_sharded(jax.random.PRNGKey(3), a, params, b0=b0)
    path = tmp_path / f"mg_sharded_{coarse_format}.npz"
    save_mg_setup_sharded(path, mgp)
    got = load_mg_setup_sharded(path, a)

    # identical V-cycle application (bit-equal arrays round-trip; the
    # apply runs the same program on the same shardings)
    r_sh = a.d.shard_field(rhs)
    out_ref = jax.jit(mgp.apply)(r_sh)
    out_got = jax.jit(got.apply)(r_sh)
    np.testing.assert_allclose(
        cplx.to_numpy(out_got), cplx.to_numpy(out_ref), atol=1e-12
    )

    gp = GCRParams(tol=1e-8, max_iter=60, restart=6)
    res = jax.jit(lambda r: mg_gcr_solve_sharded(r, gp, mgp))(r_sh)
    res2 = jax.jit(lambda r: mg_gcr_solve_sharded(r, gp, got))(r_sh)
    assert bool(res2.converged)
    assert int(res2.n_iters) == int(res.n_iters)


def test_three_level_sharded_stencil_coarse(tmp_path):
    """n_level = 3 with the SHARDED stencil coarse (r4 limitation lifted):
    level 2 stays shard-local (no fine-level all_gather), levels >= 3 are
    replicated and reached through a coarse-DOF gather/slice per
    preconditioner application. The distributed solve must converge, the
    solution must satisfy the single-device operator, and the checkpoint
    must round-trip the deeper hierarchy."""
    mesh = LatticeMesh((8, 8, 4, 4, 4, 3))
    links = cplx.ascf(random_links(jax.random.PRNGKey(7), mesh), jnp.float64)
    k = cplx.from_scalar(K, jnp.float64)
    t, z, y, xx = mesh.spacetime_dims
    rhs = cplx.random(jax.random.PRNGKey(9), (4, 3, t, z, y * xx), jnp.float64)
    params = _mg_params(
        coarse_format="stencil", n_level=3,
        coarse_gcr=GCRParams(tol=1e-3, max_iter=12, restart=6),
    )
    a = _sharded_op(links, mesh, k, ("t", "z"), (4, 2))
    mgp = setup_mg_sharded(jax.random.PRNGKey(3), a, params)
    assert mgp.coarse_precond is not None, "deeper level was not built"

    r_sh = a.d.shard_field(rhs)
    gp = GCRParams(tol=1e-8, max_iter=80, restart=6)
    res = jax.jit(lambda r: mg_gcr_solve_sharded(r, gp, mgp))(r_sh)
    assert bool(res.converged), float(res.final_relres)

    # independent residual against the SINGLE-DEVICE operator
    a1 = DiracOperator(
        PallasWilsonDirac.build(links, mesh, interpret=True), k
    )
    r = rhs - a1.apply(res.x)
    rel = float(jnp.sqrt(cplx.abs2_sum(r) / cplx.abs2_sum(rhs)))
    assert rel < 1e-7, rel

    # checkpoint round-trip including the deeper replicated level
    from mgpgcr_tpu.io.checkpoint import (
        load_mg_setup_sharded,
        save_mg_setup_sharded,
    )

    path = tmp_path / "mg3_sharded.npz"
    save_mg_setup_sharded(path, mgp)
    got = load_mg_setup_sharded(path, a)
    assert got.coarse_precond is not None
    out_ref = jax.jit(mgp.apply)(r_sh)
    out_got = jax.jit(got.apply)(r_sh)
    np.testing.assert_allclose(
        cplx.to_numpy(out_got), cplx.to_numpy(out_ref), atol=1e-12
    )
