"""Multi-device tests on a faked 8-device CPU mesh (conftest sets
``--xla_force_host_platform_device_count=8``).

The reference has nothing distributed to test (single process, SURVEY.md §5);
these tests define the correctness contract of our scale-out layer: the
domain-decomposed stencil and solver must produce *the same numbers* as the
single-device path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.dist

from mgpgcr_tpu import fields
from mgpgcr_tpu.mesh import LatticeMesh
from mgpgcr_tpu.ops.dirac import DiracOperator
from mgpgcr_tpu.ops.wilson import WilsonDiracOperator, random_links
from mgpgcr_tpu.parallel import (
    ShardedWilsonDirac,
    balanced_factors,
    make_lattice_device_mesh,
    periodic_shift,
    shard_field,
)
from mgpgcr_tpu.solvers.gcr import gcr_solve
from mgpgcr_tpu.solvers.params import GCRParams


def test_balanced_factors():
    assert balanced_factors(8, 3) == (2, 2, 2)
    assert balanced_factors(8, 2) == (4, 2)
    assert balanced_factors(12, 2) == (4, 3)
    assert balanced_factors(1, 2) == (1, 1)
    assert balanced_factors(7, 2) == (7, 1)


def test_periodic_shift_matches_roll_unsharded():
    x = jnp.arange(24.0).reshape(2, 3, 4)
    for axis in range(3):
        for s in (-1, 1):
            np.testing.assert_array_equal(
                periodic_shift(x, axis, s), jnp.roll(x, s, axis)
            )


@pytest.fixture(scope="module")
def small_problem():
    mesh = LatticeMesh((4, 4, 2, 2, 4, 3))
    key = jax.random.PRNGKey(7)
    links = random_links(key, mesh)
    psi = fields.random_field(jax.random.PRNGKey(8), mesh).reshape(mesh.dims)
    return mesh, links, psi


def test_sharded_stencil_matches_single_device(small_problem):
    mesh, links, psi = small_problem
    ref = mesh.to_lattice(WilsonDiracOperator(links, mesh).apply(mesh.to_flat(psi)))

    dmesh = make_lattice_device_mesh(8, axis_names=("t", "z"))  # 4 x 2
    op = ShardedWilsonDirac.build(links, mesh, dmesh)
    got = op.apply(shard_field(psi, dmesh, mesh))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-12)


def test_sharded_stencil_batched(small_problem):
    mesh, links, psi = small_problem
    batch = jnp.stack([psi, 2.0 * psi, psi.conj(), -psi])
    single = WilsonDiracOperator(links, mesh)
    ref = jax.vmap(lambda v: single.apply(mesh.to_flat(v)))(batch)
    ref = ref.reshape(batch.shape)

    dmesh = make_lattice_device_mesh(8, axis_names=("dp", "t", "z"))  # 2x2x2
    op = ShardedWilsonDirac.build(links, mesh, dmesh, batch_axis="dp")
    got = op.apply(shard_field(batch, dmesh, mesh, batch_axis="dp"))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-12)


def test_distributed_gcr_matches_single_device(small_problem):
    """Full domain-decomposed solve: same operator, same rhs, sharded vs not.

    The solver code is identical — only the shardings differ — so the
    trajectories must agree to reduction-order rounding (SURVEY.md §7)."""
    mesh, links, psi = small_problem
    k = 0.05
    rhs = psi
    params = GCRParams(tol=1e-10, max_iter=200, restart=10)

    a_single = DiracOperator(
        _LatticeWilson(links, mesh), jnp.asarray(k, jnp.complex128)
    )
    res_ref = gcr_solve(a_single, rhs, params)

    dmesh = make_lattice_device_mesh(8, axis_names=("t", "z"))
    d_sharded = ShardedWilsonDirac.build(links, mesh, dmesh)
    a_sharded = DiracOperator(d_sharded, jnp.asarray(k, jnp.complex128))
    res = gcr_solve(a_sharded, shard_field(rhs, dmesh, mesh), params)

    assert bool(res.converged)
    assert int(res.n_iters) == int(res_ref.n_iters)
    np.testing.assert_allclose(
        np.asarray(res.x), np.asarray(res_ref.x), atol=1e-8
    )
    # independent residual check
    r = rhs - a_single.apply(res.x)
    rel = float(fields.norm(r) / fields.norm(rhs))
    assert rel < 1e-9


class _LatticeWilson:
    """Single-device Wilson stencil viewed on lattice-shaped fields, so the
    reference solve runs on the same field layout as the sharded one."""

    def __init__(self, links, mesh):
        self._op = WilsonDiracOperator(links, mesh)
        self._mesh = mesh

    def apply(self, x):
        return self._mesh.to_lattice(self._op.apply(self._mesh.to_flat(x)))


def test_sharded_tpu_layout_stencil_matches(small_problem):
    """Domain-decomposed TPU-layout stencil == single-device, CF rep."""
    from mgpgcr_tpu import cplx
    from mgpgcr_tpu.ops.wilson_tpu import TpuWilsonDirac, field_to_tpu

    mesh, links, psi = small_problem
    links_cf = cplx.ascf(links, jnp.float64)
    psi_t = field_to_tpu(cplx.ascf(psi, jnp.float64), mesh)
    ref = TpuWilsonDirac.build(links_cf, mesh).apply(psi_t)

    dmesh = make_lattice_device_mesh(8, axis_names=("t", "z"))  # 4 x 2
    op = TpuWilsonDirac.build_sharded(links_cf, mesh, dmesh)
    got = jax.jit(lambda o, x: o.apply(x))(op, op.shard_field(psi_t))
    np.testing.assert_allclose(
        cplx.to_numpy(got), cplx.to_numpy(ref), atol=1e-12
    )


def test_sharded_tpu_layout_3axis_y_decomposition(small_problem):
    """T x Z x Y decomposition: the y halo is a whole x-row ppermuted on
    the merged Y*X minor axis (width = X); x shifts stay in-shard."""
    from mgpgcr_tpu import cplx
    from mgpgcr_tpu.ops.dirac import DiracOperator
    from mgpgcr_tpu.ops.wilson_tpu import TpuWilsonDirac, field_to_tpu

    mesh, links, psi = small_problem
    links_cf = cplx.ascf(links, jnp.float64)
    psi_t = field_to_tpu(cplx.ascf(psi, jnp.float64), mesh)
    ref = TpuWilsonDirac.build(links_cf, mesh).apply(psi_t)

    dmesh = make_lattice_device_mesh(
        8, axis_names=("t", "z", "y"), axis_sizes=(2, 2, 2)
    )
    op = TpuWilsonDirac.build_sharded(
        links_cf, mesh, dmesh, axis_t="t", axis_z="z", axis_y="y"
    )
    got = jax.jit(lambda o, x: o.apply(x))(op, op.shard_field(psi_t))
    np.testing.assert_allclose(
        cplx.to_numpy(got), cplx.to_numpy(ref), atol=1e-12
    )

    # full solve parity through the sharded operator
    a = DiracOperator(op, cplx.from_scalar(0.12, jnp.float64))
    a_ref = DiracOperator(
        TpuWilsonDirac.build(links_cf, mesh), cplx.from_scalar(0.12, jnp.float64)
    )
    rhs = cplx.random(jax.random.PRNGKey(5), op.field_shape, jnp.float64)
    params = GCRParams(tol=1e-10, max_iter=300, restart=5)
    got_res = jax.jit(lambda a, b: gcr_solve(a, b, params))(
        a, op.shard_field(rhs)
    )
    ref_res = gcr_solve(a_ref, rhs, params)
    assert bool(got_res.converged)
    assert int(got_res.n_iters) == int(ref_res.n_iters)
    np.testing.assert_allclose(
        cplx.to_numpy(got_res.x), cplx.to_numpy(ref_res.x), atol=1e-8
    )


def test_distributed_mg_gcr_tpu_layout(small_problem):
    """The full production path, sharded: TPU-layout CF fields, domain-
    decomposed stencil, MG preconditioner, distributed GCR — all on a
    faked 8-device mesh; results must match the single-device solve."""
    from mgpgcr_tpu import cplx
    from mgpgcr_tpu.ops.dirac import DiracOperator
    from mgpgcr_tpu.ops.wilson_tpu import TpuWilsonDirac
    from mgpgcr_tpu.solvers.mg import setup_mg
    from mgpgcr_tpu.solvers.params import MGParams

    mesh, links, _ = small_problem
    links_cf = cplx.ascf(links, jnp.float64)
    k = cplx.from_scalar(0.08, jnp.float64)
    # short smoother/coarse budgets: this checks distributed correctness,
    # not convergence quality (test_mg_tpu.py covers that single-device)
    mg_params = MGParams(
        block=2,
        n_nullvecs=2,
        setup_power_iters=3,
        setup_gcr=GCRParams(tol=1e-6, max_iter=5, restart=5),
        coarse_gcr=GCRParams(tol=1e-2, max_iter=10, restart=10),
        smoother_gcr=GCRParams(tol=0.0, max_iter=2, truncation=2),
    )

    a_single = DiracOperator(TpuWilsonDirac.build(links_cf, mesh), k)
    b = cplx.random(jax.random.PRNGKey(9), a_single.d.field_shape, jnp.float64)
    mgp_s = setup_mg(jax.random.PRNGKey(3), a_single, mesh, mg_params, layout="tpu")

    dmesh = make_lattice_device_mesh(8, axis_names=("t", "z"))
    d = TpuWilsonDirac.build_sharded(links_cf, mesh, dmesh)
    a = DiracOperator(d, k)
    mgp = setup_mg(jax.random.PRNGKey(3), a, mesh, mg_params, layout="tpu")

    # the sharded MG setup must build the same coarse operator
    np.testing.assert_allclose(
        cplx.to_numpy(mgp.coarse.a), cplx.to_numpy(mgp_s.coarse.a), atol=1e-10
    )
    # one preconditioner application: sharded == single-device (jitted:
    # eager shard_map re-traces per call and is pathologically slow)
    r0 = cplx.random(jax.random.PRNGKey(11), a_single.d.field_shape, jnp.float64)
    np.testing.assert_allclose(
        cplx.to_numpy(jax.jit(mgp.apply)(d.shard_field(r0))),
        cplx.to_numpy(jax.jit(mgp_s.apply)(r0)),
        atol=1e-9,
    )

    # short jitted distributed MG-GCR solve, independently verified
    params = GCRParams(tol=1e-7, max_iter=60, restart=5)
    solve = jax.jit(
        lambda a, b: gcr_solve(a, b, params, precond=mgp.apply)
    )
    res = solve(a, d.shard_field(b))
    assert bool(res.converged)
    r = b - a_single.apply(res.x)
    rel = float(jnp.sqrt(cplx.abs2_sum(r) / cplx.abs2_sum(b)))
    assert rel < 2e-7


def test_sharded_pallas_streaming_kernel_matches(small_problem):
    """The PRODUCTION Pallas streaming Dslash under shard_map (ghost-plane
    halo exchange, ops/pallas/dslash_dist.py) == single-device kernel.
    Round-2 VERDICT item 1: multi-chip solves must keep the fast kernel."""
    from mgpgcr_tpu import cplx
    from mgpgcr_tpu.ops.pallas.dslash import PallasWilsonDirac
    from mgpgcr_tpu.ops.wilson_tpu import field_to_tpu

    mesh, links, psi = small_problem
    links_cf = cplx.ascf(links, jnp.float64)
    psi_t = field_to_tpu(cplx.ascf(psi, jnp.float64), mesh)
    ref = PallasWilsonDirac.build(links_cf, mesh, interpret=True).apply(psi_t)

    for axes, sizes, kw in (
        (("t", "z"), (4, 2), dict(axis_t="t", axis_z="z")),
        (("t", "z"), (2, 4), dict(axis_t="t", axis_z="z")),
        (("t",), (4,), dict(axis_t="t", axis_z=None)),
        (("z",), (4,), dict(axis_t=None, axis_z="z")),
    ):
        dmesh = make_lattice_device_mesh(
            int(np.prod(sizes)), axis_names=axes, axis_sizes=sizes
        )
        op = PallasWilsonDirac.build_sharded(
            links_cf, mesh, dmesh, interpret=True, **kw
        )
        got = jax.jit(lambda o, x: o.apply(x))(op, op.shard_field(psi_t))
        np.testing.assert_allclose(
            cplx.to_numpy(got), cplx.to_numpy(ref), atol=1e-12,
            err_msg=f"axes={axes} sizes={sizes}",
        )
        # fused A = I - k D through the same sharded kernel
        k = cplx.from_scalar(0.13, jnp.float64)
        got_a = jax.jit(lambda o, x, kk: o.apply_dirac(x, kk))(
            op, op.shard_field(psi_t), k
        )
        ref_a = psi_t - k * ref
        np.testing.assert_allclose(
            cplx.to_numpy(got_a), cplx.to_numpy(ref_a), atol=1e-12,
            err_msg=f"fused axes={axes} sizes={sizes}",
        )


def test_sharded_pallas_antiperiodic_and_compression(small_problem):
    """Anti-periodic BC sign riding the exchanged ghost planes + two-row
    link compression, under the sharded streaming kernel."""
    from mgpgcr_tpu import cplx
    from mgpgcr_tpu.ops.pallas.dslash import PallasWilsonDirac
    from mgpgcr_tpu.ops.wilson import antiperiodic_t
    from mgpgcr_tpu.ops.wilson_tpu import field_to_tpu

    mesh, links, psi = small_problem
    links_cf = cplx.ascf(links, jnp.float64)
    psi_t = field_to_tpu(cplx.ascf(psi, jnp.float64), mesh)
    ref = mesh.to_lattice(
        WilsonDiracOperator(antiperiodic_t(links), mesh).apply(
            mesh.to_flat(psi)
        )
    )
    ref_t = field_to_tpu(cplx.ascf(ref, jnp.float64), mesh)

    dmesh = make_lattice_device_mesh(
        8, axis_names=("t", "z"), axis_sizes=(4, 2)
    )
    op = PallasWilsonDirac.build_sharded(
        links_cf, mesh, dmesh, axis_t="t", axis_z="z",
        antiperiodic_t=True, compress=True, interpret=True,
    )
    got = jax.jit(lambda o, x: o.apply(x))(op, op.shard_field(psi_t))
    np.testing.assert_allclose(
        cplx.to_numpy(got), cplx.to_numpy(ref_t), atol=1e-10
    )


@pytest.mark.parametrize("fused", [True, False])
def test_distributed_fused_gcr_matches_single_device(small_problem, fused):
    """The whole fused GCR solve inside shard_map (gcr_solve_sharded):
    per-shard Pallas kernels + psummed scalar dots must reproduce the
    single-device fused solve trajectory. This is the round-2 VERDICT's
    'make the fast path distributed' acceptance test."""
    from mgpgcr_tpu import cplx
    from mgpgcr_tpu.ops.dirac import DiracOperator
    from mgpgcr_tpu.ops.pallas.dslash import PallasWilsonDirac
    from mgpgcr_tpu.ops.wilson_tpu import field_to_tpu
    from mgpgcr_tpu.solvers.gcr_dist import gcr_solve_sharded

    mesh, links, psi = small_problem
    links_cf = cplx.ascf(links, jnp.float64)
    k = cplx.from_scalar(0.08, jnp.float64)
    rhs = field_to_tpu(cplx.ascf(psi, jnp.float64), mesh)
    params = GCRParams(tol=1e-10, max_iter=120, restart=5, fused=fused)

    d_ref = PallasWilsonDirac.build(links_cf, mesh, interpret=True)
    a_ref = DiracOperator(d_ref, k)
    res_ref = gcr_solve(a_ref, rhs, params)

    dmesh = make_lattice_device_mesh(
        8, axis_names=("t", "z"), axis_sizes=(4, 2)
    )
    d = PallasWilsonDirac.build_sharded(
        links_cf, mesh, dmesh, axis_t="t", axis_z="z", interpret=True
    )
    a = DiracOperator(d, k)
    res = jax.jit(
        lambda rhs_: gcr_solve_sharded(a, rhs_, params)
    )(d.shard_field(rhs))

    assert bool(res.converged)
    assert int(res.n_iters) == int(res_ref.n_iters)
    n = int(res.n_iters) + 1
    np.testing.assert_allclose(
        np.asarray(res.res_history[:n]),
        np.asarray(res_ref.res_history[:n]),
        rtol=1e-8,
    )
    np.testing.assert_allclose(
        cplx.to_numpy(res.x), cplx.to_numpy(res_ref.x), atol=1e-9
    )
    # independent residual through the single-device operator
    r = rhs - a_ref.apply(res.x)
    rel = float(jnp.sqrt(cplx.abs2_sum(r) / cplx.abs2_sum(rhs)))
    assert rel < 1e-9


def test_dist_config_from_env(monkeypatch):
    from mgpgcr_tpu.parallel.dist import config_from_env

    monkeypatch.delenv("MGPGCR_COORDINATOR", raising=False)
    monkeypatch.delenv("MGPGCR_NUM_PROCESSES", raising=False)
    monkeypatch.delenv("MGPGCR_PROCESS_ID", raising=False)
    assert config_from_env() is None

    monkeypatch.setenv("MGPGCR_COORDINATOR", "node0:8476")
    monkeypatch.setenv("MGPGCR_NUM_PROCESSES", "4")
    monkeypatch.setenv("MGPGCR_PROCESS_ID", "2")
    cfg = config_from_env()
    assert cfg == ("node0:8476", 4, 2) or (
        cfg.coordinator == "node0:8476"
        and cfg.num_processes == 4
        and cfg.process_id == 2
    )
    assert cfg.is_multiprocess

    monkeypatch.delenv("MGPGCR_NUM_PROCESSES")
    with pytest.raises(ValueError):
        config_from_env()


def test_init_distributed_single_process_noop(monkeypatch):
    """With no topology configured, init_distributed never touches
    jax.distributed (which would hang waiting for a coordinator)."""
    from mgpgcr_tpu.parallel import dist

    for var in (
        "MGPGCR_COORDINATOR",
        "MGPGCR_NUM_PROCESSES",
        "MGPGCR_PROCESS_ID",
        "SLURM_JOB_ID",
        "OMPI_COMM_WORLD_SIZE",
        "TPU_WORKER_HOSTNAMES",
    ):
        monkeypatch.delenv(var, raising=False)

    def boom(*a, **k):  # pragma: no cover - would mean the guard failed
        raise AssertionError("jax.distributed.initialize called")

    monkeypatch.setattr(jax.distributed, "initialize", boom)
    cfg = dist.init_distributed()
    assert not cfg.is_multiprocess
    assert cfg.num_processes == 1 and cfg.process_id == 0
    assert dist.is_coordinator()


def test_distributed_mega_step_gcr_matches_single_device():
    """The ONE-PASS fused step (ghost-plane r-update + Dslash + beta dots,
    ops/pallas/gcr_dslash_dist.py) inside the distributed solve. Needs an
    even local T >= 2 to engage (here T=4 over 2 devices -> T_loc=2; the
    small_problem decompositions have T_loc=1 and fall back), asserted via
    _mega_step_config before solving."""
    from mgpgcr_tpu import cplx
    from mgpgcr_tpu.ops.dirac import DiracOperator as DOp
    from mgpgcr_tpu.ops.pallas.dslash import PallasWilsonDirac
    from mgpgcr_tpu.ops.pallas.gcr_dslash_dist import ShardLocalWilsonDirac
    from mgpgcr_tpu.ops.wilson_tpu import field_to_tpu
    from mgpgcr_tpu.solvers.gcr import _mega_step_config
    from mgpgcr_tpu.solvers.gcr_dist import gcr_solve_sharded

    mesh = LatticeMesh((4, 4, 2, 2, 4, 3))
    links = random_links(jax.random.PRNGKey(3), mesh)
    psi = fields.random_field(jax.random.PRNGKey(4), mesh).reshape(mesh.dims)
    links_cf = cplx.ascf(links, jnp.float64)
    k = cplx.from_scalar(0.08, jnp.float64)
    rhs = field_to_tpu(cplx.ascf(psi, jnp.float64), mesh)
    params = GCRParams(tol=1e-10, max_iter=120, restart=5, fused=True)

    d_ref = PallasWilsonDirac.build(links_cf, mesh, interpret=True)
    res_ref = gcr_solve(DiracOperator(d_ref, k), rhs, params)

    dmesh = make_lattice_device_mesh(4, axis_names=("t", "z"), axis_sizes=(2, 2))
    d = PallasWilsonDirac.build_sharded(
        links_cf, mesh, dmesh, axis_t="t", axis_z="z", interpret=True
    )
    # the mega step must actually engage for this decomposition
    local = ShardLocalWilsonDirac(
        d.links, d.local_mesh(), "t", 2, "z", 2, False, True
    )
    assert _mega_step_config(DOp(local, k), None) is not None

    a = DiracOperator(d, k)
    res = jax.jit(lambda rhs_: gcr_solve_sharded(a, rhs_, params))(
        d.shard_field(rhs)
    )
    assert bool(res.converged)
    assert int(res.n_iters) == int(res_ref.n_iters)
    n = int(res.n_iters) + 1
    np.testing.assert_allclose(
        np.asarray(res.res_history[:n]),
        np.asarray(res_ref.res_history[:n]),
        rtol=1e-8,
    )
    np.testing.assert_allclose(
        cplx.to_numpy(res.x), cplx.to_numpy(res_ref.x), atol=1e-9
    )


def test_distributed_mega_step_antiperiodic_compressed():
    """Anti-periodic BC sign riding the pre-combined r' ghost planes +
    two-row link compression, through the distributed one-pass fused
    solve. Reference for the BC: ops/wilson.py antiperiodic_t (a link
    sign map) applied to the XLA oracle operator."""
    from mgpgcr_tpu import cplx
    from mgpgcr_tpu.ops.pallas.dslash import PallasWilsonDirac
    from mgpgcr_tpu.ops.wilson import antiperiodic_t
    from mgpgcr_tpu.ops.wilson_tpu import field_to_tpu
    from mgpgcr_tpu.solvers.gcr_dist import gcr_solve_sharded

    mesh = LatticeMesh((4, 4, 2, 2, 4, 3))
    links = random_links(jax.random.PRNGKey(5), mesh)
    psi = fields.random_field(jax.random.PRNGKey(6), mesh).reshape(mesh.dims)
    k = cplx.from_scalar(0.08, jnp.float64)
    rhs = field_to_tpu(cplx.ascf(psi, jnp.float64), mesh)
    params = GCRParams(tol=1e-10, max_iter=120, restart=5, fused=True)

    # oracle: flipped-link operator through the plain (unfused) solver
    aref = DiracOperator(
        PallasWilsonDirac.build(
            cplx.ascf(antiperiodic_t(links), jnp.float64), mesh, interpret=True
        ),
        k,
    )
    res_ref = gcr_solve(aref, rhs, params, fused=False)

    dmesh = make_lattice_device_mesh(4, axis_names=("t", "z"), axis_sizes=(2, 2))
    d = PallasWilsonDirac.build_sharded(
        cplx.ascf(links, jnp.float64), mesh, dmesh, axis_t="t", axis_z="z",
        antiperiodic_t=True, compress=True, interpret=True,
    )
    a = DiracOperator(d, k)
    res = jax.jit(lambda rhs_: gcr_solve_sharded(a, rhs_, params))(
        d.shard_field(rhs)
    )
    assert bool(res.converged)
    assert int(res.n_iters) == int(res_ref.n_iters)
    np.testing.assert_allclose(
        cplx.to_numpy(res.x), cplx.to_numpy(res_ref.x), atol=1e-9
    )
