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
