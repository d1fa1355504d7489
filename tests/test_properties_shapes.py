"""Property-based tests (hypothesis) over lattice shapes.

Roadmap robustness item: the layout converters, shift/halo helpers and
blocking maps must hold their invariants for ANY even lattice shape, not
just the handful of fixtures the example-based tests use. Shapes are
drawn per-axis from small even extents (TPU layout requires even X for
the merged-axis x masks and even T for the streaming kernel's scratch
parity; the reference's lattices are all even, Mesh.h:237-298).
"""

import pytest
import jax
import jax.numpy as jnp
import numpy as np
from hypothesis import given, settings, strategies as st

from mgpgcr_tpu import cplx, fields
from mgpgcr_tpu.mesh import LatticeMesh
from mgpgcr_tpu.ops.wilson import WilsonDiracOperator, random_links
from mgpgcr_tpu.ops.wilson_tpu import (
    TpuWilsonDirac,
    field_from_tpu,
    field_to_tpu,
    links_to_tpu,
)
from mgpgcr_tpu.parallel.halo import periodic_shift

extent = st.sampled_from([2, 4, 6])
lattices = st.tuples(extent, extent, extent, extent).filter(
    lambda d: np.prod(d) <= 6 * 6 * 4 * 4
)

SET = settings(max_examples=12, deadline=None)


@given(dims=lattices, seed=st.integers(0, 2**16))
@SET
def test_field_layout_roundtrip(dims, seed):
    """field_to_tpu / field_from_tpu are exact inverses for any shape."""
    mesh = LatticeMesh((*dims, 4, 3))
    f = cplx.random(jax.random.PRNGKey(seed), (mesh.size,), jnp.float32)
    t = field_to_tpu(f, mesh)
    assert t.shape == (4, 3, dims[0], dims[1], dims[2] * dims[3])
    back = field_from_tpu(t, mesh)
    np.testing.assert_array_equal(cplx.to_numpy(back), cplx.to_numpy(f))


@given(dims=lattices, seed=st.integers(0, 2**16))
@SET
@pytest.mark.slow
def test_tpu_stencil_matches_canonical_any_shape(dims, seed):
    """The TPU-layout stencil equals the canonical operator for any even
    lattice (exercises the merged-axis x masks and every shift width)."""
    mesh = LatticeMesh((*dims, 4, 3))
    links = random_links(jax.random.PRNGKey(seed), mesh)
    psi = fields.random_field(jax.random.PRNGKey(seed + 1), mesh)
    ref = WilsonDiracOperator(links, mesh).apply(psi)

    links_t = links_to_tpu(cplx.ascf(links, jnp.float64), mesh)
    got = TpuWilsonDirac(links_t, mesh).apply(
        field_to_tpu(cplx.ascf(psi, jnp.float64), mesh)
    )
    ref_t = field_to_tpu(cplx.ascf(ref, jnp.float64), mesh)
    np.testing.assert_allclose(
        cplx.to_numpy(got), cplx.to_numpy(ref_t), atol=1e-12
    )


@given(dims=lattices)
@SET
@pytest.mark.slow
def test_shift_fwd_bwd_inverse(dims):
    """shift(+mu) o shift(-mu) is the identity in every direction."""
    mesh = LatticeMesh((*dims, 4, 3))
    op = TpuWilsonDirac(
        links_to_tpu(
            cplx.ascf(random_links(jax.random.PRNGKey(0), mesh), jnp.float64),
            mesh,
        ),
        mesh,
    )
    v = cplx.random(jax.random.PRNGKey(3), (3, *op.field_shape[2:]), jnp.float64)
    for mu in range(4):
        w = op._shift(op._shift(v, mu, True), mu, False)
        np.testing.assert_allclose(
            cplx.to_numpy(w), cplx.to_numpy(v), atol=1e-14
        )


@given(
    shape=st.tuples(
        st.integers(2, 6), st.integers(2, 6), st.integers(2, 12)
    ),
    width=st.integers(1, 4),
    axis=st.integers(0, 2),
    s=st.sampled_from([-1, 1]),
)
@SET
def test_periodic_shift_width_matches_roll(shape, width, axis, s):
    """Unsharded periodic_shift with a block width == jnp.roll by width."""
    if shape[axis] < width:
        return
    x = jnp.arange(float(np.prod(shape))).reshape(shape)
    got = periodic_shift(x, axis, s, None, 1, width=width)
    np.testing.assert_array_equal(got, jnp.roll(x, s * width, axis))


@given(dims=lattices, block=st.sampled_from([2, 3]), seed=st.integers(0, 99))
@SET
def test_blocking_is_partition(dims, block, seed):
    """Mesh.blocking covers every dof exactly once (Mesh.h:237-298):
    to_blocked is a permutation and from_blocked inverts it."""
    if any(d % block for d in dims):
        return
    mesh = LatticeMesh((*dims, 4, 3))
    bm = mesh.blocking(block)
    x = jnp.arange(float(mesh.size))
    b = bm.to_blocked(x)
    assert b.shape == (bm.n_blocks, bm.block_len)
    assert sorted(np.asarray(b).ravel().tolist()) == list(range(mesh.size))
    back = bm.from_blocked(b)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


@given(dims=lattices, seed=st.integers(0, 99))
@SET
def test_eo_split_roundtrip_any_shape(dims, seed):
    """field_to_eo / field_from_eo are mutually inverse bijections for any
    even lattice shape, and the two parity halves partition the sites
    (ops/eo.py compact-layout contract)."""
    from mgpgcr_tpu.ops.eo import field_from_eo, field_to_eo

    mesh = LatticeMesh((*dims, 4, 3))
    t, z, y, xx = mesh.spacetime_dims
    x = jnp.arange(float(t * z * y * xx)).reshape(t, z, y * xx)
    even, odd = field_to_eo(x, mesh)
    assert even.shape == odd.shape == (t, z, y * (xx // 2))
    all_vals = np.concatenate(
        [np.asarray(even).ravel(), np.asarray(odd).ravel()]
    )
    assert sorted(all_vals.tolist()) == list(range(t * z * y * xx))
    back = field_from_eo(even, odd, mesh)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))
