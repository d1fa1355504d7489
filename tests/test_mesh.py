"""Mesh / blocking tests (reference analogue: Mesh.h index machinery,
validated by probe_order, main.cpp:572-677)."""

import jax.numpy as jnp
import numpy as np

from mgpgcr_tpu.mesh import LatticeMesh


def test_coords_roundtrip():
    mesh = LatticeMesh((4, 4, 4, 4, 4, 3))
    for idx in [0, 1, 5, 100, mesh.size - 1]:
        coords = mesh.index_to_coords(idx)
        assert mesh.coords_to_index(coords) == idx


def test_row_major_order():
    mesh = LatticeMesh((2, 2, 2, 2, 4, 3))
    # colour fastest, then spinor, then x, ... (Mesh.h row-major convention)
    assert mesh.coords_to_index((0, 0, 0, 0, 0, 1)) == 1
    assert mesh.coords_to_index((0, 0, 0, 0, 1, 0)) == 3
    assert mesh.coords_to_index((0, 0, 0, 1, 0, 0)) == 12
    assert mesh.coords_to_index((1, 0, 0, 0, 0, 0)) == mesh.size // 2


def test_blocking_roundtrip():
    mesh = LatticeMesh((4, 4, 4, 4, 4, 3))
    bm = mesh.blocking(2)
    assert bm.n_blocks == 16
    assert bm.block_len == 2**4 * 12
    x = jnp.arange(mesh.size, dtype=jnp.float64)
    xb = bm.to_blocked(x)
    assert xb.shape == (16, 192)
    x2 = bm.from_blocked(xb)
    np.testing.assert_array_equal(np.asarray(x), np.asarray(x2))


def test_blocking_block_membership():
    """Every dof of block 0 must come from sites with all spacetime coords
    < block extent — the contiguous-block semantics of Mesh::blocking."""
    mesh = LatticeMesh((4, 4, 4, 4, 4, 3))
    bm = mesh.blocking(2)
    x = jnp.arange(mesh.size, dtype=jnp.int64)
    xb = np.asarray(bm.to_blocked(x))
    for flat_idx in xb[0]:
        coords = mesh.index_to_coords(int(flat_idx))
        assert all(c < 2 for c in coords[:4])


def test_blocked_batch_axes():
    mesh = LatticeMesh((2, 2, 2, 2, 4, 3))
    bm = mesh.blocking(2)
    x = jnp.arange(3 * mesh.size, dtype=jnp.float64).reshape(3, mesh.size)
    xb = bm.to_blocked(x)
    assert xb.shape == (3, 1, mesh.size)
    np.testing.assert_array_equal(np.asarray(bm.from_blocked(xb)), np.asarray(x))


def test_neighbor_table():
    mesh = LatticeMesh((8, 8, 4, 4, 4, 3))
    bm = mesh.blocking((4, 4, 2, 2))
    table = bm.neighbor_table()
    assert table.shape == (bm.n_blocks, 9)
    assert (table[:, 0] == np.arange(bm.n_blocks)).all()
    # block 0 at coords (0,0,0,0): +t neighbour is block (1,0,0,0) -> idx 8
    # using row-major over blocks_per_dim (2,2,2,2)
    assert bm.blocks_per_dim == (2, 2, 2, 2)
    assert table[0, 1] == 8  # +t
    assert table[0, 2] == 8  # -t wraps to the same block (2 blocks per dim)
    assert table[0, 3] == 4  # +z
