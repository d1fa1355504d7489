"""Lattice geometry: index spaces, layouts, and 4-D domain decomposition.

TPU-native replacement for the reference's ``Mesh.h``. The reference builds
explicit index<->offset lookup tables (Mesh.h:146-165) and block->site maps
(``Mesh::blocking``, Mesh.h:237-298). Here the same information is carried as
*static shape metadata*, and every layout change is a pure
``reshape``/``transpose`` that XLA compiles to (at most) a relayout — there
are no index tables in device memory at all.

Conventions (identical to the reference so matrices interoperate):
- A field index is ``(t, z, y, x, spinor, colour)`` with row-major linear
  offset, i.e. colour fastest (Mesh.h:369-398; verified by the reference's
  ``probe_order`` experiment, main.cpp:572-677).
- Block index for a 4-D decomposition is row-major over the 4 spacetime
  block coordinates (Mesh.h:168-233).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from functools import reduce

import jax.numpy as jnp
import numpy as np


def _prod(xs) -> int:
    return reduce(lambda a, b: a * b, xs, 1)


@dataclass(frozen=True)
class LatticeMesh:
    """Static description of a lattice index space.

    ``dims`` is the full index extent, e.g. ``(8, 8, 8, 8, 4, 3)`` for an
    8^4 lattice with 4 spinor and 3 colour components. The first
    ``n_spacetime`` dims are spacetime (blockable / shardable); the rest are
    internal (spinor, colour) and always stay site-local.
    """

    dims: tuple[int, ...]
    n_spacetime: int = 4

    def __post_init__(self):
        object.__setattr__(self, "dims", tuple(int(d) for d in self.dims))
        if self.n_spacetime > len(self.dims):
            raise ValueError("n_spacetime exceeds number of dims")

    # ---- sizes ----
    @property
    def size(self) -> int:
        """Total number of complex degrees of freedom (Mesh.h:50)."""
        return _prod(self.dims)

    @property
    def spacetime_dims(self) -> tuple[int, ...]:
        return self.dims[: self.n_spacetime]

    @property
    def internal_dims(self) -> tuple[int, ...]:
        return self.dims[self.n_spacetime :]

    @property
    def n_sites(self) -> int:
        return _prod(self.spacetime_dims)

    @property
    def site_dof(self) -> int:
        """Degrees of freedom per site (4 spinor x 3 colour = 12)."""
        return _prod(self.internal_dims)

    # ---- layout transforms (replace Mesh.h index<->loc tables) ----
    def to_lattice(self, x: jnp.ndarray) -> jnp.ndarray:
        """Reshape (..., size) -> (..., *dims)."""
        return x.reshape(x.shape[:-1] + self.dims)

    def to_flat(self, x: jnp.ndarray) -> jnp.ndarray:
        """Reshape (..., *dims) -> (..., size)."""
        lead = x.shape[: x.ndim - len(self.dims)]
        return x.reshape(lead + (self.size,))

    # ---- scalar index arithmetic (host-side helpers, used by IO/tests) ----
    def coords_to_index(self, coords) -> int:
        """Row-major linearisation, the analogue of Mesh::ind_loc (Mesh.h:146-154)."""
        idx = 0
        for c, d in zip(coords, self.dims):
            idx = idx * d + int(c)
        return idx

    def index_to_coords(self, index: int) -> tuple[int, ...]:
        """Inverse map, the analogue of Mesh::alloc_loc_ind (Mesh.h:157-165)."""
        coords = []
        for d in reversed(self.dims):
            coords.append(index % d)
            index //= d
        return tuple(reversed(coords))

    # ---- domain decomposition ----
    def blocking(self, block: int | tuple[int, ...]) -> "BlockMap":
        """4-D spacetime blocking (the analogue of Mesh::blocking, Mesh.h:237-298).

        ``block`` is the block extent, either a scalar applied to every
        spacetime dim (the reference's ``subblock_dim``) or a per-dim tuple.
        """
        if isinstance(block, int):
            block = (block,) * self.n_spacetime
        block = tuple(int(b) for b in block)
        if len(block) != self.n_spacetime:
            raise ValueError("block extent must have one entry per spacetime dim")
        for d, b in zip(self.spacetime_dims, block):
            if d % b != 0:
                raise ValueError(f"block extent {b} does not divide lattice dim {d}")
        return BlockMap(mesh=self, block_dims=block)


@dataclass(frozen=True)
class BlockMap:
    """Static description of a 4-D spacetime domain decomposition.

    Replaces the reference's explicit ``block_map[block][offset] -> site``
    tables (Mesh.h:237-298) with reshape/transpose layout transforms:
    a flat field (N,) becomes a blocked field (n_blocks, block_len) where
    ``block_len = prod(block_dims) * site_dof``.
    """

    mesh: LatticeMesh
    block_dims: tuple[int, ...]

    @property
    def blocks_per_dim(self) -> tuple[int, ...]:
        return tuple(
            d // b for d, b in zip(self.mesh.spacetime_dims, self.block_dims)
        )

    @property
    def n_blocks(self) -> int:
        return _prod(self.blocks_per_dim)

    @property
    def block_sites(self) -> int:
        return _prod(self.block_dims)

    @property
    def block_len(self) -> int:
        """Complex dof per block = block volume x (spinor x colour)."""
        return self.block_sites * self.mesh.site_dof

    # interleaved shape: (Bt, bt, Bz, bz, By, by, Bx, bx, *internal)
    def _split_shape(self) -> tuple[int, ...]:
        shape: list[int] = []
        for d, b in zip(self.mesh.spacetime_dims, self.block_dims):
            shape += [d // b, b]
        shape += list(self.mesh.internal_dims)
        return tuple(shape)

    def _block_axes_perm(self) -> tuple[int, ...]:
        """Permutation bringing block coords first, then within-block coords."""
        ns = self.mesh.n_spacetime
        n_int = len(self.mesh.internal_dims)
        outer = [2 * i for i in range(ns)]
        inner = [2 * i + 1 for i in range(ns)]
        internal = [2 * ns + i for i in range(n_int)]
        return tuple(outer + inner + internal)

    def to_blocked(self, x: jnp.ndarray) -> jnp.ndarray:
        """(..., N) -> (..., n_blocks, block_len).

        Block order is row-major over the spacetime block coordinates, and
        within a block the dof order is row-major (t,z,y,x,s,c) local coords
        — matching Mesh::ind_loc conventions so block ids agree with the
        reference's 9-point neighbour stencil (MG.h:229-276).
        """
        lead = x.shape[:-1]
        nlead = len(lead)
        split = x.reshape(lead + self._split_shape())
        perm = tuple(range(nlead)) + tuple(
            nlead + a for a in self._block_axes_perm()
        )
        moved = split.transpose(perm)
        return moved.reshape(lead + (self.n_blocks, self.block_len))

    def from_blocked(self, xb: jnp.ndarray) -> jnp.ndarray:
        """(..., n_blocks, block_len) -> (..., N). Inverse of ``to_blocked``."""
        lead = xb.shape[:-2]
        nlead = len(lead)
        ns = self.mesh.n_spacetime
        mid_shape = (
            self.blocks_per_dim + self.block_dims + self.mesh.internal_dims
        )
        mid = xb.reshape(lead + mid_shape)
        perm_fwd = self._block_axes_perm()
        inv = [0] * len(perm_fwd)
        for i, p in enumerate(perm_fwd):
            inv[p] = i
        moved = mid.transpose(tuple(range(nlead)) + tuple(nlead + a for a in inv))
        return moved.reshape(lead + (self.mesh.size,))

    # ---- TPU-layout blocking ------------------------------------------
    # Fields in the TPU compute layout (..., spin 4, colour 3, T, Z, Y*X)
    # (ops/wilson_tpu.py) block into EXACTLY the same (n_blocks, block_len)
    # representation as canonical fields — within-block dof order is
    # (t, z, y, x, spinor, colour) row-major in both — so MG bases and
    # Galerkin coarse operators are layout-independent.

    def to_blocked_tpu(self, x):
        """(..., 4, 3, T, Z, Y*X) -> (..., n_blocks, block_len)."""
        ns = self.mesh.n_spacetime
        if ns != 4:
            raise ValueError("TPU layout blocking assumes 4 spacetime dims")
        t, z, y, xx = self.mesh.spacetime_dims
        bt, bz, by, bx = self.block_dims
        lead = x.shape[: x.ndim - 5]
        nl = len(lead)
        split = x.reshape(
            lead
            + (4, 3, t // bt, bt, z // bz, bz, y // by, by, xx // bx, bx)
        )
        perm = tuple(range(nl)) + tuple(
            nl + a for a in (2, 4, 6, 8, 3, 5, 7, 9, 0, 1)
        )
        moved = split.transpose(perm)
        return moved.reshape(lead + (self.n_blocks, self.block_len))

    def from_blocked_tpu(self, xb):
        """(..., n_blocks, block_len) -> (..., 4, 3, T, Z, Y*X)."""
        t, z, y, xx = self.mesh.spacetime_dims
        bt, bz, by, bx = self.block_dims
        lead = xb.shape[:-2]
        nl = len(lead)
        mid = xb.reshape(
            lead
            + (t // bt, z // bz, y // by, xx // bx, bt, bz, by, bx, 4, 3)
        )
        # inverse of the (2,4,6,8,3,5,7,9,0,1) permutation
        inv = (8, 9, 0, 4, 1, 5, 2, 6, 3, 7)
        moved = mid.transpose(tuple(range(nl)) + tuple(nl + a for a in inv))
        return moved.reshape(lead + (4, 3, t, z, y * xx))

    def neighbor_table(self) -> np.ndarray:
        """(n_blocks, 9) int32 table: [self, +d0, -d0, +d1, -d1, ...] with
        periodic wrap-around — the coarse-grid 9-point stencil of the
        Galerkin assembly (MG.h:229-276).
        """
        bpd = self.blocks_per_dim
        ns = len(bpd)
        nb = self.n_blocks
        table = np.empty((nb, 2 * ns + 1), dtype=np.int32)
        for blk in range(nb):
            coords = []
            rem = blk
            for d in reversed(bpd):
                coords.append(rem % d)
                rem //= d
            coords = list(reversed(coords))
            table[blk, 0] = blk
            col = 1
            for d in range(ns):
                for sgn in (+1, -1):
                    nb_coords = list(coords)
                    nb_coords[d] = (nb_coords[d] + sgn) % bpd[d]
                    idx = 0
                    for c, dd in zip(nb_coords, bpd):
                        idx = idx * dd + c
                    table[blk, col] = idx
                    col += 1
        return table
