"""One-site periodic halo exchange for domain-decomposed stencils.

Inside a ``shard_map`` region, a periodic nearest-neighbour shift along a
*sharded* lattice axis is a local roll whose wrapped-around plane is wrong —
it must come from the neighbouring device instead. ``periodic_shift``
implements that as: slice off the face plane, ``ppermute`` it one step around
the mesh-axis ring (this is the ICI-riding halo exchange replacing the
reference's shared-memory neighbour access, SURVEY.md §5), and concatenate it
onto the surviving local interior. Unsharded axes degrade to ``jnp.roll``.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

from mgpgcr_tpu import cplx


def periodic_shift(
    x: jnp.ndarray,
    axis: int,
    shift: int,
    axis_name: Optional[str] = None,
    axis_size: int = 1,
    width: int = 1,
) -> jnp.ndarray:
    """Periodic shift of a (possibly sharded) lattice axis by one site.

    ``shift=-1`` brings the value at site ``i+1`` to slot ``i`` (forward
    neighbour access psi(x+mu)); ``shift=+1`` brings site ``i-1`` to slot
    ``i`` (backward access psi(x-mu)). When ``axis_name`` names a mesh axis
    of size > 1 this must be called inside ``shard_map``; ``x`` is then the
    local shard and the face is exchanged with the ring neighbour.

    ``width`` is the element count of one site along this array axis: 1
    for a plain lattice axis, X for the y direction on the merged Y*X
    minor axis of the TPU layout (the face is then a whole x-row).
    """
    if shift not in (-1, 1):
        raise ValueError("halo exchange supports single-site shifts only")
    if cplx.is_cf(x):  # split re/im pair: shift both real components
        return cplx.CF(
            periodic_shift(x.re, axis, shift, axis_name, axis_size, width),
            periodic_shift(x.im, axis, shift, axis_name, axis_size, width),
        )
    if axis_name is None or axis_size == 1:
        return jnp.roll(x, shift * width, axis)

    axis = axis % x.ndim
    n = axis_size
    if shift == -1:
        # slot i <- site i+1: every device needs its +1 neighbour's first
        # face as its new last face; device j receives from j+1, i.e. each
        # device sends its first face to the ring predecessor.
        face = lax.slice_in_dim(x, 0, width, axis=axis)
        perm = [(i, (i - 1) % n) for i in range(n)]
        recv = lax.ppermute(face, axis_name, perm)
        body = lax.slice_in_dim(x, width, None, axis=axis)
        return lax.concatenate([body, recv], dimension=axis)
    else:
        # slot i <- site i-1: each device needs its -1 neighbour's last face
        # as its new first face; device j receives from j-1.
        extent = x.shape[axis]
        face = lax.slice_in_dim(x, extent - width, extent, axis=axis)
        perm = [(i, (i + 1) % n) for i in range(n)]
        recv = lax.ppermute(face, axis_name, perm)
        body = lax.slice_in_dim(x, 0, extent - width, axis=axis)
        return lax.concatenate([recv, body], dimension=axis)
