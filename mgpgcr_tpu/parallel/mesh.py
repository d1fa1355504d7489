"""Device-mesh construction and sharding specs for lattice fields.

The decomposition axes mirror the reference's logical 4-D blocking
(``Mesh::blocking``, Mesh.h:237-298), but over *devices*: a spacetime axis of
the lattice may be split across a named mesh axis, every other index
(remaining spacetime, spinor, colour) stays device-local. An optional leading
batch axis ("dp") shards stacks of independent right-hand sides.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mgpgcr_tpu.mesh import LatticeMesh


def balanced_factors(n: int, k: int) -> tuple[int, ...]:
    """Factor ``n`` into ``k`` integers, largest first, as balanced as the
    prime factorisation allows (e.g. 8, 3 -> (2, 2, 2); 12, 2 -> (4, 3))."""
    factors: list[int] = []
    m = n
    d = 2
    while d * d <= m:
        while m % d == 0:
            factors.append(d)
            m //= d
        d += 1
    if m > 1:
        factors.append(m)
    out = [1] * k
    # greedily multiply primes (largest first) onto the currently-smallest bin
    for f in sorted(factors, reverse=True):
        out[int(np.argmin(out))] *= f
    return tuple(sorted(out, reverse=True))


def make_lattice_device_mesh(
    n_devices: Optional[int] = None,
    axis_names: Sequence[str] = ("t", "z"),
    axis_sizes: Optional[Sequence[int]] = None,
    devices=None,
) -> Mesh:
    """Build a named device mesh for lattice domain decomposition.

    By default splits all available devices over 2 spacetime axes
    (``t``, ``z``); pass 3- or 4-name tuples (optionally including a leading
    batch axis like ``dp``) for higher-dimensional decompositions.
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = devices[:n_devices]
    if axis_sizes is None:
        axis_sizes = balanced_factors(n_devices, len(axis_names))
    axis_sizes = tuple(int(s) for s in axis_sizes)
    if int(np.prod(axis_sizes)) != n_devices:
        raise ValueError(f"axis sizes {axis_sizes} do not use {n_devices} devices")
    # explicit object array: np.asarray on a device list can collapse
    # (Device implements rich comparison/array hooks numpy misreads)
    dev_array = np.empty(len(devices), dtype=object)
    dev_array[:] = devices
    return Mesh(dev_array.reshape(axis_sizes), tuple(axis_names))


def spacetime_axis_names(
    device_mesh: Mesh, lattice: LatticeMesh, skip: Sequence[str] = ("dp",)
) -> tuple[Optional[str], ...]:
    """Assign mesh axis names to leading spacetime dims: mesh axes (in mesh
    order, minus any batch axes in ``skip``) map onto lattice dims 0, 1, ...
    Returns one entry (name or None) per spacetime dim."""
    names = [n for n in device_mesh.axis_names if n not in skip]
    out: list[Optional[str]] = []
    for i in range(lattice.n_spacetime):
        out.append(names[i] if i < len(names) else None)
    return tuple(out)


def field_partition_spec(
    axis_names: Sequence[Optional[str]],
    lattice: LatticeMesh,
    batch_axis: Optional[str] = None,
) -> P:
    """PartitionSpec for a lattice-shaped field (T, Z, Y, X, spinor, colour),
    optionally with a leading sharded batch axis."""
    internal = (None,) * len(lattice.internal_dims)
    spec = tuple(axis_names) + internal
    if batch_axis is not None:
        spec = (batch_axis,) + spec
    return P(*spec)


def links_partition_spec(
    axis_names: Sequence[Optional[str]], lattice: LatticeMesh
) -> P:
    """PartitionSpec for gauge links (4, T, Z, Y, X, 3, 3): replicated over
    the direction axis and any batch axis, domain-decomposed in spacetime."""
    return P(None, *axis_names, None, None)


def shard_field(
    x,
    device_mesh: Mesh,
    lattice: LatticeMesh,
    batch_axis: Optional[str] = None,
):
    """Lay a lattice-shaped (or batched lattice-shaped) field out over the
    device mesh."""
    names = spacetime_axis_names(device_mesh, lattice)
    spec = field_partition_spec(names, lattice, batch_axis=batch_axis)
    return jax.device_put(x, NamedSharding(device_mesh, spec))


def shard_links(links, device_mesh: Mesh, lattice: LatticeMesh):
    names = spacetime_axis_names(device_mesh, lattice)
    spec = links_partition_spec(names, lattice)
    return jax.device_put(links, NamedSharding(device_mesh, spec))
