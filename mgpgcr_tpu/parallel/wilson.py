"""Domain-decomposed matrix-free Wilson--Dirac hopping operator.

The scale-out form of ``ops/wilson.py``'s stencil: the lattice field and the
gauge links are sharded over spacetime axes of a device mesh, the 8
nearest-neighbour accesses become local rolls plus one-plane ``ppermute``
halo exchanges (``parallel/halo.py``), and everything runs inside one
``shard_map`` region so XLA can overlap the face transfers with the interior
colour/spin contractions. This is the TPU-native replacement for the
reference's (absent) distribution layer — the reference computes the same
stencil via an explicit sparse matrix on one CPU (Operator.h:331-346 with
fixtures from Parse.cpp; SURVEY.md §5).

Composes unchanged with the solvers: ``DiracOperator(ShardedWilsonDirac(...),
k)`` inside ``gcr_solve`` gives a fully distributed solve — the solver's
global dot products over sharded fields lower to ``psum``s automatically.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mgpgcr_tpu import cplx
from mgpgcr_tpu.mesh import LatticeMesh
from mgpgcr_tpu.ops.base import LinearOperator, operator_dataclass
from mgpgcr_tpu.ops.wilson import P_MINUS, P_PLUS, _spin_proj
from mgpgcr_tpu.parallel.halo import periodic_shift
from mgpgcr_tpu.parallel.mesh import (
    links_partition_spec,
    spacetime_axis_names,
)


@operator_dataclass(meta=("mesh", "device_mesh", "axis_names", "batch_axis"))
class ShardedWilsonDirac(LinearOperator):
    """D psi via halo-exchanged stencil over a device mesh.

    ``axis_names[mu]`` is the device-mesh axis that spacetime dim ``mu`` is
    split over (or None for device-local dims). ``batch_axis`` optionally
    shards a leading stack-of-fields axis (data parallelism over independent
    right-hand sides).
    """

    links: jnp.ndarray  # (4, T, Z, Y, X, 3, 3), sharded per links_partition_spec
    mesh: LatticeMesh
    device_mesh: Mesh
    axis_names: tuple[Optional[str], ...]
    batch_axis: Optional[str] = None

    @staticmethod
    def build(
        links: jnp.ndarray,
        mesh: LatticeMesh,
        device_mesh: Mesh,
        batch_axis: Optional[str] = None,
    ) -> "ShardedWilsonDirac":
        names = spacetime_axis_names(
            device_mesh, mesh, skip=(batch_axis,) if batch_axis else ()
        )
        links = jax.device_put(
            links, NamedSharding(device_mesh, links_partition_spec(names, mesh))
        )
        return ShardedWilsonDirac(links, mesh, device_mesh, names, batch_axis)

    @property
    def shape(self) -> tuple[int, int]:
        return (self.mesh.size, self.mesh.size)

    def _axis_size(self, name: Optional[str]) -> int:
        if name is None:
            return 1
        return self.device_mesh.shape[name]

    def _local_apply(self, links, psi):
        """Stencil on local shards; psi: (..., t, z, y, x, 4, 3) local,
        either a complex array or a split re/im ``cplx.CF`` pair.

        All halo exchanges (the periodic_shift ppermutes of every hop) are
        issued before any colour/spin contraction so XLA's latency-hiding
        scheduler can overlap the face transfers with the local einsums
        instead of serialising shift -> contract per direction."""
        dt = psi.dtype
        shifts = []
        for mu in range(4):
            name = self.axis_names[mu]
            nsz = self._axis_size(name)
            psi_axis = psi.ndim - 6 + mu
            u = links[mu].astype(dt)
            udag = cplx.swapaxes(cplx.conj(u), -1, -2)
            shifts.append(
                (
                    u,
                    periodic_shift(psi, psi_axis, -1, name, nsz),
                    periodic_shift(udag, mu, 1, name, nsz),
                    periodic_shift(psi, psi_axis, 1, name, nsz),
                )
            )
        out = cplx.zeros_like(psi)
        for mu, (u, fwd, udag, bwd) in enumerate(shifts):
            pm = _spin_proj(P_MINUS[mu], psi, dt)
            pp = _spin_proj(P_PLUS[mu], psi, dt)
            # forward: (1 - gamma_mu) U_mu(x) psi(x + mu)
            fwd = cplx.einsum2("tzyxab,...tzyxsb->...tzyxsa", u, fwd)
            out = out + cplx.einsum2("st,...tc->...sc", pm, fwd)
            # backward: (1 + gamma_mu) U_mu^dag(x - mu) psi(x - mu)
            bwd = cplx.einsum2("tzyxab,...tzyxsb->...tzyxsa", udag, bwd)
            out = out + cplx.einsum2("st,...tc->...sc", pp, bwd)
        return out

    def apply(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: lattice-shaped (T,Z,Y,X,4,3), or (B,T,Z,Y,X,4,3) with
        batch_axis set (B replicated if batch_axis is None)."""
        nlat = len(self.mesh.dims)
        if x.ndim not in (nlat, nlat + 1):
            raise ValueError(
                "sharded stencil expects a lattice-shaped field "
                f"({nlat} or {nlat + 1} dims), got shape {x.shape}"
            )
        batched = x.ndim == nlat + 1
        entries = tuple(self.axis_names) + (None,) * len(self.mesh.internal_dims)
        if batched:
            entries = (self.batch_axis,) + entries  # None = replicated batch
        fspec = P(*entries)
        lspec = links_partition_spec(self.axis_names, self.mesh)
        fn = jax.shard_map(
            self._local_apply,
            mesh=self.device_mesh,
            in_specs=(lspec, fspec),
            out_specs=fspec,
        )
        return fn(self.links, x)
