"""Even-odd (Schur-complement) solve driver for A = I - k D.

Reduces the full Wilson--Dirac solve to the half-dimension even-site
system S x_e = b_e + k D_eo b_o with S = I - k^2 D_eo D_oe, then back-
substitutes the odd sites, x_o = b_o + k D_oe x_e (ops/eo.py).  Exact:
the reconstructed x solves the original system to the Schur solve's
tolerance.  Beyond-reference capability (the reference solves the full
system only, GCR.h:159-302); composes with any GCR preconditioner on the
even subsystem.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

from mgpgcr_tpu import cplx
from mgpgcr_tpu.mesh import LatticeMesh
from mgpgcr_tpu.ops.eo import (
    EvenOddWilson,
    field_from_eo,
    field_to_eo,
    make_schur,
)
from mgpgcr_tpu.solvers.gcr import Preconditioner, gcr_solve
from mgpgcr_tpu.solvers.params import GCRParams
from mgpgcr_tpu.solvers.result import SolveResult


def eo_solve(
    eo: EvenOddWilson,
    k,
    rhs: cplx.CF,
    params: GCRParams,
    precond: Optional[Preconditioner] = None,
    mesh: LatticeMesh | None = None,
) -> SolveResult:
    """Solve (I - k D) x = rhs through the even-odd Schur complement.

    ``rhs`` is a full-lattice TPU-layout field (4, 3, T, Z, Y*X); the
    returned result's ``x`` is full-lattice again.  Convergence history
    and iteration counts are those of the half-dimension Schur GCR solve.
    ``precond`` (optional) preconditions the Schur system."""
    mesh = mesh if mesh is not None else eo.mesh
    kcf = cplx.ascf(k, cplx.real_dtype(rhs))
    b_e, b_o = field_to_eo(rhs, mesh)
    s = make_schur(eo, kcf, cplx.real_dtype(rhs))

    rhs_e = b_e + kcf * eo.apply_eo(b_o)
    res = gcr_solve(s, rhs_e, params, precond=precond)
    x_e = res.x
    x_o = b_o + kcf * eo.apply_oe(x_e)
    return dataclasses.replace(res, x=field_from_eo(x_e, x_o, mesh))


def eo_half_mesh(mesh: LatticeMesh) -> LatticeMesh:
    """The even-sublattice index space of the compact parity layout:
    (T, Z, Y, X/2) spacetime with the same internal dof."""
    t, z, y, xx = mesh.spacetime_dims
    return LatticeMesh((t, z, y, xx // 2, *mesh.internal_dims))


def setup_eo_mg(
    key,
    eo: EvenOddWilson,
    k,
    params,
    smoother_operator=None,
):
    """Adaptive MG over the even-site Schur complement: ``setup_mg`` on
    S = I - k^2 D_eo D_oe. Returns ``(schur_op, mg_preconditioner)``;
    pass ``mg.apply`` as ``eo_solve``'s precond.

    Why this composes unchanged (beyond-reference; attacks the same
    conditioning problem as MG.h over the better-conditioned half
    system):

    - gamma5-hermiticity survives the Schur reduction (gamma5 D_eo
      gamma5 = D_oe^H restricted to parities), so the chiral-doubling
      setup (MG.h:146-149, 317-345) applies verbatim on compact
      even-parity fields — gamma5 is a pure spinor permutation,
      independent of site packing.
    - the compact layout stores x = 2*xh + o(t,z,y) at minor index xh,
      so for even fine block extents a geometric b^4 fine block is
      EXACTLY the (b, b, b, b/2) block of the half mesh — aggregation
      stays a pure reshape (ops/eo.py layout contract).
    - S hops two sites, so its coarse-grid coupling reaches DIAGONAL
      neighbour blocks (3^4-point, not the 9-point face stencil the
      phase-probed assembly assumes): the setup forces the exact
      per-block-column Galerkin sweep (``assembly="columns"``) and a
      dense coarse operator.

    ``params.block`` is the FINE-lattice block extent (as for the full
    system); the x extent must be even."""
    import jax.numpy as jnp

    from mgpgcr_tpu.solvers.mg import setup_mg

    mesh_h = eo_half_mesh(eo.mesh)
    rdt = (
        cplx.real_dtype(eo.links_e)
        if cplx.is_cf(eo.links_e)
        else jnp.float32
    )
    s = make_schur(eo, k, rdt)
    b = params.block
    bt, bz, by, bx = b if isinstance(b, tuple) else (b, b, b, b)
    if bx % 2:
        raise ValueError("even-odd MG needs an even x block extent")
    p = dataclasses.replace(
        params,
        block=(bt, bz, by, max(bx // 2, 1)),
        assembly="columns",
        coarse_format="dense",
        # the Pallas grid-transfer kernels are validated on full-lattice
        # planes; the compact half mesh streams through the XLA forms
        transfer_backend="xla",
    )
    mgp = setup_mg(
        key, s, mesh_h, p, layout="tpu", smoother_operator=smoother_operator
    )
    return s, mgp


def eo_sharded(eo: EvenOddWilson, device_mesh, axis_t: str = "t", axis_z: str = "z"):
    """Place the parity link sets under a T/Z ``NamedSharding`` so a jitted
    ``eo_solve`` (or Schur GCR) GSPMD-partitions over the device mesh.

    The compact parity stencil is XLA rolls/selects (ops/eo.py), so the
    partitioner inserts the halo ``collective_permute``s itself — the
    GSPMD counterpart of the hand-written shard_map path the full-system
    streaming kernel uses (ops/pallas/dslash_dist.py). Fields fed to the
    solve should carry the same sharding (use :func:`eo_field_sharding`);
    dots/norms lower to psums automatically."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    spec = P(None, None, None, axis_t, axis_z, None)
    sh = NamedSharding(device_mesh, spec)
    put = lambda x: jax.device_put(x, sh)  # noqa: E731
    return dataclasses.replace(
        eo,
        links_e=cplx.CF(put(eo.links_e.re), put(eo.links_e.im)),
        links_o=cplx.CF(put(eo.links_o.re), put(eo.links_o.im)),
    )


def eo_field_sharding(device_mesh, axis_t: str = "t", axis_z: str = "z"):
    """NamedSharding for compact parity fields (4, 3, T, Z, V/2)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    return NamedSharding(device_mesh, P(None, None, axis_t, axis_z, None))
