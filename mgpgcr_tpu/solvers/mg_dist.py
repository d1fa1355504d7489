"""Device-mesh-sharded MG setup + distributed MG-preconditioned GCR.

Closes the round-2 gap "setup_mg runs on one device's memory": every phase
of the adaptive-MG setup (reference ``MG::initialise``, MG.h:132-285) runs
on LOCAL lattice shards inside ``shard_map`` over the same device mesh the
production streaming Dslash is decomposed on (ops/pallas/dslash_dist.py):

- **near-null vectors** (MG.h:139-143): ``inverse_power_vectors`` with
  ``axis_names`` set — every GCR solve inside it runs the per-shard fused
  kernels with psummed scalar dots (solvers/gcr.py ``_allsum``);
- **chiral doubling + per-block orthonormalisation** (MG.h:146-198): MG
  blocks never straddle shard boundaries (the block extent must divide the
  per-shard lattice), so both are embarrassingly shard-local;
- **Galerkin coarse assembly**: the phase-probed O(9·ne) assembly
  (solvers/mg.py ``galerkin_coarse_blocks``) with the probe phases
  evaluated at GLOBAL block coordinates (device offset from
  ``lax.axis_index``); the Vandermonde disentangling algebra
  (``stencil_from_probes``) is elementwise per coarse row, hence
  sharding-agnostic. The only cross-device traffic is the operator's own
  ghost-plane halo exchange inside each probe.

The coarse level (nc = n_blocks · ne, e.g. 32768 at 32^4/block 4, ne=8) is
small; its stencil blocks are ``all_gather``-ed once at setup and the
coarse solve runs REPLICATED on every device inside the V-cycle — no
per-iteration communication beyond one coarse-rhs all_gather. Multi-level
(n_level > 2) hierarchies reuse the single-device ``setup_mg`` on the
replicated coarse operator.

Reference being scaled out: MG.h:206-278 (the 14-thread OpenMP assembly).
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import PartitionSpec as P

from mgpgcr_tpu import cplx
from mgpgcr_tpu.mesh import LatticeMesh
from mgpgcr_tpu.ops.base import LinearOperator
from mgpgcr_tpu.ops.dirac import DiracOperator
from mgpgcr_tpu.ops.pallas.dslash import PallasWilsonDirac
from mgpgcr_tpu.solvers.gcr import gcr_solve
from mgpgcr_tpu.solvers.mg import (
    MGPreconditioner,
    build_coarse_operator,
    chiral_double,
    block_orthonormalize,
    coarse_gamma5_fn,
    prolong,
    restrict,
    setup_mg,
    stencil_from_probes,
)
from mgpgcr_tpu.solvers.params import GCRParams, MGParams
from mgpgcr_tpu.solvers.power import inverse_power_vectors
from mgpgcr_tpu.solvers.result import SolveResult


def _unwrap(a):
    """(d, k) from a DiracOperator-wrapped or bare sharded Dslash."""
    if isinstance(a, DiracOperator):
        d, k = a.d, a.k
    else:
        d, k = a, None
    if not isinstance(d, PallasWilsonDirac) or d.device_mesh is None:
        raise ValueError(
            "sharded MG wants a PallasWilsonDirac built with build_sharded"
        )
    return d, k


def _all_gather_cf(x, axis_name: str, axis: int):
    return jax.tree.map(
        lambda v: lax.all_gather(v, axis_name, axis=axis, tiled=True), x
    )


@dataclasses.dataclass(frozen=True)
class _Geom:
    """Static shard/block geometry shared by setup and apply."""

    mesh: LatticeMesh  # global
    local_mesh: LatticeMesh
    block: tuple[int, ...]
    bpd: tuple[int, ...]  # global blocks per dim (Bt, Bz, By, Bx)
    bpd_loc: tuple[int, ...]
    axis_t: str | None
    axis_z: str | None
    ntd: int
    nzd: int

    @property
    def names(self) -> tuple:
        return tuple(n for n in (self.axis_t, self.axis_z) if n is not None)

    @property
    def nb(self) -> int:
        return math.prod(self.bpd)

    @property
    def nb_loc(self) -> int:
        return math.prod(self.bpd_loc)

    @property
    def byx(self) -> int:
        return self.bpd_loc[2] * self.bpd_loc[3]

    def local_block_map(self):
        return self.local_mesh.blocking(self.block)

    def q_spec(self):
        """(ne, Bt, Bz, By*Bx, bl) partition spec."""
        return P(None, self.axis_t, self.axis_z, None, None)

    def gather_blocked(self, x):
        """Local (Bt_loc, Bz_loc, rest...) -> global-ordered (Bt, Bz, ...).
        z is gathered first so the row-major (bt, bz, by, bx) flat block
        order of mesh.BlockMap is reproduced exactly."""
        if self.axis_z is not None:
            x = _all_gather_cf(x, self.axis_z, 1)
        if self.axis_t is not None:
            x = _all_gather_cf(x, self.axis_t, 0)
        return x

    def local_coarse_slice(self, xc_blocked):
        """Replicated (Bt, Bz, By*Bx, ne) -> this shard's block rows."""
        it = lax.axis_index(self.axis_t) if self.axis_t else 0
        iz = lax.axis_index(self.axis_z) if self.axis_z else 0
        bt_loc, bz_loc = self.bpd_loc[0], self.bpd_loc[1]
        ne = xc_blocked.shape[-1]
        starts = tuple(
            jnp.asarray(s, jnp.int32)
            for s in (it * bt_loc, iz * bz_loc, 0, 0)
        )
        sizes = (bt_loc, bz_loc, self.byx, ne)
        return jax.tree.map(
            lambda v: lax.dynamic_slice(v, starts, sizes), xc_blocked
        )


def _pshift_cf(x, axis_name: str, ndev: int, shift: int):
    """ppermute a pytree: data at mesh index j lands at (j + shift) % ndev."""
    perm = [(j, (j + shift) % ndev) for j in range(ndev)]
    return jax.tree.map(lambda v: lax.ppermute(v, axis_name, perm), x)


def _plane(xg, axis: int, idx: int):
    return jax.tree.map(
        lambda v: lax.slice_in_dim(v, idx, idx + 1, axis=axis), xg
    )


def _replace_plane(xg, axis: int, idx: int, plane, n_loc: int):
    """xg with plane ``idx`` (0 or n_loc-1) replaced — concatenation form
    (boundary-only, avoids a scatter)."""
    if n_loc == 1:
        return plane
    body = (
        jax.tree.map(lambda v: lax.slice_in_dim(v, 1, n_loc, axis=axis), xg)
        if idx == 0
        else jax.tree.map(
            lambda v: lax.slice_in_dim(v, 0, n_loc - 1, axis=axis), xg
        )
    )
    parts = [plane, body] if idx == 0 else [body, plane]
    return cplx.concatenate(parts, axis=axis)


@dataclasses.dataclass(frozen=True)
class ShardLocalCoarseStencil(LinearOperator):
    """Shard-LOCAL 9-point Galerkin coarse operator over the block lattice.

    The coarse grid inherits the fine grid's (axis_t, axis_z) domain
    decomposition — each device owns its own blocks' stencil rows
    (bt_loc, bz_loc, by*bx, 9, ne, ne) and coarse dof, so the coarse
    SOLVE distributes too: stencil halos are one-block-plane ppermutes,
    GCR dots psum over the mesh axes, and the per-V-cycle coarse-rhs
    ``all_gather`` of the replicated design disappears along with the
    ndev-redundant solve (reference hot loop being scaled:
    HierarchicalSparse.h:102-161). Apply contract: local flat
    (nb_loc * ne,) -> same, inside shard_map."""

    blocks: cplx.CF  # (bt_loc, bz_loc, by*bx, 9, ne, ne) local rows
    geom: _Geom

    @property
    def ne(self) -> int:
        return self.blocks.shape[-1]

    @property
    def shape(self) -> tuple[int, int]:
        n = self.geom.nb * self.ne  # global dimension
        return (n, n)

    def _shift(self, xg, d: int, sgn: int):
        """Neighbour-block values at coord + sgn along grid axis d of the
        local (bt, bz, by, bx, ne) coarse field; t/z cross shards."""
        g = self.geom
        name, ndev = (
            (g.axis_t, g.ntd)
            if d == 0
            else (g.axis_z, g.nzd) if d == 1 else (None, 1)
        )
        rolled = cplx.roll(xg, -sgn, d)
        if name is None or ndev <= 1:
            return rolled
        n_loc = g.bpd_loc[d]
        if sgn > 0:
            # +mu: the last local plane's neighbour is the NEXT shard's
            # first plane (ppermute source j -> dest j-1)
            ghost = _pshift_cf(_plane(xg, d, 0), name, ndev, -1)
            return _replace_plane(rolled, d, n_loc - 1, ghost, n_loc)
        ghost = _pshift_cf(_plane(xg, d, n_loc - 1), name, ndev, +1)
        return _replace_plane(rolled, d, 0, ghost, n_loc)

    def apply(self, x):
        g = self.geom
        ne = self.ne
        bt, bz, by, bx = g.bpd_loc
        xg = x.reshape(bt, bz, by, bx, ne)
        bg = self.blocks.reshape(bt, bz, by, bx, 9, ne, ne)
        eq = "abcdij,abcdj->abcdi"
        y = cplx.einsum2(eq, bg[..., 0, :, :], xg)
        for d in range(4):
            y = y + cplx.einsum2(
                eq, bg[..., 1 + 2 * d, :, :], self._shift(xg, d, +1)
            )
            y = y + cplx.einsum2(
                eq, bg[..., 2 + 2 * d, :, :], self._shift(xg, d, -1)
            )
        return y.reshape(x.shape)


jax.tree_util.register_dataclass(
    ShardLocalCoarseStencil, data_fields=["blocks"], meta_fields=["geom"]
)


def _geometry(d: PallasWilsonDirac, block) -> _Geom:
    mesh = d.mesh
    if isinstance(block, int):
        block = (block,) * 4
    block = tuple(int(b) for b in block)
    lm = d.local_mesh()
    for dim, b in zip(lm.spacetime_dims, block):
        if dim % b:
            raise ValueError(
                f"MG block extent {block} must divide the PER-SHARD lattice "
                f"{lm.spacetime_dims} (blocks may not straddle shards)"
            )
    bpd = tuple(
        dd // b for dd, b in zip(mesh.spacetime_dims, block)
    )
    bpd_loc = tuple(dd // b for dd, b in zip(lm.spacetime_dims, block))
    return _Geom(
        mesh=mesh,
        local_mesh=lm,
        block=block,
        bpd=bpd,
        bpd_loc=bpd_loc,
        axis_t=d.axis_t,
        axis_z=d.axis_z,
        ntd=d._axis_size(d.axis_t),
        nzd=d._axis_size(d.axis_z),
    )


def _local_operator(d: PallasWilsonDirac, links, k):
    from mgpgcr_tpu.ops.pallas.gcr_dslash_dist import ShardLocalWilsonDirac

    local = ShardLocalWilsonDirac(
        links,
        d.local_mesh(),
        d.axis_t,
        d._axis_size(d.axis_t),
        d.axis_z,
        d._axis_size(d.axis_z),
        d.anti_t,
        d.interpret,
    )
    return DiracOperator(local, k) if k is not None else local


def _chi_local(geom: _Geom, p, rdt):
    """Root-of-unity probe phase chi_p at GLOBAL block coordinates,
    evaluated for this shard's local blocks: the static local-grid part
    plus the device-offset phase (a traced scalar from axis_index)."""
    grids = np.indices(geom.bpd_loc)  # (4, Bt_loc, Bz_loc, By, Bx)
    theta_static = sum(
        2.0 * np.pi * p[mu] * grids[mu] / geom.bpd[mu] for mu in range(4)
    )
    theta = jnp.asarray(
        np.asarray(theta_static, np.float64).reshape(-1), rdt
    )  # (nb_loc,)
    it = lax.axis_index(geom.axis_t) if geom.axis_t else 0
    iz = lax.axis_index(geom.axis_z) if geom.axis_z else 0
    off = (
        2.0 * np.pi * p[0] * geom.bpd_loc[0] / geom.bpd[0] * it
        + 2.0 * np.pi * p[1] * geom.bpd_loc[1] / geom.bpd[1] * iz
    )
    theta = theta + jnp.asarray(off, rdt)
    return cplx.CF(jnp.cos(theta), jnp.sin(theta))


def _galerkin_blocks_local(a_loc, q, geom: _Geom):
    """Per-shard phase-probed Galerkin assembly -> LOCAL stencil blocks
    (nb_loc, 9, ne, ne). Same probe algebra as the single-device
    ``galerkin_coarse_blocks`` (solvers/mg.py) with globally-correct
    phases; each probe's operator apply exchanges its own halos."""
    lbm = geom.local_block_map()
    ne, nb_loc, _bl = q.shape
    rdt = q.dtype

    def measure(p):
        chi = _chi_local(geom, p, rdt).reshape(1, nb_loc, 1)
        basis = q * chi  # (ne, nb_loc, bl)

        def one(col):  # (nb_loc, bl) -> (nb_loc, ne)
            f = lbm.from_blocked_tpu(col)
            fb = lbm.to_blocked_tpu(a_loc.apply(f))
            return cplx.einsum2("ebk,bk->be", cplx.conj(q), fb)

        rbb = jax.lax.map(one, basis)  # (ne, nb_loc, ne)
        rbb = rbb * cplx.conj(chi)
        return cplx.transpose(rbb, (1, 2, 0))  # (nb_loc, f_row, e_col)

    slots = stencil_from_probes(measure, geom.bpd)
    return cplx.stack(slots, axis=1)  # (nb_loc, 9, ne, ne)


# ---------------------------------------------------------------------------
# the sharded preconditioner
# ---------------------------------------------------------------------------
@dataclasses.dataclass(frozen=True)
class ShardedMGPreconditioner:
    """MG preconditioner whose fine level lives on device-mesh shards.

    ``q5`` is the per-block orthonormal basis in shard-respecting blocked
    layout (ne, Bt, Bz, By*Bx, block_len), sharded over (axis_t, axis_z);
    ``coarse`` (and the optional deeper ``coarse_precond`` hierarchy) is
    replicated. ``apply`` runs standalone (own shard_map, for parity
    tests); ``local_apply`` is the form the distributed solve driver
    (``mg_gcr_solve_sharded``) calls on local shards.
    """

    a: LinearOperator  # DiracOperator over the sharded PallasWilsonDirac
    q5: cplx.CF  # (ne, Bt, Bz, By*Bx, bl), sharded
    coarse: LinearOperator  # replicated dense / block-ELL Galerkin op
    geom: _Geom
    params: MGParams
    coarse_precond: MGPreconditioner | None = None

    # -- local-shard V-cycle ------------------------------------------------
    def _coarse_correct(self, q, r, coarse, coarse_precond):
        g = self.geom
        lbm = g.local_block_map()
        ne = q.shape[0]
        rc = restrict(q, lbm, r, "tpu")  # (nb_loc * ne,)
        if isinstance(coarse, ShardLocalCoarseStencil):
            # sharded coarse level: no all_gather, no redundant solve —
            # the coarse GCR runs on local block rows with psummed dots
            # and ppermute stencil halos
            cp = None
            if coarse_precond is not None:
                # n_level > 2: deeper levels are replicated (coarse grids
                # are small). Boundary = one coarse-DOF all_gather per
                # preconditioner application — nb*ne values, orders of
                # magnitude below the fine-level gather the sharded
                # stencil design eliminated
                ne_c = coarse.ne

                def cp(rc_p):
                    blocked = rc_p.reshape(
                        g.bpd_loc[0], g.bpd_loc[1], g.byx, ne_c
                    )
                    rep = g.gather_blocked(blocked).reshape(g.nb * ne_c)
                    ec_rep = coarse_precond.apply(rep)
                    return g.local_coarse_slice(
                        ec_rep.reshape(g.bpd[0], g.bpd[1], g.byx, ne_c)
                    ).reshape(g.nb_loc * ne_c)

            ec_loc = gcr_solve(
                coarse, rc, self.params.coarse_gcr, axis_names=g.names,
                precond=cp,
            ).x
        else:
            rc5 = rc.reshape(g.bpd_loc[0], g.bpd_loc[1], g.byx, ne)
            rc_g = g.gather_blocked(rc5)  # (Bt, Bz, ByBx, ne) replicated
            cp = coarse_precond.apply if coarse_precond is not None else None
            ec = gcr_solve(
                coarse,
                rc_g.reshape(g.nb * ne),
                self.params.coarse_gcr,
                precond=cp,
            ).x  # replicated: identical on every device, no collectives
            ec_loc = g.local_coarse_slice(
                ec.reshape(g.bpd[0], g.bpd[1], g.byx, ne)
            ).reshape(g.nb_loc * ne)
        corr = prolong(q, lbm, ec_loc, "tpu")
        return cplx.scale_real(
            corr,
            jnp.asarray(self.params.correction_damping, cplx.real_dtype(r)),
        )

    def _smooth(self, a_loc, rhs, x, n: int):
        sp = self.params.smoother_gcr
        if sp is None or n == 0:
            return x
        names = self.geom.names
        for _ in range(n):
            r = rhs - a_loc.apply(x)
            x = x + gcr_solve(a_loc, r, sp, axis_names=names).x
        return x

    def local_apply(self, a_loc, q5_loc, coarse, coarse_precond, r):
        """One V-cycle / additive coarse deflation on LOCAL shards (the
        same cycle as MGPreconditioner.apply, solvers/mg.py)."""
        g = self.geom
        ne = q5_loc.shape[0]
        q = q5_loc.reshape(ne, g.nb_loc, q5_loc.shape[-1])
        if self.params.smoother_gcr is None:
            return r + self._coarse_correct(q, r, coarse, coarse_precond)
        x = cplx.zeros_like(r)
        x = self._smooth(a_loc, r, x, self.params.n_pre_smooth)
        x = x + self._coarse_correct(
            q, r - a_loc.apply(x), coarse, coarse_precond
        )
        x = self._smooth(a_loc, r, x, self.params.n_post_smooth)
        return x

    def _coarse_spec(self):
        """Partition spec for the coarse operator through shard_map:
        sharded block rows for the ShardLocalCoarseStencil, replicated
        otherwise."""
        if isinstance(self.coarse, ShardLocalCoarseStencil):
            return P(self.geom.axis_t, self.geom.axis_z)
        return P()

    # -- standalone apply on globally-sharded fields --------------------------
    def apply(self, r):
        """Precondition a (4,3,T,Z,V) field laid out per the operator's
        sharding (drop-in for MGPreconditioner.apply; jit recommended)."""
        d, k = _unwrap(self.a)
        g = self.geom
        fspec = d._field_spec()

        def local(links, kk, q5_loc, coarse, cp, r_loc):
            a_loc = _local_operator(d, links, kk)
            return self.local_apply(a_loc, q5_loc, coarse, cp, r_loc)

        fn = jax.shard_map(
            local,
            mesh=d.device_mesh,
            in_specs=(
                d._links_spec(), P(), g.q_spec(), self._coarse_spec(), P(),
                fspec,
            ),
            out_specs=fspec,
            check_vma=False,
        )
        return fn(d.links, k, self.q5, self.coarse, self.coarse_precond, r)

    def as_preconditioner(self):
        return self.apply


jax.tree_util.register_dataclass(
    ShardedMGPreconditioner,
    data_fields=["a", "q5", "coarse", "coarse_precond"],
    meta_fields=["geom", "params"],
)


# ---------------------------------------------------------------------------
# setup
# ---------------------------------------------------------------------------
def setup_mg_sharded(
    key: jax.Array,
    a: LinearOperator,
    params: MGParams,
    b0: cplx.CF | None = None,
) -> ShardedMGPreconditioner:
    """Adaptive-MG setup over the operator's device mesh.

    ``a``: a ``DiracOperator`` wrapping ``PallasWilsonDirac.build_sharded``
    (or such an operator bare). The MG block extent must divide the
    per-shard lattice. ``b0`` optionally seeds the power iteration (a
    global (4,3,T,Z,V) CF field; it is sharded here) — with the same seed
    field this produces the same hierarchy as the single-device
    ``setup_mg`` up to reduction-order rounding, which is the parity
    contract tests/test_mg_dist.py checks.
    """
    d, k = _unwrap(a)
    geom = _geometry(d, params.block)
    names = geom.names
    lm = geom.local_mesh
    lbm = geom.local_block_map()
    rdt = d.links.dtype
    ne = 2 * params.n_nullvecs

    t, z, y, xx = geom.mesh.spacetime_dims
    if b0 is None:
        b0 = cplx.random(key, (4, 3, t, z, y * xx), rdt)
    b0 = d.shard_field(b0)
    fspec = d._field_spec()
    lspec = d._links_spec()

    # -- phase A: near-null vectors + doubling + block orthonormalisation --
    def _setup_local(links, kk, b0_loc):
        a_loc = _local_operator(d, links, kk)
        vecs = inverse_power_vectors(
            a_loc,
            b0_loc,
            params.n_nullvecs,
            params.setup_gcr,
            params.setup_power_iters,
            axis_names=names,
        )
        doubled = chiral_double(vecs, lm, "tpu")
        q = block_orthonormalize(doubled, lbm, "tpu")  # (ne, nb_loc, bl)
        return q.reshape(
            ne, geom.bpd_loc[0], geom.bpd_loc[1], geom.byx, lbm.block_len
        )

    q5 = jax.jit(
        jax.shard_map(
            _setup_local,
            mesh=d.device_mesh,
            in_specs=(lspec, P(), fspec),
            out_specs=geom.q_spec(),
            check_vma=False,
        )
    )(d.links, k, b0)

    # -- phase B: phase-probed Galerkin assembly. coarse_format="stencil"
    # keeps each shard's stencil rows LOCAL (the coarse level then
    # distributes: sharded coarse solve, no per-V-cycle all_gather);
    # other formats gather to a replicated coarse operator --
    coarse_sharded = params.coarse_format == "stencil"

    def _galerkin_local(links, kk, q5_loc):
        a_loc = _local_operator(d, links, kk)
        q = q5_loc.reshape(ne, geom.nb_loc, lbm.block_len)
        blocks = _galerkin_blocks_local(a_loc, q, geom)  # (nb_loc, 9, ne, ne)
        b6 = blocks.reshape(
            geom.bpd_loc[0], geom.bpd_loc[1], geom.byx, 9, ne, ne
        )
        if coarse_sharded:
            return b6
        return geom.gather_blocked(b6).reshape(geom.nb, 9, ne, ne)

    blocks_spec = (
        P(geom.axis_t, geom.axis_z) if coarse_sharded else P()
    )
    blocks = jax.jit(
        jax.shard_map(
            _galerkin_local,
            mesh=d.device_mesh,
            in_specs=(lspec, P(), geom.q_spec()),
            out_specs=blocks_spec,
            check_vma=False,
        )
    )(d.links, k, q5)

    if coarse_sharded:
        coarse = ShardLocalCoarseStencil(blocks, geom)
    else:
        gbm = geom.mesh.blocking(geom.block)
        table = jnp.asarray(gbm.neighbor_table(), jnp.int32)
        coarse = build_coarse_operator(
            blocks, table, params.coarse_format, geom.bpd
        )

    # -- deeper levels: replicated (coarse grids are small), so the
    # regular single-device setup builds the rest of the hierarchy. For
    # the sharded stencil coarse, the SAME global blocks array (the
    # shard-local rows viewed globally, row-major (bt,bz,by,bx) order)
    # backs a replicated operator used ONLY by levels >= 3; level 2's
    # solve stays fully sharded and applies the deeper correction through
    # a coarse-DOF gather/slice (see _coarse_correct) --
    coarse_precond = None
    if params.n_level > 2:
        cb = params.coarse_block
        if all(dd % cb == 0 and dd >= cb for dd in geom.bpd) and (
            cb**4 * ne >= ne
        ):
            if coarse_sharded:
                gbm = geom.mesh.blocking(geom.block)
                table = jnp.asarray(gbm.neighbor_table(), jnp.int32)
                deeper_fine = build_coarse_operator(
                    blocks.reshape(geom.nb, 9, ne, ne),
                    table,
                    "stencil",
                    geom.bpd,
                )
            else:
                deeper_fine = coarse
            coarse_mesh = LatticeMesh((*geom.bpd, ne), n_spacetime=4)
            key, sub = jax.random.split(key)
            coarse_precond = setup_mg(
                sub,
                deeper_fine,
                coarse_mesh,
                params,
                layout="flat",
                gamma5_fn=coarse_gamma5_fn(ne),
                _level=2,
                _cf=True,
            )

    return ShardedMGPreconditioner(
        a=a if isinstance(a, DiracOperator) else d,
        q5=q5,
        coarse=coarse,
        geom=geom,
        params=params,
        coarse_precond=coarse_precond,
    )


# ---------------------------------------------------------------------------
# distributed MG-GCR driver
# ---------------------------------------------------------------------------
def mg_gcr_solve_sharded(
    rhs,
    params: GCRParams,
    mgp: ShardedMGPreconditioner,
    x0=None,
    fused: bool | None = None,
) -> SolveResult:
    """The production distributed solve: the WHOLE MG-preconditioned GCR
    inside one shard_map — per-shard streaming Dslash + fused iteration
    kernels (gcr_solve_sharded's path) with the V-cycle of ``mgp`` as the
    flexible right preconditioner on local shards. Per-iteration
    cross-device traffic: the operator halos, a few psummed scalars, and
    one coarse-rhs all_gather inside the V-cycle."""
    d, k = _unwrap(mgp.a)
    geom = mgp.geom
    fspec = d._field_spec()

    args = [d.links, rhs, mgp.q5, mgp.coarse, mgp.coarse_precond]
    specs = [d._links_spec(), fspec, geom.q_spec(), mgp._coarse_spec(), P()]
    if k is not None:
        args.append(k)
        specs.append(P())
    if x0 is not None:
        args.append(x0)
        specs.append(fspec)

    def local_solve(*ops):
        it = iter(ops)
        links = next(it)
        rhs_loc = next(it)
        q5_loc = next(it)
        coarse = next(it)
        cp = next(it)
        k_loc = next(it) if k is not None else None
        x0_loc = next(it) if x0 is not None else None
        a_loc = _local_operator(d, links, k_loc)

        def precond(r):
            return mgp.local_apply(a_loc, q5_loc, coarse, cp, r)

        return gcr_solve(
            a_loc,
            rhs_loc,
            params,
            precond=precond,
            x0=x0_loc,
            fused=fused,
            axis_names=geom.names,
        )

    out_specs = SolveResult(
        x=fspec, converged=P(), n_iters=P(), final_relres=P(),
        res_history=P(),
    )
    fn = jax.shard_map(
        local_solve,
        mesh=d.device_mesh,
        in_specs=tuple(specs),
        out_specs=out_specs,
        check_vma=False,
    )
    return fn(*args)
