"""Distributed one-pass GCR iteration step (r-update + Dslash + beta dots).

The single-device mega step (ops/pallas/gcr_dslash.py) fuses

  K1r:    r' = r - alpha * aps[lim-1],  ||r'||^2
  Dslash: az = (I - k D) r'
  K2:     raw_j = <aps_j, az>,  apr_j = <aps_j, r'>,  <az, r'>

into ONE streaming pass. Round-3 gap being closed here: that kernel only
ran single-device, so the distributed fused solver (solvers/gcr_dist.py)
paid ~3 extra full-field HBM passes per iteration — the weak-scaling unit
was slower than the single-chip headline.

This variant runs the same fusion on the local shard of a (T, Z)-
decomposed lattice inside ``shard_map``. The stencil needs neighbour
planes of the UPDATED residual r', which does not exist before the kernel
runs — but r' is affine in fields the neighbours hold: the ghost planes
are computed on the owner from its r and aps[lim-1] faces as
``r'_face = r_face - alpha * ap_face`` (alpha is replicated), a one-plane
axpy, and ride the same ``ppermute`` rings as the plain distributed
Dslash (ops/pallas/dslash_dist.py). Anti-periodic temporal BCs fold into
the exchanged ghosts exactly as there, so links stay pristine SU(3) and
two-row compression composes.

The SMEM dot outputs (r2, raw, apr) are LOCAL partials: the caller
(solvers/gcr.py cycles path) psums them over the mesh axes — a few
scalars of cross-device traffic per iteration beyond the halo planes.

Reference cost anchor: the GCR iteration GCR.h:222-288 over the SpMV
Operator.h:331-346 — one iteration's full memory traffic in one kernel,
now at any device count.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mgpgcr_tpu import cplx
from mgpgcr_tpu.mesh import LatticeMesh
from mgpgcr_tpu.ops.base import LinearOperator, operator_dataclass
from mgpgcr_tpu.ops.pallas.dslash import (
    _cf_cat,
    _cf_roll,
    _cf_slice,
    _links_is_tmajor,
    _reconstruct_su3,
)
from mgpgcr_tpu.ops.pallas.dslash_dist import (
    _ring_recv_from_next,
    _ring_recv_from_prev,
    dslash_apply_local,
)
from mgpgcr_tpu.ops.wilson_tpu import (
    accumulate_half,
    colour_mul,
    project_half,
)


@operator_dataclass(
    meta=("local_mesh", "axis_t", "nt_dev", "axis_z", "nz_dev", "anti_t",
          "interpret")
)
class ShardLocalWilsonDirac(LinearOperator):
    """Per-shard Wilson--Dirac operator for use INSIDE ``shard_map``:
    ``links`` is the local t-major link shard, applies exchange one-plane
    ghost halos over the named mesh axes (ops/pallas/dslash_dist.py).
    Built by ``gcr_solve_sharded`` so the solver can recognise the
    operator and route iterations through the fused one-pass step."""

    links: cplx.CF  # (T_loc, 4, R, 3, Z_loc, V) t-major local links
    local_mesh: LatticeMesh
    axis_t: str | None = None
    nt_dev: int = 1
    axis_z: str | None = None
    nz_dev: int = 1
    anti_t: bool = False
    interpret: bool = False

    @property
    def shape(self) -> tuple[int, int]:
        n = self.local_mesh.size * self.nt_dev * self.nz_dev
        return (n, n)

    def apply(self, psi: cplx.CF) -> cplx.CF:
        return dslash_apply_local(
            self.links, psi, self.local_mesh,
            self.axis_t, self.nt_dev, self.axis_z, self.nz_dev,
            anti_t=self.anti_t, interpret=self.interpret,
        )

    def apply_dirac(self, psi: cplx.CF, k) -> cplx.CF:
        return dslash_apply_local(
            self.links, psi, self.local_mesh,
            self.axis_t, self.nt_dev, self.axis_z, self.nz_dev,
            k=cplx.ascf(k, psi.dtype), anti_t=self.anti_t,
            interpret=self.interpret,
        )


def _gcr_step_dist_kernel(
    scal_ref,      # (1, 4) SMEM: alpha.re, alpha.im, k.re, k.im
    rn_re, rn_im,  # r plane (i+1) % nt (lookahead)     (4, 3, 1, Z, V)
    r0_re, r0_im,  # r plane 0 (constant)
    an_re, an_im,  # aps[slot] plane (i+1) % nt
    a0_re, a0_im,  # aps[slot] plane 0 (constant)
    gp_re, gp_im,  # ghost r' plane "nt"  (t-next neighbour's r' plane 0)
    gm_re, gm_im,  # ghost r' plane "-1"  (t-prev neighbour's last r' plane)
    *refs,
    y: int,
    xx: int,
    nt: int,
    lim: int,
    compressed: bool,
    s_rows: int,
    z_ghost: bool,
):
    """refs tail: [as_re, as_im (lim-1 rows at plane i, if lim > 1)],
    uc_re, uc_im, gu_re, gu_im, [zp, zm, zu re/im if z_ghost],
    az_re, az_im, orp_re, orp_im, r2_ref, raw_ref, apr_ref, then scratch:
    rs_re, rs_im, asl_re, asl_im, us_re, us_im."""
    refs = list(refs)
    rs_re, rs_im, asl_re, asl_im, us_re, us_im = refs[-6:]
    del refs[-6:]
    if lim > 1:
        as_re, as_im = refs[0], refs[1]
        del refs[:2]
    if z_ghost:
        (uc_re, uc_im, gu_re, gu_im,
         zp_re, zp_im, zm_re, zm_im, zu_re, zu_im,
         az_re, az_im, orp_re, orp_im, r2_ref, raw_ref, apr_ref) = refs
    else:
        (uc_re, uc_im, gu_re, gu_im,
         az_re, az_im, orp_re, orp_im, r2_ref, raw_ref, apr_ref) = refs

    i = pl.program_id(0)
    two = jnp.asarray(2, jnp.asarray(i).dtype)
    slot2 = lax.rem(i, two)
    prev2 = lax.rem(i + 1, two)  # (i - 1) % 2
    fdt = az_re.dtype
    ar = scal_ref[0, 0]
    ai = scal_ref[0, 1]
    kr = scal_ref[0, 2]
    ki = scal_ref[0, 3]

    def rprime(r_re, r_im, ap_re, ap_im):
        nr = r_re - (ar * ap_re - ai * ap_im)
        ni = r_im - (ar * ap_im + ai * ap_re)
        return nr, ni

    def full_u(cf: cplx.CF) -> cplx.CF:
        return _reconstruct_su3(cf, fdt) if compressed else cf

    @pl.when(i == 0)
    def _prime():
        # r' plane 0 from the local faces; the t-prev ghost arrives
        # PRE-COMBINED (the owner computed r' - alpha ap on its face)
        p0r, p0i = rprime(r0_re[...], r0_im[...], a0_re[0], a0_im[0])
        rs_re[0] = p0r
        rs_im[0] = p0i
        rs_re[1] = gm_re[...]
        rs_im[1] = gm_im[...]
        asl_re[0] = a0_re[0]
        asl_im[0] = a0_im[0]
        gu = full_u(cplx.CF(gu_re[0, 0], gu_im[0, 0]))
        us_re[1] = gu.re.astype(fdt)
        us_im[1] = gu.im.astype(fdt)
        for j in range(lim, s_rows):
            raw_ref[j, 0] = jnp.zeros((), fdt)
            raw_ref[j, 1] = jnp.zeros((), fdt)

    # lookahead: local r' plane (i+1) % nt — written out and normed; the
    # STENCIL's t+1 plane at the shard's last step is the ghost instead
    nxr, nxi = rprime(rn_re[...], rn_im[...], an_re[0], an_im[0])
    orp_re[...] = nxr
    orp_im[...] = nxi

    def _acc(ref, idx, value):
        @pl.when(i == 0)
        def _():
            ref[idx] = value

        @pl.when(i != 0)
        def _():
            ref[idx] += value

    _acc(r2_ref, (0, 0), jnp.sum(nxr * nxr + nxi * nxi))

    center = cplx.CF(rs_re[slot2], rs_im[slot2])   # r' plane i
    prev = cplx.CF(rs_re[prev2], rs_im[prev2])     # r' plane i-1 (ghost at 0)
    last = (i == nt - 1)
    nxt = cplx.CF(
        jnp.where(last, gp_re[...], nxr),
        jnp.where(last, gp_im[...], nxi),
    )
    u = cplx.CF(uc_re[0], uc_im[0])
    ut_prev = cplx.CF(us_re[prev2], us_im[prev2])

    u0 = full_u(u[0])

    def u_mu(mu: int) -> cplx.CF:
        return u0 if mu == 0 else full_u(u[mu])

    v = az_re.shape[-1]
    xcoord = lax.broadcasted_iota(jnp.int32, (1, 1, 1, v), 3) % xx
    mask_last = xcoord == xx - 1
    mask_first = xcoord == 0

    def slab_where(mask, a: cplx.CF, b: cplx.CF) -> cplx.CF:
        return cplx.CF(jnp.where(mask, a.re, b.re), jnp.where(mask, a.im, b.im))

    def shift_local(vv: cplx.CF, mu: int, fwd: bool) -> cplx.CF:
        if mu == 1:
            return _cf_roll(vv, -1 if fwd else 1, 2)
        ax = 3
        if mu == 2:
            return _cf_roll(vv, -xx if fwd else xx, ax)
        if fwd:
            return slab_where(
                mask_last, _cf_roll(vv, xx - 1, ax), _cf_roll(vv, -1, ax)
            )
        return slab_where(
            mask_first, _cf_roll(vv, -(xx - 1), ax), _cf_roll(vv, 1, ax)
        )

    psi_slabs = [center[s] for s in range(4)]
    out = [None] * 4

    # t hops read the neighbour planes directly
    g = colour_mul(
        u_mu(0), project_half([nxt[s] for s in range(4)], 0, True), dagger=False
    )
    out = accumulate_half(out, g, 0, True)
    w = colour_mul(
        ut_prev, project_half([prev[s] for s in range(4)], 0, False), dagger=True
    )
    out = accumulate_half(out, w, 0, False)

    # z hop: resident roll, ghost-column splices at the shard's z edges
    zl = center.shape[3]
    uz = u_mu(1)
    h = project_half(psi_slabs, 1, True)
    if z_ghost:
        zp = cplx.CF(zp_re[...], zp_im[...])             # (4, 3, 1, 1, V)
        hz = project_half([zp[s] for s in range(4)], 1, True)
        h = [
            hh if zl == 1 else _cf_cat([_cf_slice(hq, 1, zl, 2), hh], 2)
            for hq, hh in zip(h, hz)
        ]
    else:
        h = [shift_local(hq, 1, True) for hq in h]
    g = colour_mul(uz, h, dagger=False)
    out = accumulate_half(out, g, 1, True)

    w = colour_mul(uz, project_half(psi_slabs, 1, False), dagger=True)
    if z_ghost:
        zm = cplx.CF(zm_re[...], zm_im[...])
        zu = full_u(cplx.CF(zu_re[0, 0], zu_im[0, 0]))   # (3, 3, 1, V)
        wz = colour_mul(zu, project_half([zm[s] for s in range(4)], 1, False),
                        dagger=True)
        w = [
            wh if zl == 1 else _cf_cat([wh, _cf_slice(wq, 0, zl - 1, 2)], 2)
            for wq, wh in zip(w, wz)
        ]
    else:
        w = [shift_local(wq, 1, False) for wq in w]
    out = accumulate_half(out, w, 1, False)

    for mu in (2, 3):
        um = u_mu(mu)
        h = project_half(psi_slabs, mu, True)
        h = [shift_local(hq, mu, True) for hq in h]
        g = colour_mul(um, h, dagger=False)
        out = accumulate_half(out, g, mu, True)

        w = colour_mul(um, project_half(psi_slabs, mu, False), dagger=True)
        w = [shift_local(wq, mu, False) for wq in w]
        out = accumulate_half(out, w, mu, False)

    # az = r' - k D r' (the whole DiracOp application, Operator.h:570-574)
    azs = []
    for s in range(4):
        zr = center[s].re - (kr * out[s].re - ki * out[s].im)
        zi = center[s].im - (kr * out[s].im + ki * out[s].re)
        az_re[s] = zr
        az_im[s] = zi
        azs.append((zr, zi))

    # LOCAL partial dots (caller psums): <ap_j, az>, <ap_j, r'>, <az, r'>
    for j in range(lim):
        if j == lim - 1:
            dj_re, dj_im = asl_re[slot2], asl_im[slot2]
        else:
            dj_re, dj_im = as_re[j], as_im[j]
        acc_r = jnp.zeros((), fdt)
        acc_i = jnp.zeros((), fdt)
        pr_r = jnp.zeros((), fdt)
        pr_i = jnp.zeros((), fdt)
        for s in range(4):
            zr, zi = azs[s]
            acc_r += jnp.sum(dj_re[s] * zr + dj_im[s] * zi)
            acc_i += jnp.sum(dj_re[s] * zi - dj_im[s] * zr)
            cr, ci = center[s].re, center[s].im
            pr_r += jnp.sum(dj_re[s] * cr + dj_im[s] * ci)
            pr_i += jnp.sum(dj_re[s] * ci - dj_im[s] * cr)
        _acc(raw_ref, (j, 0), acc_r)
        _acc(raw_ref, (j, 1), acc_i)
        _acc(apr_ref, (j, 0), pr_r)
        _acc(apr_ref, (j, 1), pr_i)

    zr_r = jnp.zeros((), fdt)
    zr_i = jnp.zeros((), fdt)
    for s in range(4):
        zr, zi = azs[s]
        cr, ci = center[s].re, center[s].im
        zr_r += jnp.sum(zr * cr + zi * ci)
        zr_i += jnp.sum(zr * ci - zi * cr)
    _acc(apr_ref, (s_rows, 0), zr_r)
    _acc(apr_ref, (s_rows, 1), zr_i)

    # carries for step i+1
    rs_re[prev2] = nxr
    rs_im[prev2] = nxi
    asl_re[prev2] = an_re[0]
    asl_im[prev2] = an_im[0]
    us_re[slot2] = u0.re.astype(fdt)
    us_im[slot2] = u0.im.astype(fdt)


def gcr_stream_step_local(
    links: cplx.CF,
    r: cplx.CF,
    aps: cplx.CF,
    alpha: cplx.CF,
    k: cplx.CF,
    lim: int,
    local_mesh: LatticeMesh,
    axis_t: str | None = None,
    nt_dev: int = 1,
    axis_z: str | None = None,
    nz_dev: int = 1,
    anti_t: bool = False,
    interpret: bool = False,
):
    """Per-shard fused (r', az, ||r'||^2, raw, apr) — call INSIDE
    shard_map. Scalar outputs are LOCAL partials; psum them over the mesh
    axes. ``local_mesh`` describes the shard; the local T extent must be
    even and >= 2 (scratch-slot parity)."""
    t, z, y, xx = local_mesh.spacetime_dims
    v = y * xx
    nt = t
    fdt = r.dtype
    assert _links_is_tmajor(links), "gcr step wants t-major links"
    assert t >= 2 and t % 2 == 0, "local T must be even (scratch parity)"
    nrow = links.shape[2]
    s_rows = aps.shape[0]
    slot = lim - 1

    ap_sl = aps[slot]  # (4, 3, T, Z, V) CF view of the update direction

    def rp_face(rf: cplx.CF, af: cplx.CF) -> cplx.CF:
        """r' = r - alpha * ap on a face slab (alpha is replicated)."""
        return cplx.CF(
            rf.re - (alpha.re * af.re - alpha.im * af.im),
            rf.im - (alpha.re * af.im + alpha.im * af.re),
        )

    # ---- t halos: pre-combined r' planes + one U_t plane ----
    rp_first = rp_face(r[:, :, :1], ap_sl[:, :, :1])
    rp_last = rp_face(r[:, :, t - 1 : t], ap_sl[:, :, t - 1 : t])
    ut_last = links[t - 1 : t, 0:1]  # (1, 1, R, 3, Z, V)
    if axis_t is not None and nt_dev > 1:
        ghost_tp = _ring_recv_from_next(rp_first, axis_t, nt_dev)
        ghost_tm = _ring_recv_from_prev(rp_last, axis_t, nt_dev)
        ghost_ut = _ring_recv_from_prev(ut_last, axis_t, nt_dev)
        if anti_t:
            idx = lax.axis_index(axis_t)
            s_p = jnp.where(idx == nt_dev - 1, -1.0, 1.0).astype(fdt)
            s_m = jnp.where(idx == 0, -1.0, 1.0).astype(fdt)
            ghost_tp = cplx.CF(ghost_tp.re * s_p, ghost_tp.im * s_p)
            ghost_tm = cplx.CF(ghost_tm.re * s_m, ghost_tm.im * s_m)
    else:
        ghost_tp, ghost_tm, ghost_ut = rp_first, rp_last, ut_last
        if anti_t:
            ghost_tp = -ghost_tp
            ghost_tm = -ghost_tm

    # ---- z halos: pre-combined r' columns + one U_z column ----
    z_ghost = axis_z is not None and nz_dev > 1
    if z_ghost:
        rp_zfirst = rp_face(r[:, :, :, :1], ap_sl[:, :, :, :1])
        rp_zlast = rp_face(r[:, :, :, z - 1 : z], ap_sl[:, :, :, z - 1 : z])
        uz_last = links[:, 1:2, :, :, z - 1 : z]  # (T, 1, R, 3, 1, V)
        ghost_zp = _ring_recv_from_next(rp_zfirst, axis_z, nz_dev)
        ghost_zm = _ring_recv_from_prev(rp_zlast, axis_z, nz_dev)
        ghost_uz = _ring_recv_from_prev(uz_last, axis_z, nz_dev)

    def vspec(shape, index_map):
        return pl.BlockSpec(shape, index_map, memory_space=pltpu.VMEM)

    fplane = (4, 3, 1, z, v)
    ap_plane = (1, 4, 3, 1, z, v)
    specs = [
        vspec(fplane, lambda i: (0, 0, (i + 1) % nt, 0, 0)),      # rn
        vspec(fplane, lambda i: (0, 0, 0, 0, 0)),                 # r0
        vspec(ap_plane, lambda i: (slot, 0, 0, (i + 1) % nt, 0, 0)),  # an
        vspec(ap_plane, lambda i: (slot, 0, 0, 0, 0, 0)),         # a0
        vspec(fplane, lambda i: (0, 0, 0, 0, 0)),                 # gp ghost
        vspec(fplane, lambda i: (0, 0, 0, 0, 0)),                 # gm ghost
    ]
    stack_spec = (
        [vspec((lim - 1, 4, 3, 1, z, v), lambda i: (0, 0, 0, i, 0, 0))]
        if lim > 1
        else []
    )
    link_specs = [
        vspec((1, 4, nrow, 3, z, v), lambda i: (i, 0, 0, 0, 0, 0)),   # uc
        vspec((1, 1, nrow, 3, z, v), lambda i: (0, 0, 0, 0, 0, 0)),   # gu
    ]
    zg_specs = (
        [
            vspec((4, 3, 1, 1, v), lambda i: (0, 0, i, 0, 0)),        # zp
            vspec((4, 3, 1, 1, v), lambda i: (0, 0, i, 0, 0)),        # zm
            vspec((1, 1, nrow, 3, 1, v), lambda i: (i, 0, 0, 0, 0, 0)),  # zu
        ]
        if z_ghost
        else []
    )

    in_specs = [pl.BlockSpec((1, 4), lambda i: (0, 0), memory_space=pltpu.SMEM)]
    for sp in specs + stack_spec + link_specs + zg_specs:
        in_specs += [sp, sp]

    out_specs = (
        vspec(fplane, lambda i: (0, 0, i, 0, 0)),             # az plane i
        vspec(fplane, lambda i: (0, 0, i, 0, 0)),
        vspec(fplane, lambda i: (0, 0, (i + 1) % nt, 0, 0)),  # r' plane i+1
        vspec(fplane, lambda i: (0, 0, (i + 1) % nt, 0, 0)),
        pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((s_rows, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((s_rows + 1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
    )

    scal = jnp.stack(
        [
            jnp.asarray(alpha.re, fdt),
            jnp.asarray(alpha.im, fdt),
            jnp.asarray(k.re, fdt),
            jnp.asarray(k.im, fdt),
        ]
    ).reshape(1, 4)

    aps_s = aps.re.reshape(s_rows, 4, 3, t, z, v)
    aps_i = aps.im.reshape(s_rows, 4, 3, t, z, v)
    args = [scal]
    args += [r.re, r.im, r.re, r.im]
    args += [aps_s, aps_i, aps_s, aps_i]
    args += [ghost_tp.re, ghost_tp.im, ghost_tm.re, ghost_tm.im]
    if lim > 1:
        args += [aps_s, aps_i]
    args += [links.re, links.im, ghost_ut.re, ghost_ut.im]
    if z_ghost:
        args += [ghost_zp.re, ghost_zp.im, ghost_zm.re, ghost_zm.im,
                 ghost_uz.re, ghost_uz.im]

    kernel = functools.partial(
        _gcr_step_dist_kernel,
        y=y,
        xx=xx,
        nt=nt,
        lim=lim,
        compressed=nrow == 2,
        s_rows=s_rows,
        z_ghost=z_ghost,
    )
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=121 * 1024 * 1024
        )
    az_re, az_im, orp_re, orp_im, r2, raw, apr = pl.pallas_call(
        kernel,
        grid=(nt,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=(
            jax.ShapeDtypeStruct(r.re.shape, fdt),
            jax.ShapeDtypeStruct(r.re.shape, fdt),
            jax.ShapeDtypeStruct(r.re.shape, fdt),
            jax.ShapeDtypeStruct(r.re.shape, fdt),
            jax.ShapeDtypeStruct((1, 1), fdt),
            jax.ShapeDtypeStruct((s_rows, 2), fdt),
            jax.ShapeDtypeStruct((s_rows + 1, 2), fdt),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, 4, 3, 1, z, v), fdt),
            pltpu.VMEM((2, 4, 3, 1, z, v), fdt),
            pltpu.VMEM((2, 4, 3, 1, z, v), fdt),
            pltpu.VMEM((2, 4, 3, 1, z, v), fdt),
            pltpu.VMEM((2, 3, 3, z, v), fdt),
            pltpu.VMEM((2, 3, 3, z, v), fdt),
        ],
        interpret=interpret,
        **kwargs,
    )(*args)
    rp = cplx.CF(orp_re, orp_im)
    az = cplx.CF(az_re, az_im)
    raw_cf = cplx.CF(raw[:, 0], raw[:, 1])
    apr_cf = cplx.CF(apr[:, 0], apr[:, 1])
    return rp, az, r2[0, 0], raw_cf, apr_cf
