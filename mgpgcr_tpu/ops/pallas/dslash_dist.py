"""Domain-decomposed streaming Wilson--Dirac Pallas kernel.

Round 2 left the production t-plane streaming kernel (ops/pallas/dslash.py)
single-device: every multi-chip solve fell back to the ~6x slower XLA slab
stencil. This module runs the SAME streaming formulation on the local shard
of a (T, Z)-decomposed lattice inside ``shard_map``:

- one-plane psi/U_t halos are exchanged over the device mesh with
  ``lax.ppermute`` (ICI ring, parallel/halo.py semantics) BEFORE the kernel
  launch, so XLA can overlap the face transfers with anything else in
  flight;
- the kernel consumes the halos as extra constant-index windows — exactly
  the shape of the periodic-wrap windows the single-device kernel already
  primes itself with (dslash.py:367-371), so per-plane HBM traffic and the
  carried-plane scratch pipeline are unchanged;
- a sharded z axis additionally passes per-t-plane ghost z-columns; the
  in-kernel z rolls then splice the ghost plane in place of the wrapped
  one (the same splice the z-blocked halo kernel uses, dslash.py:148-177).

Anti-periodic temporal BCs cross device boundaries here, not kernel-local
wrap: the sign is folded into the exchanged psi ghost planes on the devices
that own the global t edge, so the kernel and the stored links stay
BC-agnostic (and two-row link compression composes, see dslash.py).

Reference cost anchor being scaled out: the SpMV inside GCR.h:222-288 /
Operator.h:331-346 — the per-iteration cost model of the whole solver.
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
from mgpgcr_tpu.ops.pallas.dslash import (
    _cf_cat,
    _cf_roll,
    _cf_slice,
    _links_is_tmajor,
    _reconstruct_su3,
)
from mgpgcr_tpu.ops.wilson_tpu import (
    accumulate_half,
    colour_mul,
    project_half,
)


def _dslash_stream_dist_kernel(
    k_ref,           # (1, 2) SMEM: complex k of A = I - k D (0 if unfused)
    pn_re, pn_im,    # psi plane (i+1) % nt (lookahead; ghosted at i=nt-1)
    pf_re, pf_im,    # psi plane 0 (priming window)
    gp_re, gp_im,    # ghost psi plane "nt" (t-next neighbour's plane 0)
    gm_re, gm_im,    # ghost psi plane "-1" (t-prev neighbour's last plane)
    uc_re, uc_im,    # links plane i                  (1, 4, R, 3, Z, V)
    gu_re, gu_im,    # ghost U_t plane "-1"           (1, 1, R, 3, Z, V)
    *rest,
    y: int,
    xx: int,
    nt: int,
    fuse_dirac: bool,
    compressed: bool,
    z_ghost: bool,
):
    """Per-shard streaming Dslash with explicit halo windows.

    Same plane pipeline as dslash.py's ``_dslash_stream_kernel`` — one new
    psi plane + one links plane per step, center/t-1 planes carried in VMEM
    scratch — but the periodic-wrap windows are replaced by neighbour-shard
    ghosts, and (with ``z_ghost``) the z rolls splice per-plane ghost
    columns at the shard's z edges."""
    if z_ghost:
        (zp_re, zp_im, zm_re, zm_im, zu_re, zu_im,
         out_re, out_im, ps_re, ps_im, us_re, us_im) = rest
    else:
        (out_re, out_im, ps_re, ps_im, us_re, us_im) = rest

    i = pl.program_id(0)
    two = jnp.asarray(2, jnp.asarray(i).dtype)
    slot = lax.rem(i, two)
    prev_slot = lax.rem(i + 1, two)
    fdt = out_re.dtype

    def full_u(cf: cplx.CF) -> cplx.CF:
        return _reconstruct_su3(cf, fdt) if compressed else cf

    @pl.when(i == 0)
    def _prime():
        ps_re[0] = pf_re[...]
        ps_im[0] = pf_im[...]
        ps_re[1] = gm_re[...]
        ps_im[1] = gm_im[...]
        gu = full_u(cplx.CF(gu_re[0, 0], gu_im[0, 0]))
        us_re[1] = gu.re.astype(fdt)
        us_im[1] = gu.im.astype(fdt)

    center = cplx.CF(ps_re[slot], ps_im[slot])           # (4, 3, 1, Z, V)
    prev = cplx.CF(ps_re[prev_slot], ps_im[prev_slot])
    # lookahead: the (i+1) % nt window is the WRONG plane at the shard's
    # last step — substitute the t-next neighbour's ghost there
    last = (i == nt - 1)
    nxt = cplx.CF(
        jnp.where(last, gp_re[...], pn_re[...]),
        jnp.where(last, gp_im[...], pn_im[...]),
    )
    u = cplx.CF(uc_re[0], uc_im[0])                      # (4, R, 3, Z, V)
    ut_prev = cplx.CF(us_re[prev_slot], us_im[prev_slot])

    u0 = full_u(u[0])

    def u_mu(mu: int) -> cplx.CF:
        return u0 if mu == 0 else full_u(u[mu])

    v = out_re.shape[-1]
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

    # z hop: resident roll, with ghost-column splices at the shard edges
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

    # y / x hops are always shard-local (y is only decomposed on the XLA
    # slab path; x never is)
    for mu in (2, 3):
        um = u_mu(mu)
        h = project_half(psi_slabs, mu, True)
        h = [shift_local(hq, mu, True) for hq in h]
        g = colour_mul(um, h, dagger=False)
        out = accumulate_half(out, g, mu, True)

        w = colour_mul(um, project_half(psi_slabs, mu, False), dagger=True)
        w = [shift_local(wq, mu, False) for wq in w]
        out = accumulate_half(out, w, mu, False)

    if fuse_dirac:
        kr = k_ref[0, 0]
        ki = k_ref[0, 1]
        for s in range(4):
            out_re[s] = center[s].re - (kr * out[s].re - ki * out[s].im)
            out_im[s] = center[s].im - (kr * out[s].im + ki * out[s].re)
    else:
        for s in range(4):
            out_re[s] = out[s].re
            out_im[s] = out[s].im

    ps_re[prev_slot] = nxt.re
    ps_im[prev_slot] = nxt.im
    us_re[slot] = u0.re.astype(fdt)
    us_im[slot] = u0.im.astype(fdt)

def _ring_recv_from_next(x, axis_name: str, n: int):
    """Each device receives ``x`` from its ring successor (j <- j+1)."""
    if cplx.is_cf(x):
        return cplx.CF(
            _ring_recv_from_next(x.re, axis_name, n),
            _ring_recv_from_next(x.im, axis_name, n),
        )
    return lax.ppermute(x, axis_name, [(i, (i - 1) % n) for i in range(n)])


def _ring_recv_from_prev(x, axis_name: str, n: int):
    """Each device receives ``x`` from its ring predecessor (j <- j-1)."""
    if cplx.is_cf(x):
        return cplx.CF(
            _ring_recv_from_prev(x.re, axis_name, n),
            _ring_recv_from_prev(x.im, axis_name, n),
        )
    return lax.ppermute(x, axis_name, [(i, (i + 1) % n) for i in range(n)])


def dslash_apply_local(
    links: cplx.CF,
    psi: cplx.CF,
    local_mesh: LatticeMesh,
    axis_t: str | None = None,
    nt_dev: int = 1,
    axis_z: str | None = None,
    nz_dev: int = 1,
    k: cplx.CF | None = None,
    anti_t: bool = False,
    interpret: bool = False,
) -> cplx.CF:
    """Per-shard D psi (or A psi = psi - k D psi) — call INSIDE shard_map.

    links: (T_loc, 4, R, 3, Z_loc, V) t-major local links (R = 3 or 2 for
    two-row compression); psi: (4, 3, T_loc, Z_loc, V) local field.
    ``local_mesh`` describes the shard's extents. One-plane halos ride
    ``ppermute`` rings over ``axis_t``/``axis_z``; unsharded axes wrap
    locally (degrading to exactly the single-device kernel's windows).
    """
    t, z, y, xx = local_mesh.spacetime_dims
    v = y * xx
    fdt = psi.re.dtype
    assert _links_is_tmajor(links), "distributed kernel wants t-major links"
    nrow = links.shape[2]

    # ---- t halos: one (4,3,1,Z,V) psi plane each way + one U_t plane ----
    face_first = psi[:, :, :1]
    face_last = psi[:, :, t - 1 : t]
    ut_last = links[t - 1 : t, 0:1]  # (1, 1, R, 3, Z, V)
    if axis_t is not None and nt_dev > 1:
        ghost_tp = _ring_recv_from_next(face_first, axis_t, nt_dev)
        ghost_tm = _ring_recv_from_prev(face_last, axis_t, nt_dev)
        ghost_ut = _ring_recv_from_prev(ut_last, axis_t, nt_dev)
        if anti_t:
            # the exchanged plane crosses the GLOBAL t edge only on the
            # ring-wrap hop; fold the anti-periodic sign in there, so the
            # kernel and the stored links stay BC-agnostic
            idx = lax.axis_index(axis_t)
            s_p = jnp.where(idx == nt_dev - 1, -1.0, 1.0).astype(fdt)
            s_m = jnp.where(idx == 0, -1.0, 1.0).astype(fdt)
            ghost_tp = cplx.CF(ghost_tp.re * s_p, ghost_tp.im * s_p)
            ghost_tm = cplx.CF(ghost_tm.re * s_m, ghost_tm.im * s_m)
    else:
        ghost_tp, ghost_tm, ghost_ut = face_first, face_last, ut_last
        if anti_t:
            ghost_tp = -ghost_tp
            ghost_tm = -ghost_tm

    # ---- z halos: one (4,3,T,1,V) psi column each way + one U_z column ----
    z_ghost = axis_z is not None and nz_dev > 1
    if z_ghost:
        zface_first = psi[:, :, :, :1]
        zface_last = psi[:, :, :, z - 1 : z]
        uz_last = links[:, 1:2, :, :, z - 1 : z]  # (T, 1, R, 3, 1, V)
        ghost_zp = _ring_recv_from_next(zface_first, axis_z, nz_dev)
        ghost_zm = _ring_recv_from_prev(zface_last, axis_z, nz_dev)
        ghost_uz = _ring_recv_from_prev(uz_last, axis_z, nz_dev)

    def vspec(shape, index_map):
        return pl.BlockSpec(shape, index_map, memory_space=pltpu.VMEM)

    nt = t
    psi_spec_look = vspec((4, 3, 1, z, v), lambda i: (0, 0, (i + 1) % nt, 0, 0))
    psi_spec_0 = vspec((4, 3, 1, z, v), lambda i: (0, 0, 0, 0, 0))
    ghost_spec = vspec((4, 3, 1, z, v), lambda i: (0, 0, 0, 0, 0))
    links_spec = vspec((1, 4, nrow, 3, z, v), lambda i: (i, 0, 0, 0, 0, 0))
    gut_spec = vspec((1, 1, nrow, 3, z, v), lambda i: (0, 0, 0, 0, 0, 0))
    out_spec = vspec((4, 3, 1, z, v), lambda i: (0, 0, i, 0, 0))

    specs = [psi_spec_look, psi_spec_0, ghost_spec, ghost_spec,
             links_spec, gut_spec]
    args = [psi, psi, ghost_tp, ghost_tm, links, ghost_ut]
    if z_ghost:
        zcol_spec = vspec((4, 3, 1, 1, v), lambda i: (0, 0, i, 0, 0))
        guz_spec = vspec((1, 1, nrow, 3, 1, v), lambda i: (i, 0, 0, 0, 0, 0))
        specs += [zcol_spec, zcol_spec, guz_spec]
        args += [ghost_zp, ghost_zm, ghost_uz]

    in_specs = [pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM)]
    for s in specs:
        in_specs += [s, s]
    fuse = k is not None
    k_arr = (
        jnp.stack([k.re, k.im]).astype(fdt).reshape(1, 2)
        if fuse
        else jnp.zeros((1, 2), fdt)
    )
    flat_args = [k_arr]
    for a in args:
        flat_args += [a.re, a.im]

    kernel = functools.partial(
        _dslash_stream_dist_kernel,
        y=y,
        xx=xx,
        nt=nt,
        fuse_dirac=fuse,
        compressed=nrow == 2,
        z_ghost=z_ghost,
    )
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        )
    out_re, out_im = pl.pallas_call(
        kernel,
        grid=(nt,),
        in_specs=in_specs,
        out_specs=(out_spec, out_spec),
        out_shape=(
            jax.ShapeDtypeStruct(psi.re.shape, fdt),
            jax.ShapeDtypeStruct(psi.re.shape, fdt),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, 4, 3, 1, z, v), fdt),
            pltpu.VMEM((2, 4, 3, 1, z, v), fdt),
            pltpu.VMEM((2, 3, 3, z, v), fdt),
            pltpu.VMEM((2, 3, 3, z, v), fdt),
        ],
        interpret=interpret,
        **kwargs,
    )(*flat_args)
    return cplx.CF(out_re, out_im)
