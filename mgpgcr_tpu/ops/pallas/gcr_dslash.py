"""One-pass GCR iteration step: r-update + Dslash + beta dots fused.

In the unpreconditioned fused GCR (solvers/gcr.py cycles path), three of
the four streaming passes per iteration touch the same fields back to
back:

  K1r:    r' = r - alpha * aps[slot],  ||r'||^2
  Dslash: az = A r'          (A = I - k D, t-plane streaming kernel)
  K2:     raw_j = <aps_j, az>  for the stored directions j < lim

This kernel performs all three in ONE pass over the lattice: while
streaming t-planes for the stencil it (a) computes each r' plane from the
incoming r and aps[slot] planes as they are loaded — the carried-plane
scratch the Dslash already keeps IS the r' working set — (b) emits az
fused with I - kD, and (c) dots each az plane against the stored
A-direction planes before they leave VMEM. The aps[slot] row serves both
the r update (lookahead plane t+1) and the beta dot (plane t, carried in
scratch from the previous step), so it streams once.

Per-iteration HBM passes drop from {K1r: 3, Dslash: ~3.5, K2: lim+1} to
{r in, aps rows lim, links ~1.5, r' out, az out} — about 3 field passes
saved per iteration at restart 5.

Layout contract: z-resident t-streaming only (the production
PallasWilsonDirac configuration), t-major links, full or two-row
compressed, any storage dtype. Reference cost model being fused:
GCR.h:222-288 (the SpMV plus the axpy/dot traffic of one iteration).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mgpgcr_tpu import cplx
from mgpgcr_tpu.ops.pallas.dslash import (
    _cf_roll,
    _links_is_tmajor,
    _reconstruct_su3,
)
from mgpgcr_tpu.ops.wilson_tpu import (
    accumulate_half,
    colour_mul,
    project_half,
)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _gcr_step_kernel(
    scal_ref,      # (1, 4) SMEM: alpha.re, alpha.im, k.re, k.im
    rn_re, rn_im,  # r plane (i+1) % nt              (4, 3, 1, Z, V)
    r0_re, r0_im,  # r plane 0 (constant)
    rq_re, rq_im,  # r plane nt-1 (constant)
    an_re, an_im,  # aps[slot] plane (i+1) % nt
    a0_re, a0_im,  # aps[slot] plane 0 (constant)
    aq_re, aq_im,  # aps[slot] plane nt-1 (constant)
    *refs,
    y: int,
    xx: int,
    nt: int,
    lim: int,
    compressed: bool,
    s_rows: int,
    anti_t: bool = False,
):
    """refs tail: [as_re, as_im (lim-1 rows at plane i, if lim > 1)],
    uc_re, uc_im, ul_re, ul_im, az_re, az_im, orp_re, orp_im, r2_ref,
    raw_ref, apr_ref, then scratch: rs_re, rs_im, asl_re, asl_im,
    us_re, us_im."""
    refs = list(refs)
    rs_re, rs_im, asl_re, asl_im, us_re, us_im = refs[-6:]
    del refs[-6:]
    if lim > 1:
        as_re, as_im = refs[0], refs[1]
        del refs[:2]
    (uc_re, uc_im, ul_re, ul_im,
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
        # r' wrap planes (t scratch parity: plane j -> slot j % 2; nt even)
        p0r, p0i = rprime(r0_re[...], r0_im[...], a0_re[0], a0_im[0])
        rs_re[0] = p0r
        rs_im[0] = p0i
        pqr, pqi = rprime(rq_re[...], rq_im[...], aq_re[0], aq_im[0])
        rs_re[1] = pqr
        rs_im[1] = pqi
        # aps[slot] plane 0, needed for step 0's beta dot
        asl_re[0] = a0_re[0]
        asl_im[0] = a0_im[0]
        ul = full_u(cplx.CF(ul_re[0, 0], ul_im[0, 0]))
        us_re[1] = ul.re.astype(fdt)
        us_im[1] = ul.im.astype(fdt)
        # dot rows beyond the live prefix must be zeros, not stale SMEM
        for j in range(lim, s_rows):
            raw_ref[j, 0] = jnp.zeros((), fdt)
            raw_ref[j, 1] = jnp.zeros((), fdt)

    # lookahead: r' and ||r'||^2 for plane (i+1) % nt. At i == nt-1 this
    # recomputes plane 0 (same value); r2 then covers every plane once.
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
    prev = cplx.CF(rs_re[prev2], rs_im[prev2])     # r' plane i-1
    nxt = cplx.CF(nxr, nxi)                        # r' plane i+1
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

    # anti-periodic temporal BC: sign the projected half-spinors of the
    # two boundary-wrapping t hops, links stay pristine SU(3) (same
    # in-kernel formulation as the plain streaming Dslash, dslash.py)
    hf = project_half([nxt[s] for s in range(4)], 0, True)
    if anti_t:
        sf = jnp.where(i == nt - 1, -1.0, 1.0).astype(fdt)
        hf = [cplx.CF(hq.re * sf, hq.im * sf) for hq in hf]
    g = colour_mul(u_mu(0), hf, dagger=False)
    out = accumulate_half(out, g, 0, True)
    hb = project_half([prev[s] for s in range(4)], 0, False)
    if anti_t:
        sb = jnp.where(i == 0, -1.0, 1.0).astype(fdt)
        hb = [cplx.CF(hq.re * sb, hq.im * sb) for hq in hb]
    w = colour_mul(ut_prev, hb, dagger=True)
    out = accumulate_half(out, w, 0, False)

    for mu in (1, 2, 3):
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

    # dots against this plane of every stored A-direction: rows [0:lim-1]
    # streamed at plane i, row lim-1 carried in scratch. Two dot families
    # from the same resident planes: <ap_j, az> (the beta numerators) and
    # <ap_j, r'> — the latter feed next-alpha's numerator recursion
    # <ap_new, r'> = <az, r'> - sum conj(beta_j) <ap_j, r'>, saving K3z a
    # full residual read (solvers/gcr.py cycles path).
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

    # <az, r'> in the last row of apr_ref
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


def gcr_stream_step(links, r, aps, alpha, k, lim: int, mesh,
                    anti_t: bool = False):
    """Fused (r', az, ||r'||^2, raw) for one unpreconditioned GCR
    iteration using the direction stack row ``lim - 1``:

        r'  = r - alpha * aps[lim-1]
        az  = (I - k D) r'
        raw = <aps[0:lim], az>       (rows >= lim return 0)

    links: t-major (T, 4, R, 3, Z, V) CF (R = 3 full | 2 compressed), any
    storage dtype; r: (4, 3, T, Z, V) CF; aps: (S, 4, 3, T, Z, V) CF.
    ``anti_t`` applies the anti-periodic temporal boundary sign in-kernel
    (pristine SU(3) links; composes with two-row compression)."""
    t, z, y, xx = mesh.spacetime_dims
    v = y * xx
    nt = t
    fdt = r.dtype
    assert _links_is_tmajor(links), "gcr step wants t-major links"
    nrow = links.shape[2]
    s_rows = aps.shape[0]
    slot = lim - 1

    def vspec(shape, index_map):
        return pl.BlockSpec(shape, index_map, memory_space=pltpu.VMEM)

    fplane = (4, 3, 1, z, v)
    r_specs = [
        vspec(fplane, lambda i: (0, 0, (i + 1) % nt, 0, 0)),
        vspec(fplane, lambda i: (0, 0, 0, 0, 0)),
        vspec(fplane, lambda i: (0, 0, nt - 1, 0, 0)),
    ]
    ap_plane = (1, 4, 3, 1, z, v)
    ap_specs = [
        vspec(ap_plane, lambda i: (slot, 0, 0, (i + 1) % nt, 0, 0)),
        vspec(ap_plane, lambda i: (slot, 0, 0, 0, 0, 0)),
        vspec(ap_plane, lambda i: (slot, 0, 0, nt - 1, 0, 0)),
    ]
    link_specs = [
        vspec((1, 4, nrow, 3, z, v), lambda i: (i, 0, 0, 0, 0, 0)),
        vspec((1, 1, nrow, 3, z, v), lambda i: (nt - 1, 0, 0, 0, 0, 0)),
    ]
    stack_spec = (
        [vspec((lim - 1, 4, 3, 1, z, v), lambda i: (0, 0, 0, i, 0, 0))]
        if lim > 1
        else []
    )

    in_specs = [pl.BlockSpec((1, 4), lambda i: (0, 0), memory_space=pltpu.SMEM)]
    for sp in r_specs + ap_specs:
        in_specs += [sp, sp]
    for sp in stack_spec:
        in_specs += [sp, sp]
    for sp in link_specs:
        in_specs += [sp, sp]

    out_specs = (
        vspec(fplane, lambda i: (0, 0, i, 0, 0)),            # az plane i
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
    for a_ in [r, r, r]:
        args += [a_.re, a_.im]
    for _ in range(3):
        args += [aps_s, aps_i]
    if lim > 1:
        # rows [0:lim-1] at plane i via the block spec (block row-count
        # lim-1 at block index 0) — the full array is passed, nothing is
        # sliced or copied host-side
        args += [aps_s, aps_i]
    args += [links.re, links.im, links.re, links.im]

    kernel = functools.partial(
        _gcr_step_kernel,
        y=y,
        xx=xx,
        nt=nt,
        lim=lim,
        compressed=nrow == 2,
        s_rows=s_rows,
        anti_t=anti_t,
    )
    kwargs = {}
    if not _interpret():
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
        interpret=_interpret(),
        **kwargs,
    )(*args)
    rp = cplx.CF(orp_re, orp_im)
    az = cplx.CF(az_re, az_im)
    raw_cf = cplx.CF(raw[:, 0], raw[:, 1])
    # apr rows [0:lim] = <ap_j, r'>; row s_rows = <az, r'>
    apr_cf = cplx.CF(apr[:, 0], apr[:, 1])
    return rp, az, r2[0, 0], raw_cf, apr_cf


def _gcr_z_kernel(
    scal_ref,      # (1, 2) SMEM: k.re, k.im
    zn_re, zn_im,  # z plane (i+1) % nt              (4, 3, 1, Z, V)
    z0_re, z0_im,  # z plane 0 (constant)
    zq_re, zq_im,  # z plane nt-1 (constant)
    rp_re, rp_im,  # residual plane i (apr dots only)
    *refs,
    y: int,
    xx: int,
    nt: int,
    lim: int,
    compressed: bool,
    s_rows: int,
    anti_t: bool = False,
):
    """Preconditioned one-pass step: az = (I - kD) z with the beta-dot
    and alpha-numerator reductions riding the same plane streaming.

    refs tail: as_re, as_im (lim stored-direction rows at plane i),
    uc_re, uc_im, ul_re, ul_im, az_re, az_im, raw_ref, apr_ref, then
    scratch: zs_re, zs_im, us_re, us_im."""
    refs = list(refs)
    zs_re, zs_im, us_re, us_im = refs[-4:]
    del refs[-4:]
    as_re, as_im = refs[0], refs[1]
    del refs[:2]
    (uc_re, uc_im, ul_re, ul_im, az_re, az_im, raw_ref, apr_ref) = refs

    i = pl.program_id(0)
    two = jnp.asarray(2, jnp.asarray(i).dtype)
    slot2 = lax.rem(i, two)
    prev2 = lax.rem(i + 1, two)  # (i - 1) % 2
    fdt = az_re.dtype
    kr = scal_ref[0, 0]
    ki = scal_ref[0, 1]

    def full_u(cf: cplx.CF) -> cplx.CF:
        return _reconstruct_su3(cf, fdt) if compressed else cf

    @pl.when(i == 0)
    def _prime():
        # z wrap planes into the t scratch parity slots (plane j -> slot
        # j % 2; nt even): plane 0 is step 0's center, plane nt-1 its
        # t-minus neighbour
        zs_re[0] = z0_re[...]
        zs_im[0] = z0_im[...]
        zs_re[1] = zq_re[...]
        zs_im[1] = zq_im[...]
        ul = full_u(cplx.CF(ul_re[0, 0], ul_im[0, 0]))
        us_re[1] = ul.re.astype(fdt)
        us_im[1] = ul.im.astype(fdt)
        # dot rows beyond the live prefix must be zeros, not stale SMEM
        for j in range(lim, s_rows):
            raw_ref[j, 0] = jnp.zeros((), fdt)
            raw_ref[j, 1] = jnp.zeros((), fdt)
            apr_ref[j, 0] = jnp.zeros((), fdt)
            apr_ref[j, 1] = jnp.zeros((), fdt)

    def _acc(ref, idx, value):
        @pl.when(i == 0)
        def _():
            ref[idx] = value

        @pl.when(i != 0)
        def _():
            ref[idx] += value

    center = cplx.CF(zs_re[slot2], zs_im[slot2])   # z plane i
    prev = cplx.CF(zs_re[prev2], zs_im[prev2])     # z plane i-1
    nxt = cplx.CF(zn_re[...], zn_im[...])          # z plane i+1
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

    hf = project_half([nxt[s] for s in range(4)], 0, True)
    if anti_t:
        sf = jnp.where(i == nt - 1, -1.0, 1.0).astype(fdt)
        hf = [cplx.CF(hq.re * sf, hq.im * sf) for hq in hf]
    g = colour_mul(u_mu(0), hf, dagger=False)
    out = accumulate_half(out, g, 0, True)
    hb = project_half([prev[s] for s in range(4)], 0, False)
    if anti_t:
        sb = jnp.where(i == 0, -1.0, 1.0).astype(fdt)
        hb = [cplx.CF(hq.re * sb, hq.im * sb) for hq in hb]
    w = colour_mul(ut_prev, hb, dagger=True)
    out = accumulate_half(out, w, 0, False)

    for mu in (1, 2, 3):
        um = u_mu(mu)
        h = project_half(psi_slabs, mu, True)
        h = [shift_local(hq, mu, True) for hq in h]
        g = colour_mul(um, h, dagger=False)
        out = accumulate_half(out, g, mu, True)

        w = colour_mul(um, project_half(psi_slabs, mu, False), dagger=True)
        w = [shift_local(wq, mu, False) for wq in w]
        out = accumulate_half(out, w, mu, False)

    # az = z - k D z
    azs = []
    for s in range(4):
        zr = center[s].re - (kr * out[s].re - ki * out[s].im)
        zi = center[s].im - (kr * out[s].im + ki * out[s].re)
        az_re[s] = zr
        az_im[s] = zi
        azs.append((zr, zi))

    # beta numerators <ap_j, az> AND alpha-numerator feeds <ap_j, r>
    # from the same resident direction planes; <az, r> in apr's last row.
    # The solver recovers next iteration's <ap_new, r> by the recursion
    # <ap_new, r> = <az, r> - sum_j conj(beta_j) <ap_j, r>, so the K3
    # direction update never streams the residual (solvers/gcr.py).
    for j in range(lim):
        dj_re, dj_im = as_re[j], as_im[j]
        acc_r = jnp.zeros((), fdt)
        acc_i = jnp.zeros((), fdt)
        pr_r = jnp.zeros((), fdt)
        pr_i = jnp.zeros((), fdt)
        for s in range(4):
            zr, zi = azs[s]
            acc_r += jnp.sum(dj_re[s] * zr + dj_im[s] * zi)
            acc_i += jnp.sum(dj_re[s] * zi - dj_im[s] * zr)
            rr, ri = rp_re[s], rp_im[s]
            pr_r += jnp.sum(dj_re[s] * rr + dj_im[s] * ri)
            pr_i += jnp.sum(dj_re[s] * ri - dj_im[s] * rr)
        _acc(raw_ref, (j, 0), acc_r)
        _acc(raw_ref, (j, 1), acc_i)
        _acc(apr_ref, (j, 0), pr_r)
        _acc(apr_ref, (j, 1), pr_i)

    zr_r = jnp.zeros((), fdt)
    zr_i = jnp.zeros((), fdt)
    for s in range(4):
        zr, zi = azs[s]
        rr, ri = rp_re[s], rp_im[s]
        zr_r += jnp.sum(zr * rr + zi * ri)
        zr_i += jnp.sum(zr * ri - zi * rr)
    _acc(apr_ref, (s_rows, 0), zr_r)
    _acc(apr_ref, (s_rows, 1), zr_i)

    # carries for step i+1
    zs_re[prev2] = nxt.re
    zs_im[prev2] = nxt.im
    us_re[slot2] = u0.re.astype(fdt)
    us_im[slot2] = u0.im.astype(fdt)


def gcr_z_step(links, z, r, aps, k, lim: int, mesh, anti_t: bool = False):
    """Fused (az, raw, apr) for one PRECONDITIONED GCR iteration — the
    z != r extension of ``gcr_stream_step`` (the residual update already
    happened in K1; z = M(r) is the V-cycle output, streamed as its own
    stencil input):

        az     = (I - k D) z
        raw_j  = <aps_j, az>   for j < lim   (beta numerators)
        apr_j  = <aps_j, r>    for j < lim;  apr[S] = <az, r>

    One pass replaces the separate Dslash + K2 beta-dot passes and feeds
    the alpha-numerator recursion so K3 drops its residual read — the MG
    outer iteration's algebra reaches the plain fused path's traffic
    shape. Layout contract identical to ``gcr_stream_step`` (z-resident
    t-streaming, t-major links, full or two-row, nt even).

    Reference loop being fused: GCR.h:222-288 with the right
    preconditioner applied at GCR.h:236-247."""
    t, zdim, y, xx = mesh.spacetime_dims
    v = y * xx
    nt = t
    fdt = z.dtype
    assert _links_is_tmajor(links), "gcr z step wants t-major links"
    nrow = links.shape[2]
    s_rows = aps.shape[0]

    def vspec(shape, index_map):
        return pl.BlockSpec(shape, index_map, memory_space=pltpu.VMEM)

    fplane = (4, 3, 1, zdim, v)
    z_specs = [
        vspec(fplane, lambda i: (0, 0, (i + 1) % nt, 0, 0)),
        vspec(fplane, lambda i: (0, 0, 0, 0, 0)),
        vspec(fplane, lambda i: (0, 0, nt - 1, 0, 0)),
    ]
    r_spec = vspec(fplane, lambda i: (0, 0, i, 0, 0))
    stack_spec = vspec((lim, 4, 3, 1, zdim, v), lambda i: (0, 0, 0, i, 0, 0))
    link_specs = [
        vspec((1, 4, nrow, 3, zdim, v), lambda i: (i, 0, 0, 0, 0, 0)),
        vspec((1, 1, nrow, 3, zdim, v), lambda i: (nt - 1, 0, 0, 0, 0, 0)),
    ]

    in_specs = [pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM)]
    for sp in z_specs + [r_spec]:
        in_specs += [sp, sp]
    in_specs += [stack_spec, stack_spec]
    for sp in link_specs:
        in_specs += [sp, sp]

    out_specs = (
        vspec(fplane, lambda i: (0, 0, i, 0, 0)),
        vspec(fplane, lambda i: (0, 0, i, 0, 0)),
        pl.BlockSpec((s_rows, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((s_rows + 1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
    )

    scal = jnp.stack(
        [jnp.asarray(k.re, fdt), jnp.asarray(k.im, fdt)]
    ).reshape(1, 2)

    aps_s = aps.re.reshape(s_rows, 4, 3, t, zdim, v)
    aps_i = aps.im.reshape(s_rows, 4, 3, t, zdim, v)
    args = [scal]
    for a_ in [z, z, z, r]:
        args += [a_.re, a_.im]
    args += [aps_s, aps_i]
    args += [links.re, links.im, links.re, links.im]

    kernel = functools.partial(
        _gcr_z_kernel,
        y=y,
        xx=xx,
        nt=nt,
        lim=lim,
        compressed=nrow == 2,
        s_rows=s_rows,
        anti_t=anti_t,
    )
    kwargs = {}
    if not _interpret():
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=121 * 1024 * 1024
        )
    az_re, az_im, raw, apr = pl.pallas_call(
        kernel,
        grid=(nt,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=(
            jax.ShapeDtypeStruct(z.re.shape, fdt),
            jax.ShapeDtypeStruct(z.re.shape, fdt),
            jax.ShapeDtypeStruct((s_rows, 2), fdt),
            jax.ShapeDtypeStruct((s_rows + 1, 2), fdt),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, 4, 3, 1, zdim, v), fdt),
            pltpu.VMEM((2, 4, 3, 1, zdim, v), fdt),
            pltpu.VMEM((2, 3, 3, zdim, v), fdt),
            pltpu.VMEM((2, 3, 3, zdim, v), fdt),
        ],
        interpret=_interpret(),
        **kwargs,
    )(*args)
    az = cplx.CF(az_re, az_im)
    raw_cf = cplx.CF(raw[:, 0], raw[:, 1])
    apr_cf = cplx.CF(apr[:, 0], apr[:, 1])
    return az, raw_cf, apr_cf
