"""Fused Wilson--Dirac (Dslash) Pallas TPU kernel.

One kernel computes the full 8-hop stencil for a lattice block: the XLA
slab implementation (ops/wilson_tpu.py) materialises each shifted field and
per-hop product in HBM, while this kernel keeps the block and its one-plane
halos resident in VMEM and writes only the final result — the
minimal-traffic formulation the HBM roofline assumes.

Grid and halos (TPU tiling constraint: the last two dims of every block
must be (multiples of 8, multiples of 128) or equal the full array dims):
- grid over T always; the t-halos are (.., 1, Z?, V) blocks, legal because
  t sits outside the tiled minor dims;
- if the whole (Z, Y*X) plane fits VMEM, z stays resident and z/y/x shifts
  are in-block rolls (no z halo at all);
- otherwise z is blocked in multiples of 8 and the z-halos are 8-plane
  blocks of which the kernel uses a single boundary plane (the tiling
  rule forbids 1-plane z blocks; 7/8 of halo bytes are discarded —
  still ~20x less than re-reading neighbours' full blocks).

Within a block, y/x shifts are static-slice rolls over the merged Y*X axis
(exact: the full y-x plane is resident). The spin/colour arithmetic is
shared with the XLA path (colour_mul / spin_matmul from
ops/wilson_tpu.py) on ``cplx.CF`` pairs — split re/im is mandatory in
Pallas (no complex registers).

Reference parity: computes exactly the hopping matrix D of
Operator.h:105-574 / Parse.cpp fixtures; validated against
``WilsonDiracOperator`` and ``TpuWilsonDirac`` in tests/test_pallas.py.
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
from mgpgcr_tpu.ops.wilson_tpu import (
    accumulate_half,
    colour_mul,
    links_to_tpu,
    project_half,
)

_ZHALO = 8  # minimum legal z-block thickness for halo views


def _roll_static(x, shift: int, axis: int):
    """Static-shift periodic roll via the TPU rotate unit (``pltpu.roll``
    lowers to a single lane/sublane rotate, vs two VMEM copies for the
    slice+concat formulation; matches ``jnp.roll`` semantics)."""
    size = x.shape[axis]
    shift %= size
    if shift == 0:
        return x
    return pltpu.roll(x, shift, axis)


def _cf_roll(v: cplx.CF, shift: int, axis: int) -> cplx.CF:
    return cplx.CF(_roll_static(v.re, shift, axis), _roll_static(v.im, shift, axis))


def _cf_cat(parts, axis: int) -> cplx.CF:
    return cplx.CF(
        lax.concatenate([p.re for p in parts], dimension=axis),
        lax.concatenate([p.im for p in parts], dimension=axis),
    )


def _cf_slice(v: cplx.CF, lo: int, hi: int, axis: int) -> cplx.CF:
    return cplx.CF(
        lax.slice_in_dim(v.re, lo, hi, axis=axis),
        lax.slice_in_dim(v.im, lo, hi, axis=axis),
    )


def _dslash_kernel(*refs, y: int, xx: int, z_blocked: bool):
    """refs layout (re/im pairs):
    psi_c, psi_tp, psi_tm, u_c, ut_m [, psi_zp, psi_zm, uz_m], out."""
    it = iter(range(len(refs) - 2))

    def nxt():
        i = next(it)
        return cplx.CF(refs[2 * i][...], refs[2 * i + 1][...])

    psi = nxt()      # (4, 3, TB, ZB, V)
    psi_tp = nxt()   # (4, 3, 1, ZB, V)
    psi_tm = nxt()   # (4, 3, 1, ZB, V)
    u = nxt()        # (4, 3, 3, TB, ZB, V)
    ut_m = nxt()     # (1, 3, 3, 1, ZB, V)
    ut_m = ut_m[0]
    if z_blocked:
        psi_zp = nxt()  # (4, 3, TB, _ZHALO, V) — plane 0 is z = block_end
        psi_zm = nxt()  # (4, 3, TB, _ZHALO, V) — plane -1 is z = block_start-1
        uz_m = nxt()    # (1, 3, 3, TB, _ZHALO, V) — plane -1 used
        psi_zp = _cf_slice(psi_zp, 0, 1, 3)
        psi_zm = _cf_slice(psi_zm, _ZHALO - 1, _ZHALO, 3)
        uz_m = _cf_slice(uz_m[0], _ZHALO - 1, _ZHALO, 3)
    out_re, out_im = refs[-2], refs[-1]

    # x-coordinate masks over the merged Y*X axis, from iota (no big
    # array constants in the Mosaic program)
    v = out_re.shape[-1]
    xcoord = lax.broadcasted_iota(jnp.int32, (1, 1, 1, v), 3) % xx
    mask_last = xcoord == xx - 1
    mask_first = xcoord == 0

    def slab_where(mask, a: cplx.CF, b: cplx.CF) -> cplx.CF:
        return cplx.CF(jnp.where(mask, a.re, b.re), jnp.where(mask, a.im, b.im))

    def shift_local(vv: cplx.CF, mu: int, fwd: bool) -> cplx.CF:
        """z (when resident) / y / x shifts on a (3, TB, ZB, V) slab."""
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

    psi_slabs = [psi[s] for s in range(4)]
    out = [None] * 4
    for mu in range(4):
        u_mu = u[mu]  # (3, 3, TB, ZB, V)

        # ---- forward hop: (1 - gamma_mu) U(x) psi(x + mu) ----
        # project to the 2-spin half field, then shift/colour-mul half the
        # data. slab axes: (colour 0, t 1, z 2, v 3)
        h = project_half(psi_slabs, mu, True)
        if mu == 0:
            tb_ = psi.shape[2]
            h_halo = project_half([psi_tp[s] for s in range(4)], mu, True)
            h = [
                hh if tb_ == 1 else _cf_cat([_cf_slice(hq, 1, tb_, 1), hh], 1)
                for hq, hh in zip(h, h_halo)
            ]
        elif mu == 1 and z_blocked:
            zb_ = psi.shape[3]
            h_halo = project_half([psi_zp[s] for s in range(4)], mu, True)
            h = [
                hh if zb_ == 1 else _cf_cat([_cf_slice(hq, 1, zb_, 2), hh], 2)
                for hq, hh in zip(h, h_halo)
            ]
        else:
            h = [shift_local(hq, mu, True) for hq in h]
        g = colour_mul(u_mu, h, dagger=False)
        out = accumulate_half(out, g, mu, True)

        # ---- backward hop: (1 + gamma_mu) shift_bwd(U^dag(x) psi(x)) ----
        w = colour_mul(u_mu, project_half(psi_slabs, mu, False), dagger=True)
        if mu == 0:
            hb = project_half([psi_tm[s] for s in range(4)], mu, False)
            w_halo = colour_mul(ut_m, hb, dagger=True)
            w = [
                wh if wc.shape[1] == 1
                else _cf_cat([wh, _cf_slice(wc, 0, wc.shape[1] - 1, 1)], 1)
                for wh, wc in zip(w_halo, w)
            ]
        elif mu == 1 and z_blocked:
            hb = project_half([psi_zm[s] for s in range(4)], mu, False)
            w_halo = colour_mul(uz_m, hb, dagger=True)
            w = [
                wh if wc.shape[2] == 1
                else _cf_cat([wh, _cf_slice(wc, 0, wc.shape[2] - 1, 2)], 2)
                for wh, wc in zip(w_halo, w)
            ]
        else:
            w = [shift_local(wq, mu, False) for wq in w]
        out = accumulate_half(out, w, mu, False)

    res = cplx.stack(out, axis=0)
    out_re[...] = res.re
    out_im[...] = res.im


def links_to_tmajor(links_tpu: cplx.CF) -> cplx.CF:
    """(4, 3, 3, T, Z, V) -> (T, 4, 3, 3, Z, V): one t-plane of links is a
    single contiguous HBM chunk, the shape the streaming kernel's per-step
    link DMA wants (fragmenting it into 36 per-(mu,a,b) chunks measurably
    lowers achieved DMA bandwidth, especially for bf16 links)."""
    return cplx.transpose(links_tpu, (3, 0, 1, 2, 4, 5))


def links_from_tmajor(links_tmajor: cplx.CF) -> cplx.CF:
    """Inverse of :func:`links_to_tmajor` (3-row uncompressed links only):
    (T, 4, 3, 3, Z, V) -> (4, 3, 3, T, Z, V)."""
    assert links_tmajor.shape[2] == 3, "two-row links cannot round-trip"
    return cplx.transpose(links_tmajor, (1, 2, 3, 0, 4, 5))


def _links_is_tmajor(links: cplx.CF) -> bool:
    return links.shape[1] == 4  # mu-major is (4, 3, 3, ...): shape[1] == 3


def compress_links_tmajor(links_tmajor: cplx.CF) -> cplx.CF:
    """(T, 4, 3, 3, Z, V) -> (T, 4, 2, 3, Z, V): drop the third row of every
    SU(3) link (the standard 12-real gauge compression — row 2 of a special
    unitary matrix is conj(row0 x row1), reconstructed in-kernel). Cuts link
    HBM traffic by a third; valid ONLY for links that are actually SU(3)."""
    assert _links_is_tmajor(links_tmajor), "compress wants t-major links"
    return links_tmajor[:, :, :2]


def su3_reconstruction_error(links_tmajor: cplx.CF) -> float:
    """Max |row2 - conj(row0 x row1)| over all links — 0 for exact SU(3).

    Sign-flipped boundary links (ops/wilson.py ``antiperiodic_t``) have
    det = -1: reconstruction returns +row2 where the stored row is -row2,
    so the error there is O(1) — the fingerprint the compression guard
    looks for."""
    assert _links_is_tmajor(links_tmajor), "su3 check wants t-major links"
    r = links_tmajor.astype(jnp.float32)
    r0, r1, r2 = r[:, :, 0], r[:, :, 1], r[:, :, 2]
    recon = cplx.stack(
        [
            cplx.conj(r0[:, :, b] * r1[:, :, c] - r0[:, :, c] * r1[:, :, b])
            for (b, c) in ((1, 2), (2, 0), (0, 1))
        ],
        axis=2,
    )
    d = r2 - recon
    return float(jnp.sqrt(jnp.max(d.re * d.re + d.im * d.im)))


def _assert_su3_compressible(links_tmajor: cplx.CF) -> None:
    """Refuse 2-row compression of links that are not (numerically) SU(3):
    reconstruction would silently corrupt the operator. In particular,
    links pre-flipped by ``antiperiodic_t`` (det = -1 on the t boundary)
    must instead use ``build(..., antiperiodic_t=True)``, which keeps the
    stored links pristine and applies the boundary sign in-kernel."""
    err = su3_reconstruction_error(links_tmajor)
    if err > 0.1:
        raise ValueError(
            "links fail SU(3) row-reconstruction (max error "
            f"{err:.3g}): two-row compression would corrupt the operator. "
            "If these links carry the anti-periodic boundary sign "
            "(ops/wilson.py antiperiodic_t), rebuild from pristine links "
            "with PallasWilsonDirac.build(..., antiperiodic_t=True) — the "
            "sign is then applied in-kernel and composes with compression."
        )


def _reconstruct_su3(u2: cplx.CF, fdt) -> cplx.CF:
    """(2, 3, ...) two-row CF -> (3, 3, ...) full SU(3): row2 =
    conj(row0 x row1). Rows are upcast to the field dtype first so bf16
    storage reconstructs at f32 arithmetic precision."""
    r = u2.astype(fdt)
    r0, r1 = r[0], r[1]
    rows2 = [
        cplx.conj(r0[b] * r1[c] - r0[c] * r1[b])
        for (b, c) in ((1, 2), (2, 0), (0, 1))
    ]
    r2 = cplx.stack(rows2, axis=0)
    return cplx.concatenate([r, cplx.CF(r2.re[None], r2.im[None])], axis=0)


def _dslash_stream_kernel(
    k_ref,         # (1, 2) SMEM: complex k of A = I - k D (unused if not fused)
    pn_re, pn_im,  # psi plane (i+1) % nt          (4, 3, 1, Z, V)
    pf_re, pf_im,  # psi plane 0 (constant window)  (4, 3, 1, Z, V)
    pq_re, pq_im,  # psi plane nt-1 (constant)      (4, 3, 1, Z, V)
    uc_re, uc_im,  # links plane i                  (1, 4, 3, 3, Z, V)
    ul_re, ul_im,  # U_t plane nt-1 (constant)      (1, 1, 3, 3, Z, V)
    out_re, out_im,  # output plane i               (4, 3, 1, Z, V)
    ps_re, ps_im,  # carried psi planes             (2, 4, 3, 1, Z, V)
    us_re, us_im,  # carried U_t planes             (2, 3, 3, Z, V)
    *,
    y: int,
    xx: int,
    fuse_dirac: bool,
    compressed: bool = False,
    anti_t: bool = False,
    nt: int = 0,
):
    """t-plane streaming Dslash: grid over t, one output plane per step.

    Each step loads exactly one new psi plane (the t+1 lookahead) and one
    links plane; the center and t-1 planes are carried in VMEM scratch
    from earlier steps (plane j lives in scratch slot j % 2), so psi HBM
    traffic is ~1x instead of the 3x of halo-window tiling, and the t-hops
    read their neighbour planes directly — no halo concatenation at all.
    The periodic wrap is primed by two constant-index windows (planes 0
    and nt-1), fetched once per kernel launch.

    With ``fuse_dirac`` the kernel emits A psi = psi - k D psi instead of
    D psi at identical HBM traffic (the center plane is already resident)
    — the whole reference ``DiracOp`` application (Operator.h:570-574) in
    one pass."""
    i = pl.program_id(0)
    two = jnp.asarray(2, jnp.asarray(i).dtype)
    slot = lax.rem(i, two)
    prev_slot = lax.rem(i + 1, two)  # (i - 1) % 2
    fdt = out_re.dtype

    def full_u(cf: cplx.CF) -> cplx.CF:
        """Storage link -> full f32 3x3 (reconstruct row 2 if 2-row)."""
        return _reconstruct_su3(cf, fdt) if compressed else cf

    @pl.when(i == 0)
    def _prime():
        ps_re[0] = pf_re[...]
        ps_im[0] = pf_im[...]
        ps_re[1] = pq_re[...]
        ps_im[1] = pq_im[...]
        # U_t scratch holds *reconstructed, field-dtype* links so the
        # backward-t hop never re-reconstructs or re-casts a carried plane
        ul = full_u(cplx.CF(ul_re[0, 0], ul_im[0, 0]))
        us_re[1] = ul.re.astype(fdt)
        us_im[1] = ul.im.astype(fdt)

    center = cplx.CF(ps_re[slot], ps_im[slot])     # (4, 3, 1, Z, V)
    prev = cplx.CF(ps_re[prev_slot], ps_im[prev_slot])
    nxt = cplx.CF(pn_re[...], pn_im[...])
    u = cplx.CF(uc_re[0], uc_im[0])                # (4, R, 3, Z, V), R=3|2
    ut_prev = cplx.CF(us_re[prev_slot], us_im[prev_slot])  # (3, 3, Z, V) fdt

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
        """z / y / x shifts on a (3, 1, Z, V) slab (z and the y*x plane
        are fully resident)."""
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

    # t hops read the neighbour planes directly (no shifts, no halos).
    # Anti-periodic BCs (QCD fermion convention): the hop crossing the
    # t boundary picks up a minus sign, applied here on the projected
    # half-spinors of the wrapping steps only — so the stored links stay
    # pristine SU(3) and two-row compression composes (round-2 VERDICT:
    # the link-flip formulation has det = -1 boundary links that the
    # row-2 reconstruction silently corrupts).
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

    # carry for the next step: plane i+1 -> slot (i+1) % 2, U_t(i) -> slot i % 2
    ps_re[prev_slot] = pn_re[...]
    ps_im[prev_slot] = pn_im[...]
    us_re[slot] = u0.re.astype(fdt)
    us_im[slot] = u0.im.astype(fdt)


def _dslash_stream(
    links: cplx.CF,
    psi: cplx.CF,
    mesh,
    interpret: bool,
    k: cplx.CF | None = None,
    anti_t: bool = False,
) -> cplx.CF:
    """Streaming-kernel dispatch (z fully VMEM-resident). links must be in
    t-major layout (links_to_tmajor); pass ``k`` to fuse A = I - k D."""
    t, z, y, xx = mesh.spacetime_dims
    v = y * xx
    nt = t
    fdt = psi.re.dtype
    assert _links_is_tmajor(links), "streaming kernel wants t-major links"
    nrow = links.shape[2]  # 3 full, 2 compressed (compress_links_tmajor)

    def vspec(shape, index_map):
        return pl.BlockSpec(shape, index_map, memory_space=pltpu.VMEM)

    specs = [
        vspec((4, 3, 1, z, v), lambda i: (0, 0, (i + 1) % nt, 0, 0)),
        vspec((4, 3, 1, z, v), lambda i: (0, 0, 0, 0, 0)),
        vspec((4, 3, 1, z, v), lambda i: (0, 0, nt - 1, 0, 0)),
        vspec((1, 4, nrow, 3, z, v), lambda i: (i, 0, 0, 0, 0, 0)),
        vspec((1, 1, nrow, 3, z, v), lambda i: (nt - 1, 0, 0, 0, 0, 0)),
    ]
    out_spec = vspec((4, 3, 1, z, v), lambda i: (0, 0, i, 0, 0))

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
    for a in [psi, psi, psi, links, links]:
        flat_args += [a.re, a.im]

    kernel = functools.partial(
        _dslash_stream_kernel,
        y=y,
        xx=xx,
        fuse_dirac=fuse,
        compressed=nrow == 2,
        anti_t=anti_t,
        nt=nt,
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
            # carried U_t planes are stored reconstructed in field dtype
            pltpu.VMEM((2, 3, 3, z, v), fdt),
            pltpu.VMEM((2, 3, 3, z, v), fdt),
        ],
        interpret=interpret,
        **kwargs,
    )(*flat_args)
    return cplx.CF(out_re, out_im)


def _pick_block(t: int, z: int, v: int, itemsize: int = 4) -> tuple[int, int]:
    """(TB, ZB) keeping the kernel working set in a ~6 MB VMEM budget.
    Prefers z fully resident (no z halo); z blocks must be multiples of 8."""
    # measured on v5e (16^4/32^4 scans): ~32K sites is the largest block the
    # compiler accepts double-buffered under the raised vmem limit; at least
    # ~8 grid cells are needed to pipeline HBM loads behind compute
    max_sites = max(32768, v)
    zb = z
    while zb > 8 and zb % 2 == 0 and zb // 2 % 8 == 0 and zb * v > max_sites:
        zb //= 2
    tb = 1
    while (
        tb * 2 <= t
        and t % (tb * 2) == 0
        and tb * 2 * zb * v <= max_sites
        and (t // (tb * 2)) * (z // zb) >= 8
    ):
        tb *= 2
    return tb, zb


@functools.partial(
    jax.jit, static_argnames=("mesh", "tb", "zb", "interpret", "anti_t")
)
def dslash_apply(
    links: cplx.CF,
    psi: cplx.CF,
    mesh: LatticeMesh,
    tb: int | None = None,
    zb: int | None = None,
    interpret: bool = False,
    k: cplx.CF | None = None,
    anti_t: bool = False,
) -> cplx.CF:
    """D psi (or A psi = psi - k D psi when ``k`` is given) via the fused
    kernel. links: (4,3,3,T,Z,V) mu-major or (T,4,3,3,Z,V) t-major CF;
    psi: (4,3,T,Z,V) CF. ``anti_t`` applies the anti-periodic temporal
    boundary sign in-kernel (streaming kernel only; links stay pristine)."""
    t, z, y, xx = mesh.spacetime_dims
    v = y * xx
    tmajor = _links_is_tmajor(links)
    tb0, zb0 = _pick_block(t, z, v)
    if tb is None and zb0 == z:
        tb0 = 1  # z-resident default: the t-streaming kernel wants TB=1
    tb = tb if tb is not None else tb0
    zb = zb if zb is not None else zb0
    assert t % tb == 0 and z % zb == 0
    if tb == 1 and zb == z:
        if not tmajor:
            # correctness fallback for directly-constructed mu-major
            # operators; ``build`` stores t-major so the production path
            # never pays this per-apply relayout
            links = links_to_tmajor(links)
        return _dslash_stream(links, psi, mesh, interpret, k=k, anti_t=anti_t)
    assert not anti_t, "in-kernel anti-periodic BC wants the streaming kernel"
    assert not tmajor, "z-blocked halo kernel wants mu-major links"
    if k is not None:
        d = dslash_apply(links, psi, mesh, tb, zb, interpret)
        return psi - k * d
    z_blocked = zb != z
    if z_blocked:
        assert zb % _ZHALO == 0, "z blocks must be multiples of 8 (TPU tiling)"
    nt, nz = t // tb, z // zb

    f32 = psi.re.dtype
    grid = (nt, nz)

    def vspec(shape, index_map):
        return pl.BlockSpec(shape, index_map, memory_space=pltpu.VMEM)

    specs = [
        # psi center + t halos (t is outside the tiled minor dims: 1-plane ok)
        vspec((4, 3, tb, zb, v), lambda i, j: (0, 0, i, j, 0)),
        vspec((4, 3, 1, zb, v), lambda i, j: (0, 0, ((i + 1) % nt) * tb, j, 0)),
        vspec((4, 3, 1, zb, v), lambda i, j: (0, 0, (i * tb - 1) % t, j, 0)),
        # links center + U_t at t-1
        vspec((4, 3, 3, tb, zb, v), lambda i, j: (0, 0, 0, i, j, 0)),
        vspec((1, 3, 3, 1, zb, v), lambda i, j: (0, 0, 0, (i * tb - 1) % t, j, 0)),
    ]
    if z_blocked:
        h = _ZHALO
        specs += [
            # z halos: 8-thick legal blocks; kernel uses one boundary plane
            vspec(
                (4, 3, tb, h, v),
                lambda i, j: (0, 0, i, ((j + 1) % nz) * zb // h, 0),
            ),
            vspec(
                (4, 3, tb, h, v),
                lambda i, j: (0, 0, i, ((j * zb - h) % z) // h, 0),
            ),
            vspec(
                (1, 3, 3, tb, h, v),
                lambda i, j: (1, 0, 0, i, ((j * zb - h) % z) // h, 0),
            ),
        ]
    out_spec = vspec((4, 3, tb, zb, v), lambda i, j: (0, 0, i, j, 0))

    in_specs = []
    for s in specs:
        in_specs += [s, s]

    args = [psi, psi, psi, links, links]
    if z_blocked:
        args += [psi, psi, links]
    flat_args = []
    for a in args:
        flat_args += [a.re, a.im]

    kernel = functools.partial(_dslash_kernel, y=y, xx=xx, z_blocked=z_blocked)
    kwargs = {}
    if not interpret:
        # large lattices: the 8-input double-buffered window exceeds the
        # default 16 MB scoped-vmem budget; v5e+ have headroom above it
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        )
    out_re, out_im = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=(out_spec, out_spec),
        out_shape=(
            jax.ShapeDtypeStruct(psi.re.shape, f32),
            jax.ShapeDtypeStruct(psi.re.shape, f32),
        ),
        interpret=interpret,
        **kwargs,
    )(*flat_args)
    return cplx.CF(out_re, out_im)


@operator_dataclass(
    meta=(
        "mesh", "tb", "zb", "interpret", "anti_t",
        "device_mesh", "axis_t", "axis_z",
    )
)
class PallasWilsonDirac(LinearOperator):
    """Drop-in replacement for ``TpuWilsonDirac`` backed by the fused
    kernel; same field layout (4, 3, T, Z, Y*X), same CF representation.
    Links are stored t-major (one contiguous plane per grid step) when the
    streaming kernel applies; layout is inferred from the array shape.
    ``anti_t`` applies the anti-periodic temporal boundary sign in-kernel
    on the wrapping t hops (links stay pristine SU(3), so two-row
    compression composes).

    Domain decomposition: with ``device_mesh`` set (``build_sharded``), the
    T and/or Z lattice axes are sharded over the named device-mesh axes and
    ``apply`` runs the streaming kernel per shard inside ``shard_map``,
    with one-plane ghost halos exchanged over ``ppermute`` rings
    (ops/pallas/dslash_dist.py) — multi-chip solves keep single-chip
    kernel speed instead of falling back to the XLA slab stencil."""

    links: cplx.CF  # (T, 4, 3, 3, Z, V) t-major, or (4, 3, 3, T, Z, V)
    mesh: LatticeMesh
    tb: int | None = None
    zb: int | None = None
    interpret: bool = False
    anti_t: bool = False
    device_mesh: object = None  # jax.sharding.Mesh or None
    axis_t: str | None = None
    axis_z: str | None = None

    @staticmethod
    def build(
        links_canonical,
        mesh: LatticeMesh,
        tb=None,
        zb=None,
        interpret=False,
        compress=False,
        antiperiodic_t=False,
    ) -> "PallasWilsonDirac":
        """``antiperiodic_t=True`` expects PRISTINE periodic links and
        applies the boundary sign in-kernel (do NOT also pre-flip them
        with ops/wilson.py ``antiperiodic_t`` — that would double-apply).
        On the non-streaming fallback kernel the sign is folded into the
        stored links instead (identical operator, but then incompatible
        with ``compress``)."""
        links = links_to_tpu(links_canonical, mesh)
        t, z, y, xx = mesh.spacetime_dims
        tb0, zb0 = _pick_block(t, z, y * xx)
        streaming = (tb in (None, 1)) and (zb in (None, z)) and zb0 == z
        anti_flag = False
        if streaming:
            links = links_to_tmajor(links)
            anti_flag = bool(antiperiodic_t)
            if compress:
                _assert_su3_compressible(links)
                links = compress_links_tmajor(links)
        else:
            if compress:
                raise ValueError(
                    "link compression requires the streaming kernel"
                )
            if antiperiodic_t:
                # fold the boundary sign into U_t(t = T-1) of the mu-major
                # (4, 3, 3, T, Z, V) links — the halo kernel has no
                # in-kernel BC path
                links = links.at[0, :, :, t - 1].set(
                    -links[0, :, :, t - 1]
                )
        return PallasWilsonDirac(links, mesh, tb, zb, interpret, anti_flag)

    def with_compressed_links(self) -> "PallasWilsonDirac":
        """Two-row (12-real) SU(3) link storage: the kernel reconstructs
        row 2 as conj(row0 x row1). ~29% less HBM traffic per apply at f32
        (~17% at bf16 links); exact only for true SU(3) links — refused
        (ValueError) for links that fail reconstruction, e.g. pre-flipped
        anti-periodic boundaries (use build(antiperiodic_t=True))."""
        import dataclasses

        _assert_su3_compressible(self.links)
        return dataclasses.replace(
            self, links=compress_links_tmajor(self.links)
        )

    # ---- domain decomposition -------------------------------------------
    @staticmethod
    def build_sharded(
        links_canonical,
        mesh: LatticeMesh,
        device_mesh,
        axis_t: str | None = "t",
        axis_z: str | None = None,
        compress: bool = False,
        antiperiodic_t: bool = False,
        interpret: bool = False,
    ) -> "PallasWilsonDirac":
        """Distributed streaming operator: t-major links laid out over the
        device mesh; ``apply`` then runs the ghost-plane streaming kernel
        per shard (dslash_dist.py). The local Z extent must keep the
        (Z_loc, Y*X) plane VMEM-resident — true for production lattices
        once decomposed."""
        import dataclasses

        from jax.sharding import NamedSharding

        t, z, y, xx = mesh.spacetime_dims
        ntd = device_mesh.shape[axis_t] if axis_t else 1
        nzd = device_mesh.shape[axis_z] if axis_z else 1
        if t % ntd or z % nzd:
            raise ValueError(
                f"lattice (T={t}, Z={z}) does not tile the device mesh "
                f"({ntd} x {nzd})"
            )
        links = links_to_tmajor(links_to_tpu(links_canonical, mesh))
        if compress:
            _assert_su3_compressible(links)
            links = compress_links_tmajor(links)
        op = PallasWilsonDirac(
            links, mesh, None, None, interpret, bool(antiperiodic_t),
            device_mesh, axis_t, axis_z,
        )
        links = jax.device_put(
            links, NamedSharding(device_mesh, op._links_spec())
        )
        return dataclasses.replace(op, links=links)

    def _axis_size(self, name) -> int:
        if name is None or self.device_mesh is None:
            return 1
        return self.device_mesh.shape[name]

    def _links_spec(self):
        from jax.sharding import PartitionSpec as P

        return P(self.axis_t, None, None, None, self.axis_z, None)

    def _field_spec(self):
        from jax.sharding import PartitionSpec as P

        return P(None, None, self.axis_t, self.axis_z, None)

    def shard_field(self, x):
        """Lay a (4,3,T,Z,V) field out to match this operator's sharding."""
        from jax.sharding import NamedSharding

        return jax.device_put(
            x, NamedSharding(self.device_mesh, self._field_spec())
        )

    def local_mesh(self) -> LatticeMesh:
        """Per-shard lattice extents under the device mesh."""
        t, z, y, xx = self.mesh.spacetime_dims
        return LatticeMesh(
            (
                t // self._axis_size(self.axis_t),
                z // self._axis_size(self.axis_z),
                y,
                xx,
                4,
                3,
            )
        )

    def apply_local(self, links, psi, k: cplx.CF | None = None) -> cplx.CF:
        """Per-shard apply for use INSIDE an enclosing ``shard_map`` (the
        distributed fused GCR drives this directly)."""
        from mgpgcr_tpu.ops.pallas.dslash_dist import dslash_apply_local

        return dslash_apply_local(
            links,
            psi,
            self.local_mesh(),
            self.axis_t,
            self._axis_size(self.axis_t),
            self.axis_z,
            self._axis_size(self.axis_z),
            k=k,
            anti_t=self.anti_t,
            interpret=self.interpret,
        )

    @property
    def shape(self) -> tuple[int, int]:
        return (self.mesh.size, self.mesh.size)

    @property
    def field_shape(self) -> tuple[int, ...]:
        t, z, y, xx = self.mesh.spacetime_dims
        return (4, 3, t, z, y * xx)

    def apply(self, psi: cplx.CF) -> cplx.CF:
        if self.device_mesh is not None:
            fn = jax.shard_map(
                lambda l, p: self.apply_local(l, p),
                mesh=self.device_mesh,
                in_specs=(self._links_spec(), self._field_spec()),
                out_specs=self._field_spec(),
                # pallas_call out_shapes carry no vma annotations
                check_vma=False,
            )
            return fn(self.links, psi)
        return dslash_apply(
            self.links, psi, self.mesh, self.tb, self.zb, self.interpret,
            anti_t=self.anti_t,
        )

    def apply_dirac(self, psi: cplx.CF, k) -> cplx.CF:
        """A psi = psi - k D psi fused into the kernel (one HBM pass; the
        reference's DiracOp application, Operator.h:570-574)."""
        k = cplx.ascf(k, psi.dtype)
        if self.device_mesh is not None:
            from jax.sharding import PartitionSpec as P

            fn = jax.shard_map(
                lambda l, p, kk: self.apply_local(l, p, k=kk),
                mesh=self.device_mesh,
                in_specs=(self._links_spec(), self._field_spec(), P()),
                out_specs=self._field_spec(),
                check_vma=False,
            )
            return fn(self.links, psi, k)
        return dslash_apply(
            self.links,
            psi,
            self.mesh,
            self.tb,
            self.zb,
            self.interpret,
            k=k,
            anti_t=self.anti_t,
        )
