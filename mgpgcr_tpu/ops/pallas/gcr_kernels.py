"""Fused GCR-iteration Pallas kernels (split re/im fields).

The GCR hot loop's algebra outside the operator application is pure HBM
streaming: axpys over x/r, the beta contraction against the stored
direction stacks, and the direction update (reference loop GCR.h:222-288;
cost model SemesterProject.pdf §2.2). Left to XLA these are many separate
passes (measured 8 ms/iteration at 32^4 restart 5 on v5e vs ~3 ms of
minimal traffic). These kernels fuse the iteration into three streaming
passes, each touching every large array exactly once:

  K1 update_xr:   x += alpha p, r -= alpha ap, ||r||^2   (p/ap read
                  directly from their stack slots via scalar prefetch)
  K2 beta_dots:   raw_s = <aps_s, az> for all stored directions
  K3 dir_update:  p = z - sum_s beta_s ps_s, ap = az - sum_s beta_s aps_s,
                  written *in place* into stack slot `slot` (aliased
                  outputs), plus ||ap||^2 and <ap, r> — the latter is next
                  iteration's alpha numerator, saving a separate pass.

All kernels grid over row-chunks of 2D-reshaped fields (rows, lanes) and
accumulate scalar reductions across grid steps in SMEM. On non-TPU
backends they run in interpreter mode (used by the CPU parity tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mgpgcr_tpu import cplx


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _compiler_kwargs() -> dict:
    """Raise the scoped-VMEM cap (the row windows exceed the 16 MB default,
    as in the Dslash kernel); no-op in interpreter mode."""
    if _interpret():
        return {}
    return {
        "compiler_params": pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        )
    }


def _as2d(x: jnp.ndarray) -> jnp.ndarray:
    """Collapse leading axes; keep the trailing (lane) axis."""
    if x.ndim == 1:
        return x.reshape(1, x.shape[0])
    return x.reshape(-1, x.shape[-1])


@functools.lru_cache(maxsize=None)
def _chunk_rows(m: int, n: int, n_windows: int, itemsize: int = 4) -> int:
    """Largest divisor of m keeping n_windows live (double-buffered) row
    windows under a ~28 MB VMEM budget."""
    budget = 28 * 1024 * 1024
    for d in sorted((d for d in range(1, m + 1) if m % d == 0), reverse=True):
        if 2 * n_windows * d * n * itemsize <= budget:
            return d
    return 1


def _vspec(shape, index_map):
    return pl.BlockSpec(shape, index_map, memory_space=pltpu.VMEM)


def _smem(shape, index_map):
    return pl.BlockSpec(shape, index_map, memory_space=pltpu.SMEM)


def _acc(ref, idx, value):
    """Accumulate a scalar partial across sequential grid steps."""

    @pl.when(pl.program_id(0) == 0)
    def _():
        ref[idx] = value

    @pl.when(pl.program_id(0) != 0)
    def _():
        ref[idx] += value


# ---------------------------------------------------------------------------
# K1: x += alpha p, r -= alpha ap, r2 = ||r||^2
# ---------------------------------------------------------------------------
def _k1_kernel(
    slot_ref,
    alpha_ref,
    x_re, x_im, r_re, r_im,
    ps_re, ps_im, aps_re, aps_im,
    ox_re, ox_im, or_re, or_im, r2_ref,
):
    del slot_ref
    ar = alpha_ref[0, 0]
    ai = alpha_ref[0, 1]
    p_re, p_im = ps_re[0], ps_im[0]
    a_re, a_im = aps_re[0], aps_im[0]
    ox_re[...] = x_re[...] + (ar * p_re - ai * p_im)
    ox_im[...] = x_im[...] + (ar * p_im + ai * p_re)
    nr_re = r_re[...] - (ar * a_re - ai * a_im)
    nr_im = r_im[...] - (ar * a_im + ai * a_re)
    or_re[...] = nr_re
    or_im[...] = nr_im
    _acc(r2_ref, (0, 0), jnp.sum(nr_re * nr_re + nr_im * nr_im))


def update_xr(x: cplx.CF, r: cplx.CF, ps: cplx.CF, aps: cplx.CF, slot, alpha: cplx.CF):
    """Returns (x', r', r2). ps/aps are the (S, ...) direction stacks; the
    current direction lives in row `slot` (traced int32)."""
    shape, dt = x.shape, x.dtype
    x2, r2d = _as2d(x.re), None
    m, n = x2.shape
    s = ps.shape[0]
    rows = _chunk_rows(m, n, 8)
    grid = (m // rows,)

    field = _vspec((rows, n), lambda i, sl: (i, 0))
    stack = _vspec((1, rows, n), lambda i, sl: (sl[0], i, 0))
    out_field = _vspec((rows, n), lambda i, sl: (i, 0))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            _smem((1, 2), lambda i, sl: (0, 0)),
            field, field, field, field,
            stack, stack, stack, stack,
        ],
        out_specs=(
            out_field, out_field, out_field, out_field,
            _smem((1, 1), lambda i, sl: (0, 0)),
        ),
    )
    alpha_arr = jnp.stack([alpha.re, alpha.im]).astype(dt).reshape(1, 2)
    ox_re, ox_im, or_re, or_im, r2 = pl.pallas_call(
        _k1_kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((m, n), dt),
            jax.ShapeDtypeStruct((m, n), dt),
            jax.ShapeDtypeStruct((m, n), dt),
            jax.ShapeDtypeStruct((m, n), dt),
            jax.ShapeDtypeStruct((1, 1), dt),
        ),
        interpret=_interpret(),
        **_compiler_kwargs(),
    )(
        jnp.asarray([slot], jnp.int32),
        alpha_arr,
        _as2d(x.re), _as2d(x.im), _as2d(r.re), _as2d(r.im),
        ps.re.reshape(s, m, n), ps.im.reshape(s, m, n),
        aps.re.reshape(s, m, n), aps.im.reshape(s, m, n),
    )
    return (
        cplx.CF(ox_re.reshape(shape), ox_im.reshape(shape)),
        cplx.CF(or_re.reshape(shape), or_im.reshape(shape)),
        r2[0, 0],
    )


# ---------------------------------------------------------------------------
# K2: raw_s = <aps_s, az>
# ---------------------------------------------------------------------------
def _k2_kernel(aps_re, aps_im, az_re, az_im, out_ref, *, s: int, lim: int):
    zr, zi = az_re[...], az_im[...]

    @pl.when(pl.program_id(0) == 0)
    def _():
        # slots beyond the valid prefix are never streamed; their dot rows
        # must still hold zeros (the caller's ap_norms mask discards them,
        # but uninitialised SMEM could be NaN)
        for j in range(lim, s):
            out_ref[j, 0] = jnp.zeros((), out_ref.dtype)
            out_ref[j, 1] = jnp.zeros((), out_ref.dtype)

    for j in range(lim):
        ar, ai = aps_re[j], aps_im[j]
        _acc(out_ref, (j, 0), jnp.sum(ar * zr + ai * zi))
        _acc(out_ref, (j, 1), jnp.sum(ar * zi - ai * zr))


def beta_dots(aps: cplx.CF, az: cplx.CF, lim: int | None = None) -> cplx.CF:
    """<aps_s, az> for the stored directions, one streaming pass.

    ``lim`` (static) bounds the valid direction count: only stack rows
    [0:lim] are streamed from HBM — with restart R the valid count cycles
    1..R, so reading the full stack every iteration would move ~2x the
    needed bytes. Valid slots are always a prefix (the ring fills 0,1,2,..
    after each restart wipe). Rows >= lim return 0.
    """
    dt = az.dtype
    z2 = _as2d(az.re)
    m, n = z2.shape
    s = aps.shape[0]
    lim = s if lim is None else lim
    rows = _chunk_rows(m, n, 2 * (lim + 1))
    grid = (m // rows,)
    stack = _vspec((max(lim, 1), rows, n), lambda i: (0, i, 0))
    field = _vspec((rows, n), lambda i: (i, 0))
    out = pl.pallas_call(
        functools.partial(_k2_kernel, s=s, lim=lim),
        grid=grid,
        in_specs=[stack, stack, field, field],
        out_specs=_smem((s, 2), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((s, 2), dt),
        interpret=_interpret(),
        **_compiler_kwargs(),
    )(
        aps.re.reshape(s, m, n), aps.im.reshape(s, m, n),
        _as2d(az.re), _as2d(az.im),
    )
    return cplx.CF(out[:, 0], out[:, 1])


# ---------------------------------------------------------------------------
# K3: direction update written in place into the stack slot
# ---------------------------------------------------------------------------
def _k3_kernel(slot_ref, betas_ref, *refs, lim: int, with_r: bool):
    del slot_ref
    if with_r:
        (z_re, z_im, az_re, az_im, r_re, r_im,
         ps_re, ps_im, aps_re, aps_im,
         ops_re, ops_im, oaps_re, oaps_im, apn_ref, apr_ref) = refs
    else:
        # unpreconditioned iteration: z IS r, so <ap, r> dots against the
        # z window instead of streaming the same field a second time
        (z_re, z_im, az_re, az_im,
         ps_re, ps_im, aps_re, aps_im,
         ops_re, ops_im, oaps_re, oaps_im, apn_ref, apr_ref) = refs
        r_re, r_im = z_re, z_im
    p_re, p_im = z_re[...], z_im[...]
    a_re, a_im = az_re[...], az_im[...]
    for j in range(lim):
        br = betas_ref[j, 0]
        bi = betas_ref[j, 1]
        p_re = p_re - (br * ps_re[j] - bi * ps_im[j])
        p_im = p_im - (br * ps_im[j] + bi * ps_re[j])
        a_re = a_re - (br * aps_re[j] - bi * aps_im[j])
        a_im = a_im - (br * aps_im[j] + bi * aps_re[j])
    ops_re[0] = p_re
    ops_im[0] = p_im
    oaps_re[0] = a_re
    oaps_im[0] = a_im
    _acc(apn_ref, (0, 0), jnp.sum(a_re * a_re + a_im * a_im))
    rr, ri = r_re[...], r_im[...]
    _acc(apr_ref, (0, 0), jnp.sum(a_re * rr + a_im * ri))
    _acc(apr_ref, (0, 1), jnp.sum(a_re * ri - a_im * rr))


def dir_update(
    z, az, r, ps: cplx.CF, aps: cplx.CF, betas: cplx.CF, slot,
    lim: int | None = None,
):
    """p = z - sum betas ps, ap = az - sum betas aps, stored into stack row
    `slot` in place (other rows pass through untouched via output
    aliasing). Returns (ps', aps', ap_norm2, <ap, r>).

    ``lim`` (static) bounds the correction sum to the valid stack prefix
    [0:lim] — only those rows are streamed (betas for empty slots are zero
    anyway, but streaming them would double the pass's HBM traffic at
    restart R on average).

    ``r=None`` marks the unpreconditioned iteration (z is r): the <ap, r>
    dot then reuses the z window, saving one full-field HBM read."""
    dt = az.dtype
    z2 = _as2d(az.re)
    m, n = z2.shape
    s = ps.shape[0]
    lim = s if lim is None else lim
    with_r = r is not None
    rows = _chunk_rows(m, n, 2 * (4 * lim + 3 + (2 if with_r else 0)))
    grid = (m // rows,)

    field = _vspec((rows, n), lambda i, sl: (i, 0))
    stack_in = _vspec((max(lim, 1), rows, n), lambda i, sl: (0, i, 0))
    stack_out = _vspec((1, rows, n), lambda i, sl: (sl[0], i, 0))

    n_fields = 6 if with_r else 4
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[_smem((s, 2), lambda i, sl: (0, 0))]
        + [field] * n_fields
        + [stack_in, stack_in, stack_in, stack_in],
        out_specs=(
            stack_out, stack_out, stack_out, stack_out,
            _smem((1, 1), lambda i, sl: (0, 0)),
            _smem((1, 2), lambda i, sl: (0, 0)),
        ),
    )
    betas_arr = jnp.stack([betas.re, betas.im], axis=1).astype(dt)
    # aliases: operand k -> output k', counting pallas_call positional args
    # (scalar-prefetch arg included) so the stacks update in place
    first_stack = 2 + n_fields
    aliases = {first_stack + j: j for j in range(4)}
    field_args = [_as2d(z.re), _as2d(z.im), _as2d(az.re), _as2d(az.im)]
    if with_r:
        field_args += [_as2d(r.re), _as2d(r.im)]
    ops_re, ops_im, oaps_re, oaps_im, apn, apr = pl.pallas_call(
        functools.partial(_k3_kernel, lim=lim, with_r=with_r),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((s, m, n), dt),
            jax.ShapeDtypeStruct((s, m, n), dt),
            jax.ShapeDtypeStruct((s, m, n), dt),
            jax.ShapeDtypeStruct((s, m, n), dt),
            jax.ShapeDtypeStruct((1, 1), dt),
            jax.ShapeDtypeStruct((1, 2), dt),
        ),
        input_output_aliases=aliases,
        interpret=_interpret(),
        **_compiler_kwargs(),
    )(
        jnp.asarray([slot], jnp.int32),
        betas_arr,
        *field_args,
        ps.re.reshape(s, m, n), ps.im.reshape(s, m, n),
        aps.re.reshape(s, m, n), aps.im.reshape(s, m, n),
    )
    shape = ps.shape
    return (
        cplx.CF(ops_re.reshape(shape), ops_im.reshape(shape)),
        cplx.CF(oaps_re.reshape(shape), oaps_im.reshape(shape)),
        apn[0, 0],
        cplx.CF(apr[0, 0], apr[0, 1]),
    )


# ---------------------------------------------------------------------------
# K3z: ap-only direction update (z-basis GCR): the search directions p are
# never materialised — only A p lives in the stack; p's expansion over the
# cycle's z vectors is tracked as scalar coefficients by the solver and
# resolved once per cycle by basis_flush.
# ---------------------------------------------------------------------------
def _k3z_kernel(slot_ref, betas_ref, *refs, lim: int, with_r: bool):
    del slot_ref
    if with_r:
        (az_re, az_im, r_re, r_im, aps_re, aps_im,
         oaps_re, oaps_im, apn_ref, apr_ref) = refs
    else:
        (az_re, az_im, aps_re, aps_im,
         oaps_re, oaps_im, apn_ref) = refs
    a_re, a_im = az_re[...], az_im[...]
    for j in range(lim):
        br = betas_ref[j, 0]
        bi = betas_ref[j, 1]
        a_re = a_re - (br * aps_re[j] - bi * aps_im[j])
        a_im = a_im - (br * aps_im[j] + bi * aps_re[j])
    oaps_re[0] = a_re
    oaps_im[0] = a_im
    _acc(apn_ref, (0, 0), jnp.sum(a_re * a_re + a_im * a_im))
    if with_r:
        rr, ri = r_re[...], r_im[...]
        _acc(apr_ref, (0, 0), jnp.sum(a_re * rr + a_im * ri))
        _acc(apr_ref, (0, 1), jnp.sum(a_re * ri - a_im * rr))


def ap_update(az, r, aps: cplx.CF, betas: cplx.CF, slot, lim: int):
    """ap = az - sum_{j<lim} betas_j aps_j written in place into stack row
    ``slot`` (other rows pass through via output aliasing). Also returns
    this direction's ||ap||^2 and, when ``r`` is given, <ap, r> (next
    iteration's alpha numerator; pass r=None when the caller derives it
    from the fused step's dot recursion instead — one field pass less).
    The direction p itself is never formed (z-basis GCR)."""
    dt = az.dtype
    z2 = _as2d(az.re)
    m, n = z2.shape
    s = aps.shape[0]
    with_r = r is not None
    rows = _chunk_rows(m, n, 2 * (2 * lim + 3 + (2 if with_r else 0)))
    grid = (m // rows,)

    field = _vspec((rows, n), lambda i, sl: (i, 0))
    stack_in = _vspec((max(lim, 1), rows, n), lambda i, sl: (0, i, 0))
    stack_out = _vspec((1, rows, n), lambda i, sl: (sl[0], i, 0))

    n_fields = 4 if with_r else 2
    out_specs = (
        stack_out, stack_out,
        _smem((1, 1), lambda i, sl: (0, 0)),
    )
    out_shape = [
        jax.ShapeDtypeStruct((s, m, n), dt),
        jax.ShapeDtypeStruct((s, m, n), dt),
        jax.ShapeDtypeStruct((1, 1), dt),
    ]
    if with_r:
        out_specs = out_specs + (_smem((1, 2), lambda i, sl: (0, 0)),)
        out_shape.append(jax.ShapeDtypeStruct((1, 2), dt))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[_smem((s, 2), lambda i, sl: (0, 0))]
        + [field] * n_fields
        + [stack_in, stack_in],
        out_specs=out_specs,
    )
    betas_arr = jnp.stack([betas.re, betas.im], axis=1).astype(dt)
    field_args = [_as2d(az.re), _as2d(az.im)]
    if with_r:
        field_args += [_as2d(r.re), _as2d(r.im)]
    first_stack = 2 + n_fields
    outs = pl.pallas_call(
        functools.partial(_k3z_kernel, lim=lim, with_r=with_r),
        grid_spec=grid_spec,
        out_shape=tuple(out_shape),
        input_output_aliases={first_stack: 0, first_stack + 1: 1},
        interpret=_interpret(),
        **_compiler_kwargs(),
    )(
        jnp.asarray([slot], jnp.int32),
        betas_arr,
        *field_args,
        aps.re.reshape(s, m, n), aps.im.reshape(s, m, n),
    )
    oaps_re, oaps_im, apn = outs[:3]
    shape = aps.shape
    res = (
        cplx.CF(oaps_re.reshape(shape), oaps_im.reshape(shape)),
        apn[0, 0],
    )
    if with_r:
        apr = outs[3]
        res = res + (cplx.CF(apr[0, 0], apr[0, 1]),)
    return res


# ---------------------------------------------------------------------------
# K4z: cycle-end basis resolution (z-basis GCR): one streaming pass over
# the cycle's basis vectors [p0, z_1..z_R] producing BOTH the solution
# update x' = x + sum_m wx_m b_m and the next cycle's seed direction
# p0' = sum_m wp_m b_m.
# ---------------------------------------------------------------------------
def _k4z_kernel(w_ref, *refs, nb: int):
    # refs: x, basis b_0..b_{nb-1} (re/im pairs), then outputs ox, op0
    x_re, x_im = refs[0], refs[1]
    ox_re, ox_im = refs[-4], refs[-3]
    op_re, op_im = refs[-2], refs[-1]
    acc_re = x_re[...]
    acc_im = x_im[...]
    p_re = jnp.zeros_like(acc_re)
    p_im = jnp.zeros_like(acc_im)
    for mref in range(nb):
        b_re = refs[2 + 2 * mref][...]
        b_im = refs[3 + 2 * mref][...]
        xr = w_ref[mref, 0]
        xi = w_ref[mref, 1]
        pr = w_ref[mref, 2]
        pi = w_ref[mref, 3]
        acc_re = acc_re + (xr * b_re - xi * b_im)
        acc_im = acc_im + (xr * b_im + xi * b_re)
        p_re = p_re + (pr * b_re - pi * b_im)
        p_im = p_im + (pr * b_im + pi * b_re)
    ox_re[...] = acc_re
    ox_im[...] = acc_im
    op_re[...] = p_re
    op_im[...] = p_im


def basis_flush(x: cplx.CF, basis, wx, wp):
    """(x', p0') from one pass over the basis vectors.

    basis: list of CF fields [b_0..b_{nb-1}]; wx/wp: lists of CF scalars.
    x' = x + sum wx_m b_m;  p0' = sum wp_m b_m."""
    dt = x.dtype
    shape = x.shape
    x2 = _as2d(x.re)
    m, n = x2.shape
    nb = len(basis)
    rows = _chunk_rows(m, n, 2 * (2 * nb + 4))
    grid = (m // rows,)
    field = _vspec((rows, n), lambda i: (i, 0))

    w_arr = jnp.stack(
        [
            jnp.stack([w.re for w in wx]),
            jnp.stack([w.im for w in wx]),
            jnp.stack([w.re for w in wp]),
            jnp.stack([w.im for w in wp]),
        ],
        axis=1,
    ).astype(dt)
    args = [w_arr, x2, _as2d(x.im)]
    for b in basis:
        args += [_as2d(b.re), _as2d(b.im)]
    ox_re, ox_im, op_re, op_im = pl.pallas_call(
        functools.partial(_k4z_kernel, nb=nb),
        grid=grid,
        in_specs=[_smem((nb, 4), lambda i: (0, 0))]
        + [field] * (2 + 2 * nb),
        out_specs=(field, field, field, field),
        out_shape=(
            jax.ShapeDtypeStruct((m, n), dt),
            jax.ShapeDtypeStruct((m, n), dt),
            jax.ShapeDtypeStruct((m, n), dt),
            jax.ShapeDtypeStruct((m, n), dt),
        ),
        interpret=_interpret(),
        **_compiler_kwargs(),
    )(*args)
    return (
        cplx.CF(ox_re.reshape(shape), ox_im.reshape(shape)),
        cplx.CF(op_re.reshape(shape), op_im.reshape(shape)),
    )


# ---------------------------------------------------------------------------
# K1r: r -= alpha ap, r2 = ||r||^2  (deferred-x variant of K1: x is not
# touched — its alpha p contributions accumulate in an alphas buffer and
# are flushed from the direction stack once per restart cycle by K4)
# ---------------------------------------------------------------------------
def _k1r_kernel(slot_ref, alpha_ref, r_re, r_im, aps_re, aps_im,
                or_re, or_im, r2_ref):
    del slot_ref
    ar = alpha_ref[0, 0]
    ai = alpha_ref[0, 1]
    a_re, a_im = aps_re[0], aps_im[0]
    nr_re = r_re[...] - (ar * a_re - ai * a_im)
    nr_im = r_im[...] - (ar * a_im + ai * a_re)
    or_re[...] = nr_re
    or_im[...] = nr_im
    _acc(r2_ref, (0, 0), jnp.sum(nr_re * nr_re + nr_im * nr_im))


def update_r(r: cplx.CF, aps: cplx.CF, slot, alpha: cplx.CF):
    """Returns (r', r2) with r' = r - alpha aps[slot]. Three field passes
    (r in, aps row in, r out) vs K1's six: the x += alpha p half is
    deferred to the cycle-end basis_flush."""
    shape, dt = r.shape, r.dtype
    r2d = _as2d(r.re)
    m, n = r2d.shape
    s = aps.shape[0]
    rows = _chunk_rows(m, n, 5)
    grid = (m // rows,)

    field = _vspec((rows, n), lambda i, sl: (i, 0))
    stack = _vspec((1, rows, n), lambda i, sl: (sl[0], i, 0))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[_smem((1, 2), lambda i, sl: (0, 0)), field, field, stack, stack],
        out_specs=(field, field, _smem((1, 1), lambda i, sl: (0, 0))),
    )
    alpha_arr = jnp.stack([alpha.re, alpha.im]).astype(dt).reshape(1, 2)
    or_re, or_im, r2 = pl.pallas_call(
        _k1r_kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((m, n), dt),
            jax.ShapeDtypeStruct((m, n), dt),
            jax.ShapeDtypeStruct((1, 1), dt),
        ),
        interpret=_interpret(),
        **_compiler_kwargs(),
    )(
        jnp.asarray([slot], jnp.int32),
        alpha_arr,
        r2d, _as2d(r.im),
        aps.re.reshape(s, m, n), aps.im.reshape(s, m, n),
    )
    return (
        cplx.CF(or_re.reshape(shape), or_im.reshape(shape)),
        r2[0, 0],
    )
