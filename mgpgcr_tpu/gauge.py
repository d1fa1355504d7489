"""Quenched SU(3) gauge-configuration generator (Wilson plaquette action).

The reference's hopping matrices come from *thermalised* Monte-Carlo
configurations (conf5_0-4x4-10 / conf5_4-8x8-05, Parse.cpp:13,
main.cpp:837 — the original .mtx blobs are missing). Haar-random ("hot",
beta = 0) links have a different critical hopping parameter and milder
near-null structure, so convergence studies on them are not physically
comparable to the reference's. This module closes that gap in-repo: a
Cabibbo–Marinari pseudo-heat-bath (Kennedy–Pendleton SU(2) subgroup
sampling) plus SU(2)-subgroup overrelaxation for the quenched Wilson
action

    S = -(beta/3) sum_{x, mu<nu} Re tr U_mu(x) U_nu(x+mu) U_mu(x+nu)^H U_nu(x)^H.

Design is jax-native and backend-generic: the whole sweep is one jitted
program of lattice-wide batched 3x3 matmuls and jnp.roll shifts (the same
idiom as the Wilson stencil, ops/wilson.py) — complex128 on CPU for exact
validation, complex64 on TPU for large volumes. Even-odd checkerboarding
makes every update site independent: the staple of U_mu(x) involves
same-direction links only at x +- nu (opposite parity), so all sites of
one (mu, parity) sublattice update simultaneously.

Validation anchor (tests/test_gauge.py): the average plaquette
<P> = <(1/3) Re tr U U U^H U^H> at beta = 6.0 is 0.5937 (the standard
tadpole factor u0 = <P>^(1/4) = 0.8778), reproduced here within finite-
volume/statistics tolerance; links stay exactly SU(3) (re-unitarised
periodically against rounding drift).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from mgpgcr_tpu.mesh import LatticeMesh

_SUBGROUPS = ((0, 1), (0, 2), (1, 2))


def _roll(u, mu: int, shift: int):
    """Shift a (..., T, Z, Y, X, 3, 3) lattice tensor along direction mu:
    shift=-1 gives f(x + mu), +1 gives f(x - mu) (periodic)."""
    return jnp.roll(u, shift, axis=mu - 6)


def staples(links, mu: int):
    """Sum of the 6 staples A(x) coupling to U_mu(x): the local action is
    -(beta/3) Re tr(U_mu(x) A(x)). links: (4, T, Z, Y, X, 3, 3)."""
    u_mu = links[mu]
    acc = None
    for nu in range(4):
        if nu == mu:
            continue
        u_nu = links[nu]
        # up: U_nu(x+mu) U_mu(x+nu)^H U_nu(x)^H
        up = (
            _roll(u_nu, mu, -1)
            @ _dag(_roll(u_mu, nu, -1))
            @ _dag(u_nu)
        )
        # down: U_nu(x+mu-nu)^H U_mu(x-nu)^H U_nu(x-nu)
        u_nu_dn = _roll(u_nu, nu, 1)
        down = (
            _dag(_roll(u_nu_dn, mu, -1))
            @ _dag(_roll(u_mu, nu, 1))
            @ u_nu_dn
        )
        acc = up + down if acc is None else acc + up + down
    return acc


def _dag(u):
    return jnp.conj(jnp.swapaxes(u, -1, -2))


def plaquette(links) -> jnp.ndarray:
    """Average (1/3) Re tr of the 6 oriented plaquettes per site."""
    tot = 0.0
    n = 0
    for mu in range(4):
        for nu in range(mu + 1, 4):
            p = (
                links[mu]
                @ _roll(links[nu], mu, -1)
                @ _dag(_roll(links[mu], nu, -1))
                @ _dag(links[nu])
            )
            tot = tot + jnp.einsum("...ii->...", p).real.mean() / 3.0
            n += 1
    return tot / n


def _parity_mask(spacetime_dims, parity: int):
    grids = np.indices(spacetime_dims)
    return jnp.asarray((grids.sum(axis=0) % 2) == parity)


def _quat_to_su2(h0, h1, h2, h3, cdt):
    """(h0 + i h.sigma) as a (..., 2, 2) complex matrix."""
    row0 = jnp.stack([h0 + 1j * h3, h2 + 1j * h1], axis=-1)
    row1 = jnp.stack([-h2 + 1j * h1, h0 - 1j * h3], axis=-1)
    return jnp.stack([row0, row1], axis=-2).astype(cdt)


def _w_quaternion(w, i: int, j: int):
    """Quaternion components of the SU(2)-span part of the (i, j) 2x2
    submatrix of w: Re tr(g w_sub) = 2 (g0 x0 - g.x) sees only these."""
    w00 = w[..., i, i]
    w01 = w[..., i, j]
    w10 = w[..., j, i]
    w11 = w[..., j, j]
    x0 = (w00.real + w11.real) * 0.5
    x1 = (w01.imag + w10.imag) * 0.5
    x2 = (w01.real - w10.real) * 0.5
    x3 = (w00.imag - w11.imag) * 0.5
    return x0, x1, x2, x3


def _kp_sample(key, alpha, n_tries: int = 60):
    """Kennedy--Pendleton: h0 on [-1, 1] with density ~ sqrt(1 - h0^2)
    exp(2 alpha h0), vectorised with masked rejection retries (acceptance
    ~ O(1) for the alpha = beta xi / 3 of beta >~ 1 gauge fields; sites
    still unaccepted after n_tries keep their last proposal — probability
    < 1e-9 per site at production beta). Returns (h0, accepted_any)."""
    rdt = alpha.dtype
    shape = alpha.shape
    # h0 = 1 - 2 lambda^2 with P(h0) ~ sqrt(1-h0^2) e^{2 alpha h0} means
    # s = lambda^2 ~ Gamma(3/2, rate 4 alpha) before the sqrt(1-lambda^2)
    # rejection: Exp(4a) + cos^2 * Exp(4a) = Gamma(1) + Gamma(1/2)
    a = jnp.maximum(4.0 * alpha, jnp.asarray(1e-12, rdt))

    def body(c, key_t):
        h0, done = c
        k1, k2, k3, k4 = jax.random.split(key_t, 4)
        eps = jnp.asarray(1e-12, rdt)
        r1 = jax.random.uniform(k1, shape, rdt, eps, 1.0)
        r2 = jax.random.uniform(k2, shape, rdt)
        r3 = jax.random.uniform(k3, shape, rdt, eps, 1.0)
        r4 = jax.random.uniform(k4, shape, rdt)
        lam2 = -(jnp.log(r1) + jnp.cos(2 * jnp.pi * r2) ** 2 * jnp.log(r3)) / a
        accept = r4 * r4 <= 1.0 - lam2
        h0_new = 1.0 - 2.0 * lam2
        h0 = jnp.where(jnp.logical_and(accept, ~done), h0_new, h0)
        done = jnp.logical_or(done, accept)
        return (h0, done), None

    keys = jax.random.split(key, n_tries)
    (h0, done), _ = jax.lax.scan(
        body, (jnp.zeros(shape, rdt), jnp.zeros(shape, bool)), keys
    )
    return jnp.clip(h0, -1.0, 1.0), done


def _random_su2_from_h0(key, h0, cdt):
    """Complete h0 into a Haar-direction SU(2) element."""
    rdt = h0.dtype
    n = jax.random.normal(key, h0.shape + (3,), rdt)
    norm = jnp.sqrt(jnp.sum(n * n, axis=-1, keepdims=True))
    n = n / jnp.maximum(norm, jnp.asarray(1e-30, rdt))
    s = jnp.sqrt(jnp.maximum(1.0 - h0 * h0, 0.0))
    return _quat_to_su2(
        h0, s * n[..., 0], s * n[..., 1], s * n[..., 2], cdt
    )


def _apply_subgroup(u, g, i: int, j: int):
    """U' = embed_{ij}(g) U: rows i, j of U mixed by the 2x2 g."""
    ri = g[..., 0, 0, None] * u[..., i, :] + g[..., 0, 1, None] * u[..., j, :]
    rj = g[..., 1, 0, None] * u[..., i, :] + g[..., 1, 1, None] * u[..., j, :]
    return u.at[..., i, :].set(ri).at[..., j, :].set(rj)


def _subgroup_v(w, i: int, j: int, cdt):
    """(xi, V) with the su2-part of w_sub = xi * V, V in SU(2)."""
    x0, x1, x2, x3 = _w_quaternion(w, i, j)
    xi = jnp.sqrt(x0 * x0 + x1 * x1 + x2 * x2 + x3 * x3)
    inv = 1.0 / jnp.maximum(xi, jnp.asarray(1e-30, x0.dtype))
    v = _quat_to_su2(x0 * inv, x1 * inv, x2 * inv, x3 * inv, cdt)
    return xi, v


def _heatbath_mu_parity(key, links, mu: int, parity_mask, beta: float):
    """One (mu, parity) sublattice pseudo-heat-bath update."""
    a = staples(links, mu)
    u = links[mu]
    cdt = u.dtype
    for idx, (i, j) in enumerate(_SUBGROUPS):
        sub = jax.random.fold_in(key, idx)
        k_h0, k_dir = jax.random.split(sub)
        w = u @ a
        xi, v = _subgroup_v(w, i, j, cdt)
        alpha = (beta / 3.0) * xi
        h0, _ = _kp_sample(k_h0, alpha)
        h = _random_su2_from_h0(k_dir, h0, cdt)
        g = h @ _dag(v)
        u = _apply_subgroup(u, g, i, j)
    mask = parity_mask[..., None, None]
    return links.at[mu].set(jnp.where(mask, u, links[mu]))


def _overrelax_mu_parity(links, mu: int, parity_mask):
    """One (mu, parity) sublattice microcanonical overrelaxation: each
    SU(2) subgroup reflects to (V^H)^2 — the action-preserving point
    farthest from the current element."""
    a = staples(links, mu)
    u = links[mu]
    cdt = u.dtype
    for i, j in _SUBGROUPS:
        w = u @ a
        _, v = _subgroup_v(w, i, j, cdt)
        vd = _dag(v)
        u = _apply_subgroup(u, vd @ vd, i, j)
    mask = parity_mask[..., None, None]
    return links.at[mu].set(jnp.where(mask, u, links[mu]))


def reunitarize(links):
    """Project each link back to SU(3) (Gram--Schmidt rows + det phase):
    kills complex64 rounding drift accumulated over sweeps."""
    r0 = links[..., 0, :]
    r0 = r0 / jnp.linalg.norm(r0, axis=-1, keepdims=True)
    r1 = links[..., 1, :]
    r1 = r1 - jnp.sum(jnp.conj(r0) * r1, axis=-1, keepdims=True) * r0
    r1 = r1 / jnp.linalg.norm(r1, axis=-1, keepdims=True)
    r2 = jnp.conj(jnp.cross(r0, r1))
    return jnp.stack([r0, r1, r2], axis=-2)


@functools.partial(jax.jit, static_argnames=("beta", "n_or"), donate_argnums=(1,))
def sweep(key, links, beta: float, n_or: int = 3):
    """One full lattice update: 1 pseudo-heat-bath sweep + n_or
    overrelaxation sweeps (all 4 directions x both parities each)."""
    masks = [
        _parity_mask(links.shape[1:5], p) for p in (0, 1)
    ]
    for mu in range(4):
        for p in (0, 1):
            k = jax.random.fold_in(key, 2 * mu + p)
            links = _heatbath_mu_parity(k, links, mu, masks[p], beta)
    for s in range(n_or):
        for mu in range(4):
            for p in (0, 1):
                links = _overrelax_mu_parity(links, mu, masks[p])
    return reunitarize(links)


def thermalized_links(
    seed: int,
    mesh: LatticeMesh,
    beta: float = 6.0,
    n_sweeps: int = 100,
    n_or: int = 3,
    dtype=jnp.complex64,
    start: str = "hot",
    measure_every: int = 10,
    device=None,
):
    """Generate a quenched gauge configuration, canonical layout
    (4, T, Z, Y, X, 3, 3) — drop-in wherever ``random_links`` is used
    (ops/wilson.py materialisers, links_to_tpu, the Pallas Dslash).

    Returns (links, plaquette_history). ~n_sweeps combined HB+OR sweeps
    from a hot (Haar) or cold (unit) start; O(100) sweeps thermalises the
    plaquette at beta ~ 6 on small volumes.

    ``device``: placement for the sweeps. Default: the CPU backend
    whenever the session default is an accelerator — generation is
    complex-valued and the tunneled TPU backend has no complex support
    at all (UNIMPLEMENTED even for complex64 matmul); the solve-side
    consumers take split re/im f32 anyway. Pass a device explicitly to
    override."""
    if device is None and jax.default_backend() != "cpu":
        device = jax.devices("cpu")[0]
    key = jax.random.PRNGKey(seed)
    st = mesh.spacetime_dims
    import contextlib

    ctx = jax.default_device(device) if device is not None else contextlib.nullcontext()
    with ctx:
        if start == "cold":
            eye = jnp.eye(3, dtype=dtype)
            links = jnp.broadcast_to(eye, (4, *st, 3, 3)).astype(dtype)
        else:
            # host-side Haar start: accelerator backends lack complex QR
            # and the hot start is a one-time host cost anyway
            from mgpgcr_tpu.ops.wilson import random_links_np

            links = jnp.asarray(random_links_np(seed, mesh), dtype)
        hist = []
        for s in range(n_sweeps):
            links = sweep(jax.random.fold_in(key, 1000 + s), links, beta, n_or)
            if (s + 1) % measure_every == 0 or s == n_sweeps - 1:
                hist.append(float(plaquette(links)))
    return links, hist
