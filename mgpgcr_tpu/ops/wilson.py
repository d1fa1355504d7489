"""Wilson--Dirac hopping operator: matrix-free stencil + explicit generator.

The reference obtains its hopping matrix D from pre-parsed fixture files
(conf5 .mtx configurations, Parse.cpp; the 8^4 one is a missing blob). This
module replaces both roles TPU-natively:

1. ``WilsonDiracOperator`` — a *matrix-free* nearest-neighbour stencil:
   D psi(x) = sum_mu [ (1 - gamma_mu) U_mu(x) psi(x+mu)
                     + (1 + gamma_mu) U_mu^dag(x-mu) psi(x-mu) ].
   On TPU this is the speed-of-light formulation: neighbour access is
   ``jnp.roll`` (which XLA shards into collective-permutes on a device
   mesh — no gathers at all), colour multiplication is a batched 3x3
   einsum, spin projection a batched 4x4 einsum.

2. ``materialize_ell`` / ``random_links`` — explicit sparse assembly of the
   same operator, generating fixtures of any lattice size (the synthetic
   replacement for the reference's missing 8x8parsed.txt). In the Dirac
   basis, (1 +- gamma_t) is diagonal with two zero entries, so every row has
   exactly 3 + 3*12 = 39 nonzeros — matching the checked-in 4^4 fixture's
   uniform 39 nnz/row (data/sample_matrix/4x4parsed.txt header).

Gamma conventions (Dirac basis — the one implied by the reference's gamma5
spinor swap 0<->2, 1<->3, Fields.h:311-338):
  gamma_t = diag(1, 1, -1, -1),  gamma_i = [[0, sigma_i], [-sigma_i, 0]],
  gamma_5 = [[0, I], [I, 0]].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mgpgcr_tpu import cplx
from mgpgcr_tpu.mesh import LatticeMesh
from mgpgcr_tpu.ops.base import LinearOperator, operator_dataclass
from mgpgcr_tpu.ops.csr import CSRMatrix
from mgpgcr_tpu.ops.ell import ELLOperator

# ---------------------------------------------------------------------------
# gamma matrices (Dirac basis)
# ---------------------------------------------------------------------------
_S1 = np.array([[0, 1], [1, 0]], dtype=np.complex128)
_S2 = np.array([[0, -1j], [1j, 0]], dtype=np.complex128)
_S3 = np.array([[1, 0], [0, -1]], dtype=np.complex128)
_I2 = np.eye(2, dtype=np.complex128)
_Z2 = np.zeros((2, 2), dtype=np.complex128)


def _blk(a, b, c, d):
    return np.block([[a, b], [c, d]])


# Euclidean (Hermitian) gamma matrices in the Dirac basis. Hermiticity is
# load-bearing: it makes D gamma5-hermitian (gamma5 D gamma5 = D^dagger),
# the symmetry the reference's fixtures satisfy (test_hermiticity,
# main.cpp:541-570) and the chiral-doubling MG setup relies on; it also
# makes every hopping projector (1 -+ gamma_mu) rank 2 (half-spinor trick).
# sigma_i belongs to spatial direction i (x=1, y=2, z=3); with the lattice
# dim order (t, z, y, x) that is sigma3->z, sigma2->y, sigma1->x — verified
# against the 4^4 fixture's coupling pattern (its x/y hops mix spins 0<->3,
# z hops 0<->2, t hops are spin-diagonal with half killed).
GAMMA = np.stack(
    [
        _blk(_I2, _Z2, _Z2, -_I2),  # gamma_t
        _blk(_Z2, -1j * _S3, 1j * _S3, _Z2),  # gamma_z
        _blk(_Z2, -1j * _S2, 1j * _S2, _Z2),  # gamma_y
        _blk(_Z2, -1j * _S1, 1j * _S1, _Z2),  # gamma_x
    ]
)
GAMMA5 = _blk(_Z2, _I2, _I2, _Z2)  # spinor swap 0<->2, 1<->3

# hopping spin projectors: P_minus[mu] = 1 - gamma_mu (forward),
#                          P_plus[mu]  = 1 + gamma_mu (backward)
P_MINUS = np.stack([np.eye(4) - GAMMA[mu] for mu in range(4)])
P_PLUS = np.stack([np.eye(4) + GAMMA[mu] for mu in range(4)])


def random_links(
    key: jax.Array, mesh: LatticeMesh, dtype=jnp.complex128
) -> jnp.ndarray:
    """Haar-random SU(3) gauge links, shape (4, T, Z, Y, X, 3, 3)."""
    st = mesh.spacetime_dims
    shape = (4, *st, 3, 3)
    kr, ki = jax.random.split(key)
    z = (
        jax.random.normal(kr, shape) + 1j * jax.random.normal(ki, shape)
    ).astype(dtype)
    q, r = jnp.linalg.qr(z)
    # fix phases so the distribution is Haar, then project U(3) -> SU(3)
    d = jnp.diagonal(r, axis1=-2, axis2=-1)
    q = q * (d / jnp.abs(d))[..., None, :]
    det = jnp.linalg.det(q)
    return q / det[..., None, None] ** (1.0 / 3.0)


def unit_links(mesh: LatticeMesh, dtype=jnp.complex128) -> jnp.ndarray:
    """Free-field (identity) links — useful for exact-spectrum sanity tests."""
    st = mesh.spacetime_dims
    eye = jnp.eye(3, dtype=dtype)
    return jnp.broadcast_to(eye, (4, *st, 3, 3))


def random_links_np(seed: int, mesh: LatticeMesh) -> np.ndarray:
    """Haar-random SU(3) links, pure host-side numpy (complex128).

    Same construction as ``random_links`` (QR of Ginibre + phase fix +
    SU(3) projection), vectorised with numpy so no accelerator backend is
    involved — TPU backends lack complex transfer/linalg kernels and
    per-op dispatch through remote tunnels is slow.
    """
    rng = np.random.default_rng(seed)
    st = mesh.spacetime_dims
    shape = (4, *st, 3, 3)
    z = rng.standard_normal(shape) + 1j * rng.standard_normal(shape)
    q, r = np.linalg.qr(z)
    d = np.einsum("...ii->...i", r)
    q = q * (d / np.abs(d))[..., None, :]
    det = np.linalg.det(q)
    return q / det[..., None, None] ** (1.0 / 3.0)


def antiperiodic_t(links):
    """Anti-periodic temporal boundary condition as a pure link map.

    Negates U_t on the t = T-1 slice (the QCD fermion convention): the
    forward hop crossing the boundary picks up -U_t(T-1) and the backward
    hop at t=0 uses the dagger of the same link, so every stencil
    implementation (canonical, TPU slab, Pallas streaming, even-odd,
    distributed) inherits the boundary phase with no kernel changes.

    Accepts canonical links — (4, T, Z, Y, X, 3, 3) as a complex
    numpy/jnp array or a split re/im ``cplx.CF`` pair — i.e. apply this
    BEFORE ``links_to_tpu``. Note the flipped boundary links are in U(3)
    but not SU(3) (det = -1), so two-row gauge compression
    (``compress_links_tmajor``) no longer reconstructs them exactly; keep
    full 3-row storage for anti-periodic operators.
    """
    if cplx.is_cf(links):
        return cplx.CF(antiperiodic_t(links.re), antiperiodic_t(links.im))
    if isinstance(links, np.ndarray):
        out = links.copy()
        out[0, -1] = -out[0, -1]
        return out
    return links.at[0, -1].multiply(-1)


def random_links_cf(key, mesh: LatticeMesh, dtype=jnp.float32) -> cplx.CF:
    """Haar-random SU(3) links as split re/im (the TPU representation).

    ``key`` may be a jax PRNG key (its first word seeds numpy) or an int.
    Only the final split re/im real pair crosses onto the accelerator.
    """
    if hasattr(key, "dtype"):
        seed = int(np.asarray(jax.random.key_data(key)).ravel()[-1])
    else:
        seed = int(key)
    links = random_links_np(seed, mesh)
    return cplx.CF(
        jnp.asarray(links.real.astype(np.float64), dtype),
        jnp.asarray(links.imag.astype(np.float64), dtype),
    )


def _spin_proj(mat: np.ndarray, like, dt):
    """The 4x4 spin projector as the same representation as ``like``."""
    if cplx.is_cf(like):
        return cplx.CF(
            jnp.asarray(mat.real, dt), jnp.asarray(mat.imag, dt)
        )
    return jnp.asarray(mat, dt)


@operator_dataclass(meta=("mesh",))
class WilsonDiracOperator(LinearOperator):
    """Matrix-free hopping operator D (no diagonal; pair with DiracOperator
    for A = I - kD, matching the reference's fixture convention)."""

    links: jnp.ndarray  # (4, T, Z, Y, X, 3, 3)
    mesh: LatticeMesh

    @property
    def shape(self) -> tuple[int, int]:
        return (self.mesh.size, self.mesh.size)

    def apply(self, x):
        """Representation-generic: x may be a native complex array or a
        split re/im ``cplx.CF`` pair (the TPU path), flat or lattice-shaped."""
        flat = x.ndim < len(self.mesh.dims)
        psi = self.mesh.to_lattice(x) if flat else x
        dt = psi.dtype  # real dtype for CF, complex dtype otherwise
        out = cplx.zeros_like(psi)
        for mu in range(4):
            axis = psi.ndim - 6 + mu
            u = self.links[mu].astype(dt)
            pm = _spin_proj(P_MINUS[mu], psi, dt)
            pp = _spin_proj(P_PLUS[mu], psi, dt)

            # forward: (1 - gamma_mu) U_mu(x) psi(x + mu)
            fwd = cplx.roll(psi, -1, axis)
            fwd = cplx.einsum2("tzyxab,...tzyxsb->...tzyxsa", u, fwd)
            out = out + cplx.einsum2("st,...tc->...sc", pm, fwd)

            # backward: (1 + gamma_mu) U_mu^dag(x - mu) psi(x - mu)
            udag = cplx.roll(cplx.swapaxes(cplx.conj(u), -1, -2), 1, mu)
            bwd = cplx.roll(psi, 1, axis)
            bwd = cplx.einsum2("tzyxab,...tzyxsb->...tzyxsa", udag, bwd)
            out = out + cplx.einsum2("st,...tc->...sc", pp, bwd)
        return self.mesh.to_flat(out) if flat else out


def dirac_apply_np(
    links: np.ndarray, mesh: LatticeMesh, x: np.ndarray, k: complex = 0.0
) -> np.ndarray:
    """A x = x - k D x in pure numpy complex128 — the ground-truth
    residual operator for mixed-precision iterative refinement
    (solvers/refine.py). Host-only by construction: needs neither the
    jax_enable_x64 flag nor any backend (the tunneled TPU has no complex
    support, and flipping x64 on mid-process breaks f32 Pallas tracing).

    Same stencil and flat index convention ((site*4 + spinor)*3 + colour,
    sites row-major t,z,y,x) as ``WilsonDiracOperator``; k = 0 gives the
    bare hopping D. Reference operator: Operator.h:570-574.
    """
    links = np.asarray(links, np.complex128)
    st = mesh.spacetime_dims
    psi = np.asarray(x, np.complex128).reshape(*st, 4, 3)
    out = np.zeros_like(psi)
    for mu in range(4):
        u = links[mu]
        fwd = np.roll(psi, -1, axis=mu)
        fwd = np.einsum("tzyxab,tzyxsb->tzyxsa", u, fwd)
        out += np.einsum("ij,tzyxjc->tzyxic", P_MINUS[mu], fwd)
        udag = np.roll(u.conj().swapaxes(-1, -2), 1, axis=mu)
        bwd = np.roll(psi, 1, axis=mu)
        bwd = np.einsum("tzyxab,tzyxsb->tzyxsa", udag, bwd)
        out += np.einsum("ij,tzyxjc->tzyxic", P_PLUS[mu], bwd)
    res = psi - k * out if k else out
    return res.reshape(-1)


# ---------------------------------------------------------------------------
# explicit assembly (synthetic fixture generator)
# ---------------------------------------------------------------------------
def materialize_csr(links, mesh: LatticeMesh) -> CSRMatrix:
    """Assemble the stencil into an explicit CSR matrix (host-side).

    Produces the reference fixtures' layout: row/col index =
    ((site * 4) + spinor) * 3 + colour with sites row-major in (t,z,y,x)."""
    links = np.asarray(links)
    st = mesh.spacetime_dims
    n_sites = mesh.n_sites
    site_idx = np.arange(n_sites).reshape(st)

    rows_all, cols_all, vals_all = [], [], []
    for mu in range(4):
        nbr_fwd = np.roll(site_idx, -1, axis=mu).ravel()
        nbr_bwd = np.roll(site_idx, 1, axis=mu).ravel()
        u = links[mu].reshape(n_sites, 3, 3)
        udag_shift = np.roll(links[mu], 1, axis=mu).reshape(n_sites, 3, 3)
        udag_shift = udag_shift.conj().transpose(0, 2, 1)
        for proj, nbr, umat in (
            (P_MINUS[mu], nbr_fwd, u),
            (P_PLUS[mu], nbr_bwd, udag_shift),
        ):
            ss, tt = np.nonzero(np.abs(proj) > 1e-14)
            for s, t in zip(ss, tt):
                coeff = proj[s, t]
                for c in range(3):
                    for b in range(3):
                        rows_all.append(np.arange(n_sites) * 12 + s * 3 + c)
                        cols_all.append(nbr * 12 + t * 3 + b)
                        vals_all.append(coeff * umat[:, c, b])
    rows = np.concatenate(rows_all)
    cols = np.concatenate(cols_all)
    vals = np.concatenate(vals_all)
    return CSRMatrix.from_triplets(rows, cols, vals, (mesh.size, mesh.size))


def materialize_ell(links, mesh: LatticeMesh, dtype=None) -> ELLOperator:
    return materialize_csr(links, mesh).to_ell(dtype=dtype)
