"""Even-odd (red-black) decomposition of the Wilson--Dirac operator.

The hopping matrix D couples only sites of opposite parity
p(t,z,y,x) = (t+z+y+x) mod 2, so in parity ordering

    A = I - k D = [[ I        , -k D_eo ],
                   [ -k D_oe  ,  I      ]]

and the even-site Schur complement is S = I - k^2 D_eo D_oe: a
half-dimension system whose spectrum is the *squared* hopping spectrum —
the standard production preconditioning for Wilson fermions.  Solving
A x = b reduces to

    rhs_e = b_e + k D_eo b_o
    solve   (I - k^2 D_eo D_oe) x_e = rhs_e
    x_o   = b_o + k D_oe x_e

(solvers/eo.py drives this).  The reference has no even-odd path — this is
a beyond-parity capability; its operator semantics are exactly the
reference's D (Operator.h:105-574) restricted to the parity blocks,
verified against the full stencil in tests/test_eo.py.

Compact layout: each parity field keeps the TPU layout with the merged
minor axis halved, ``(4, 3, T, Z, Y*(X/2))``.  Site (t,z,y,x) of parity p
lives at xh = x // 2; within a (t,z,y) row the x-coordinate of stored
sites is 2*xh + o with row offset o = (t+z+y+p) mod 2.  Consequences for
the 8 hops (all derived from x = 2*xh + o):

- t, z, y hops leave xh unchanged -> plain axis rolls, exactly as in the
  full-lattice stencil (t/z outer-axis rolls, y a merged-axis roll by
  X/2);
- x hops become a *conditional* shift: forward reads xh + o, backward
  xh + o - 1, i.e. rows with o = 0 (resp. o = 1) shift by 0/-1 planes --
  a per-row select between the field and its segment-rolled copy.

HBM cost: a Schur apply streams both parity link sets once each (same
link bytes as one full-D apply per half, so 2x links per Schur apply) but
all field traffic is half-size, and -- the dominant effect -- every GCR
vector (x, r, direction stacks) halves, so the solver algebra cost per
iteration halves while iteration counts drop with the squared spectrum.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from mgpgcr_tpu import cplx
from mgpgcr_tpu.mesh import LatticeMesh
from mgpgcr_tpu.ops.base import LinearOperator, operator_dataclass
from mgpgcr_tpu.ops.wilson_tpu import (
    accumulate_half,
    colour_mul,
    project_half,
)


def _row_offset_mask(mesh: LatticeMesh, parity: int) -> jnp.ndarray:
    """Boolean (T, Z, Y*(X/2)) mask: True where the row offset
    o = (t+z+y+parity) mod 2 is 1 (i.e. stored x-coords are odd)."""
    t, z, y, xx = mesh.spacetime_dims
    xh = xx // 2
    tt, zz, yy = np.meshgrid(
        np.arange(t), np.arange(z), np.arange(y), indexing="ij"
    )
    o = (tt + zz + yy + parity) % 2 == 1
    return jnp.asarray(np.repeat(o, xh, axis=-1))


def _xh_masks(y: int, xh: int):
    """Masks over the merged Y*(X/2) axis marking xh == X/2-1 and xh == 0."""
    xcoord = np.tile(np.arange(xh), y)
    return jnp.asarray(xcoord == xh - 1), jnp.asarray(xcoord == 0)


def field_to_eo(x, mesh: LatticeMesh):
    """TPU-layout field (..., T, Z, Y*X) -> (even, odd) compact parity
    fields (..., T, Z, Y*(X/2)).  Works on any leading axes (fields,
    links); pure reshape/select, no gathers."""
    t, z, y, xx = mesh.spacetime_dims
    assert xx % 2 == 0, "even-odd needs an even X extent"
    xh = xx // 2
    lat = x.reshape(x.shape[:-1] + (y, xx))
    a = lat[..., 0::2]  # x = 0, 2, 4, ...
    b = lat[..., 1::2]  # x = 1, 3, 5, ...
    a = a.reshape(a.shape[:-2] + (y * xh,))
    b = b.reshape(b.shape[:-2] + (y * xh,))
    # rows where (t+z+y) is odd have their even-parity sites at odd x
    o_even = _row_offset_mask(mesh, 0)
    even = cplx.where(o_even, b, a) if cplx.is_cf(x) else jnp.where(o_even, b, a)
    odd = cplx.where(o_even, a, b) if cplx.is_cf(x) else jnp.where(o_even, a, b)
    return even, odd


def field_from_eo(even, odd, mesh: LatticeMesh):
    """Inverse of :func:`field_to_eo`."""
    t, z, y, xx = mesh.spacetime_dims
    xh = xx // 2
    o_even = _row_offset_mask(mesh, 0)
    w = cplx.where if cplx.is_cf(even) else jnp.where
    a = w(o_even, odd, even)  # entries at even x
    b = w(o_even, even, odd)  # entries at odd x
    a = a.reshape(a.shape[:-1] + (y, xh))
    b = b.reshape(b.shape[:-1] + (y, xh))
    stack = cplx.stack if cplx.is_cf(even) else jnp.stack
    lat = stack([a, b], axis=a.ndim)  # (..., Y, X/2, 2)
    return lat.reshape(lat.shape[:-3] + (y * xx,))


@operator_dataclass(meta=("mesh",))
class EvenOddWilson:
    """Parity-restricted hopping blocks D_eo / D_oe of the Wilson--Dirac
    stencil, on compact parity fields (4, 3, T, Z, Y*(X/2)).

    ``links_e``/``links_o`` are the gauge links based at even/odd sites,
    (4, 3, 3, T, Z, Y*(X/2)).  Build with :meth:`from_full`."""

    links_e: cplx.CF
    links_o: cplx.CF
    mesh: LatticeMesh

    @staticmethod
    def from_full(links_tpu: cplx.CF, mesh: LatticeMesh) -> "EvenOddWilson":
        """Split full-lattice TPU-layout links (4, 3, 3, T, Z, Y*X)."""
        links_e, links_o = field_to_eo(links_tpu, mesh)
        return EvenOddWilson(links_e, links_o, mesh)

    @staticmethod
    def from_dirac(d) -> "EvenOddWilson":
        """Build from a stencil Dirac operator (TpuWilsonDirac or
        PallasWilsonDirac), honouring its boundary condition.

        The streaming Pallas kernel applies the anti-periodic temporal BC
        in-kernel and keeps the stored links pristine SU(3)
        (``d.anti_t``); the even-odd split works from the links alone, so
        the boundary sign must be folded into U_t(T-1) here — otherwise
        the Schur half-system would silently be the PERIODIC operator
        (advisor r4 high finding). Two-row compressed links are rejected:
        the parity blocks need full 3x3 links."""
        links = d.links
        if links.shape[1] == 4:  # t-major (T, 4, rows, 3, Z, V)
            if links.shape[2] != 3:
                raise ValueError(
                    "even-odd needs uncompressed (3-row) links"
                )
            from mgpgcr_tpu.ops.pallas.dslash import links_from_tmajor

            links = links_from_tmajor(links)
        mesh = d.mesh
        if getattr(d, "anti_t", False):
            tdim = mesh.spacetime_dims[0]
            links = links.at[0, :, :, tdim - 1].set(
                -links[0, :, :, tdim - 1]
            )
        return EvenOddWilson.from_full(links, mesh)

    @property
    def field_shape(self) -> tuple[int, ...]:
        t, z, y, xx = self.mesh.spacetime_dims
        return (4, 3, t, z, y * (xx // 2))

    @property
    def half_dim(self) -> int:
        """Half the full operator dimension (mesh.size counts spin*colour)."""
        return self.mesh.size // 2

    def _shift(self, v, mu: int, fwd: bool, parity_out: int):
        """Neighbour value on compact parity fields. v: (3, T, Z, V/2)."""
        t, z, y, xx = self.mesh.spacetime_dims
        xh = xx // 2
        if mu == 0:
            return cplx.roll(v, -1 if fwd else 1, v.ndim - 3)
        if mu == 1:
            return cplx.roll(v, -1 if fwd else 1, v.ndim - 2)
        ax = v.ndim - 1
        if mu == 2:
            return cplx.roll(v, -xh if fwd else xh, ax)
        # x hop: rows with offset o=1 shift forward by one xh plane (with
        # periodic wrap inside the row); o=0 rows shift backward
        mask_last, mask_first = _xh_masks(y, xh)
        o1 = _row_offset_mask(self.mesh, parity_out)
        if fwd:  # input index xh + o
            seg = cplx.where(
                mask_last, cplx.roll(v, xh - 1, ax), cplx.roll(v, -1, ax)
            )
            return cplx.where(o1, seg, v)
        # backward: input index xh + o - 1
        seg = cplx.where(
            mask_first, cplx.roll(v, -(xh - 1), ax), cplx.roll(v, 1, ax)
        )
        return cplx.where(o1, v, seg)

    def _apply(self, psi: cplx.CF, parity_out: int) -> cplx.CF:
        """D restricted: input parity 1-parity_out -> output parity_out."""
        links_out = self.links_e if parity_out == 0 else self.links_o
        links_in = self.links_o if parity_out == 0 else self.links_e
        psi_slabs = [psi[s] for s in range(4)]
        out = [None] * 4
        for mu in range(4):
            # forward: (1 - gamma_mu) U_mu(s) psi(s + mu); U at the output
            # site, applied after the shift
            h = project_half(psi_slabs, mu, True)
            h = [self._shift(hq, mu, True, parity_out) for hq in h]
            g = colour_mul(links_out[mu], h, dagger=False)
            out = accumulate_half(out, g, mu, True)

            # backward: (1 + gamma_mu) U_mu(s-mu)^dag psi(s-mu); product
            # formed at the source site (input parity), then shifted
            h = project_half(psi_slabs, mu, False)
            w = colour_mul(links_in[mu], h, dagger=True)
            w = [self._shift(wq, mu, False, parity_out) for wq in w]
            out = accumulate_half(out, w, mu, False)
        return cplx.stack(out, axis=0)

    def apply_eo(self, psi_odd: cplx.CF) -> cplx.CF:
        """D_eo: odd-parity field -> even-parity field."""
        return self._apply(psi_odd, 0)

    def apply_oe(self, psi_even: cplx.CF) -> cplx.CF:
        """D_oe: even-parity field -> odd-parity field."""
        return self._apply(psi_even, 1)

    def random_field(self, key, dtype=jnp.float32) -> cplx.CF:
        return cplx.random(key, self.field_shape, dtype)


@operator_dataclass
class SchurDirac(LinearOperator):
    """Even-site Schur complement S = I - k^2 D_eo D_oe as a solver-ready
    operator on compact even-parity fields."""

    eo: EvenOddWilson
    k: cplx.CF  # complex hopping parameter (dynamic: k-sweeps don't recompile)

    @property
    def shape(self) -> tuple[int, int]:
        n = self.eo.half_dim
        return (n, n)

    def apply(self, x_even: cplx.CF) -> cplx.CF:
        k2 = self.k * self.k
        return x_even - k2 * self.eo.apply_eo(self.eo.apply_oe(x_even))


def make_schur(eo: EvenOddWilson, k, dtype=jnp.float32) -> SchurDirac:
    return SchurDirac(eo, cplx.ascf(k, dtype))
