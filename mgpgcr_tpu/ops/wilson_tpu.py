"""Wilson--Dirac hopping stencil in the TPU-optimal memory layout.

Why a second layout: TPU memory is tiled on the last two array axes
(sublane 8 x lane 128). The canonical field layout (T,Z,Y,X,4,3) — the
reference's index order (Mesh.h:369-398) — puts the tiny spinor/colour axes
in the tiled positions and pads 4->8 and 3->128: a 40-85x memory blow-up
(measured: a 32^4 solve "used 29.5G of 15.75G HBM" at 3.6% utilization).

This module's layout is ``(spin 4, colour 3, T, Z, Y*X)``: the tiled axes
are (Z, Y*X), which for production lattices are multiples of (8, 128) —
zero padding, full 8x128 vector lanes. Nearest-neighbour shifts stay cheap:
- t, z: rolls of *outer* axes — pure slice/concat, no relayout, and when
  those axes are sharded over a device mesh they become one-plane
  ``ppermute`` halo exchanges (parallel/halo.py);
- y: a roll of the merged Y*X axis by ±X (periodic wrap is exact);
- x: two rolls (±1 and ∓(X-1)) blended by a precomputed boundary mask.

Compute uses the half-spinor projection trick: (1 ∓ gamma_mu) has rank 2,
so each hop projects to 2 spin components before the SU(3) colour multiply
and reconstructs after — halving the dominant contraction. All arithmetic
is split re/im (``cplx.CF``): TPUs have no complex registers.

Capability parity: this operator computes exactly the reference's hopping
matrix D (fixture semantics of Parse.cpp / Operator.h:105-574), verified
against the canonical-layout ``ops/wilson.py`` and the 4^4 fixture.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from mgpgcr_tpu import cplx
from mgpgcr_tpu.mesh import LatticeMesh
from mgpgcr_tpu.ops.base import LinearOperator, operator_dataclass
from mgpgcr_tpu.ops.wilson import GAMMA

# Half-spinor hop algebra. Each hopping factor (1 -+ gamma_mu) has rank 2,
# so a hop projects psi to a 2-spin half field before the SU(3) colour
# multiply / site shift and reconstructs after — halving the dominant
# arithmetic and the shifted traffic. In the Dirac basis every projection /
# reconstruction coefficient is +-1 or +-i, so the whole spin algebra costs
# only adds, subtracts, and re/im swaps (no complex scalar multiplies) —
# the TPU VPU is the Dslash's compute bottleneck, so this matters as much
# as HBM traffic. Derivation: gamma_mu = [[0, A], [A^H, 0]] with A = -i
# sigma_mu and A^H A = I gives
#   (1 - gamma_mu) psi = (h, -A^H h) with h = psi' - A psi''
#   (1 + gamma_mu) psi = (h, +A^H h) with h = psi' + A psi''
# (psi' = spins 0,1; psi'' = spins 2,3); the temporal projectors are
# diagonal: (1 - gamma_t) = diag(0,0,2,2), (1 + gamma_t) = diag(2,2,0,0).

# spatial table: mu (1=z, 2=y, 3=x) -> (j0, c0, j1, c1, k2, r2, k3, r3),
# for the *forward* factor (1 - gamma_mu):
#   h0 = psi0 + c0 psi_{j0},  h1 = psi1 + c1 psi_{j1}
#   out2 += r2 g_{k2},        out3 += r3 g_{k3}         (g = U . h)
# backward (1 + gamma_mu) flips the sign of every coefficient.
_J = 1j
HALF_SPINOR = {
    1: (2, _J, 3, -_J, 0, -_J, 1, _J),
    2: (3, 1, 2, -1, 1, -1, 0, 1),
    3: (3, _J, 2, _J, 1, -_J, 0, -_J),
}


def add_unit(a, c, b):
    """a + c * b for unit coefficient c in {1, -1, i, -i}; a may be None
    (pure accumulate-init). On split re/im the +-i cases are re/im swaps
    folded into the add/sub — zero extra arithmetic."""
    if cplx.is_cf(b):
        if a is None:
            if c == 1:
                return b
            if c == -1:
                return -b
            if c == _J:
                return cplx.CF(-b.im, b.re)
            return cplx.CF(b.im, -b.re)
        if c == 1:
            return a + b
        if c == -1:
            return a - b
        if c == _J:
            return cplx.CF(a.re - b.im, a.im + b.re)
        return cplx.CF(a.re + b.im, a.im - b.re)
    term = b if c == 1 else c * b
    return term if a is None else a + term


def add_scaled(a, s: float, b):
    """a + s * b for a real scalar s (fma on the VPU); a may be None."""
    if cplx.is_cf(b):
        if a is None:
            return cplx.CF(s * b.re, s * b.im)
        return cplx.CF(a.re + s * b.re, a.im + s * b.im)
    return s * b if a is None else a + s * b


def project_half(psi_slabs: list, mu: int, fwd: bool) -> list:
    """(1 -+ gamma_mu) psi -> independent 2-spin half field [h0, h1]."""
    if mu == 0:
        lo = 2 if fwd else 0
        return [psi_slabs[lo], psi_slabs[lo + 1]]
    j0, c0, j1, c1, _, _, _, _ = HALF_SPINOR[mu]
    if not fwd:
        c0, c1 = -c0, -c1
    return [
        add_unit(psi_slabs[0], c0, psi_slabs[j0]),
        add_unit(psi_slabs[1], c1, psi_slabs[j1]),
    ]


def accumulate_half(out: list, g: list, mu: int, fwd: bool) -> list:
    """out += reconstruction of the hop's 4-spin contribution from the
    colour-multiplied half field g = U^(H) . h."""
    if mu == 0:
        base = 2 if fwd else 0
        out[base] = add_scaled(out[base], 2.0, g[0])
        out[base + 1] = add_scaled(out[base + 1], 2.0, g[1])
        return out
    _, _, _, _, k2, r2, k3, r3 = HALF_SPINOR[mu]
    if not fwd:
        r2, r3 = -r2, -r3
    out[0] = g[0] if out[0] is None else out[0] + g[0]
    out[1] = g[1] if out[1] is None else out[1] + g[1]
    out[2] = add_unit(out[2], r2, g[k2])
    out[3] = add_unit(out[3], r3, g[k3])
    return out


def sum_cf(terms):
    acc = terms[0]
    for t in terms[1:]:
        acc = acc + t
    return acc


def colour_mul(u, slabs: list, dagger: bool) -> list:
    """Per spin slab (3, ...): U . slab (or U^dag . slab), unrolled into
    elementwise multiply-adds (dot_general with trailing batch dims would
    relayout the whole field; see module docstring)."""
    out = []
    for ps in slabs:
        rows = []
        for a in range(3):
            terms = [
                (cplx.conj(u[b, a]) if dagger else u[a, b]) * ps[b]
                for b in range(3)
            ]
            rows.append(sum_cf(terms))
        out.append(cplx.stack(rows, axis=0))
    return out


# ---------------------------------------------------------------------------
# layout converters (host/test-path helpers; pure transpose+reshape)
# ---------------------------------------------------------------------------
def field_to_tpu(x, mesh: LatticeMesh):
    """Canonical flat (..., N) or lattice (..., T,Z,Y,X,4,3) field ->
    TPU layout (..., 4, 3, T, Z, Y*X)."""
    t, z, y, xx = mesh.spacetime_dims
    nd = len(mesh.dims)
    if x.ndim < nd or x.shape[-1] != 3:
        x = mesh.to_lattice(x)
    lead = x.ndim - nd
    perm = tuple(range(lead)) + tuple(
        lead + a for a in (4, 5, 0, 1, 2, 3)
    )
    xt = cplx.transpose(x, perm)
    return xt.reshape(xt.shape[: lead + 4] + (y * xx,))


def field_from_tpu(x, mesh: LatticeMesh, flat: bool = True):
    """TPU layout (..., 4, 3, T, Z, Y*X) -> canonical field."""
    t, z, y, xx = mesh.spacetime_dims
    lead = x.ndim - 5
    xs = x.reshape(x.shape[:-1] + (y, xx))
    perm = tuple(range(lead)) + tuple(lead + a for a in (2, 3, 4, 5, 0, 1))
    xc = cplx.transpose(xs, perm)
    return mesh.to_flat(xc) if flat else xc


def links_to_tpu(links, mesh: LatticeMesh):
    """(4, T, Z, Y, X, 3, 3) gauge links -> (4, 3, 3, T, Z, Y*X)."""
    t, z, y, xx = mesh.spacetime_dims
    lt = cplx.transpose(links, (0, 5, 6, 1, 2, 3, 4))
    return lt.reshape((4, 3, 3, t, z, y * xx))


def with_link_dtype(op, dtype):
    """Copy of a TPU-layout Wilson operator with link storage cast (e.g.
    ``jnp.bfloat16``): links are ~60% of the Dslash HBM traffic, and bf16
    storage is ~1.2x faster at ~1.5e-3 relative accuracy — appropriate for
    preconditioner-side operators (smoother, MG hierarchy) while the outer
    residual operator stays f32 (or is refined to f64, solvers/refine.py)."""
    import dataclasses

    links = op.links
    return dataclasses.replace(
        op, links=cplx.CF(links.re.astype(dtype), links.im.astype(dtype))
    )


def gamma5_tpu(x):
    """gamma_5 on TPU-layout fields (..., 4, 3, T, Z, Y*X): spinor swap
    0<->2, 1<->3 on the spin axis (Fields.h:311-338)."""
    return cplx.take(x, jnp.array([2, 3, 0, 1]), axis=x.ndim - 5)


def _xmasks(y: int, xx: int):
    """Boolean masks over the merged Y*X axis marking x == X-1 and x == 0."""
    xcoord = np.tile(np.arange(xx), y)
    return jnp.asarray(xcoord == xx - 1), jnp.asarray(xcoord == 0)


@operator_dataclass(meta=("mesh", "device_mesh", "axis_t", "axis_z", "axis_y"))
class TpuWilsonDirac(LinearOperator):
    """Matrix-free hopping operator D in TPU layout (4, 3, T, Z, Y*X).

    Same mathematics as ``ops/wilson.py``'s ``WilsonDiracOperator`` (the
    reference's hopping matrix D, SemesterProject.pdf Eq. 5); only the data
    layout and contraction scheduling differ. Pair with ``DiracOperator``
    for A = I - kD.

    Domain decomposition: with ``device_mesh`` set, the T, Z and/or Y axes
    are sharded over the named device-mesh axes (``axis_t``/``axis_z``/
    ``axis_y``) and the stencil runs inside ``shard_map`` — t/z neighbour
    access becomes a one-plane ``ppermute`` halo exchange
    (parallel/halo.py). Y lives on the *merged* Y*X minor axis: sharding it
    over ``axis_y`` keeps whole x-rows per device, so the y halo is one
    contiguous x-row exchanged the same way (width = X) and the in-shard x
    shifts are untouched. x itself stays device-local (its halo would be
    strided lane-by-lane — never worth it). The sharded t/z axes are
    *outer* array dims, so their halo slices are contiguous and no
    relayout occurs; 3-axis decomposition covers T x Z x Y devices.
    """

    links: cplx.CF  # (4, 3, 3, T, Z, Y*X)
    mesh: LatticeMesh
    device_mesh: object = None  # jax.sharding.Mesh or None (single device)
    axis_t: str | None = None
    axis_z: str | None = None
    axis_y: str | None = None

    @staticmethod
    def build(links_canonical, mesh: LatticeMesh) -> "TpuWilsonDirac":
        return TpuWilsonDirac(links_to_tpu(links_canonical, mesh), mesh)

    @staticmethod
    def build_sharded(
        links_canonical,
        mesh: LatticeMesh,
        device_mesh,
        axis_t: str | None = "t",
        axis_z: str | None = "z",
        axis_y: str | None = None,
    ) -> "TpuWilsonDirac":
        """Shard links over the device mesh and return a distributed op."""
        import jax
        from jax.sharding import NamedSharding

        links = links_to_tpu(links_canonical, mesh)
        op = TpuWilsonDirac(links, mesh, device_mesh, axis_t, axis_z, axis_y)
        links = jax.device_put(
            links, NamedSharding(device_mesh, op._links_spec())
        )
        return TpuWilsonDirac(links, mesh, device_mesh, axis_t, axis_z, axis_y)

    def _field_spec(self):
        from jax.sharding import PartitionSpec as P

        return P(None, None, self.axis_t, self.axis_z, self.axis_y)

    def _links_spec(self):
        from jax.sharding import PartitionSpec as P

        return P(None, None, None, self.axis_t, self.axis_z, self.axis_y)

    def shard_field(self, x):
        """Lay a (4,3,T,Z,V) field out to match this operator's sharding."""
        import jax
        from jax.sharding import NamedSharding

        return jax.device_put(x, NamedSharding(self.device_mesh, self._field_spec()))

    @property
    def shape(self) -> tuple[int, int]:
        return (self.mesh.size, self.mesh.size)

    @property
    def field_shape(self) -> tuple[int, ...]:
        t, z, y, xx = self.mesh.spacetime_dims
        return (4, 3, t, z, y * xx)

    def _axis_size(self, name) -> int:
        if name is None or self.device_mesh is None:
            return 1
        return self.device_mesh.shape[name]

    # ---- nearest-neighbour access -------------------------------------
    def _shift(self, v, mu: int, fwd: bool):
        """Value at the ±mu neighbour, periodic. v: (..., T, Z, Y*X).
        Inside shard_map, t/z/y shifts halo-exchange via ppermute (y's
        face on the merged axis is one x-row, width = X)."""
        t, z, y, xx = self.mesh.spacetime_dims
        s = -1 if fwd else 1
        if mu == 0:
            from mgpgcr_tpu.parallel.halo import periodic_shift

            return periodic_shift(
                v, v.ndim - 3, s, self.axis_t, self._axis_size(self.axis_t)
            )
        if mu == 1:
            from mgpgcr_tpu.parallel.halo import periodic_shift

            return periodic_shift(
                v, v.ndim - 2, s, self.axis_z, self._axis_size(self.axis_z)
            )
        ax = v.ndim - 1
        if mu == 2:
            from mgpgcr_tpu.parallel.halo import periodic_shift

            return periodic_shift(
                v, ax, s, self.axis_y, self._axis_size(self.axis_y), width=xx
            )
        # x shifts stay in-shard: masks sized to the local merged axis
        y_loc = v.shape[-1] // xx
        mask_last, mask_first = _xmasks(y_loc, xx)
        if fwd:  # psi(x+1): roll -1, except x == X-1 wraps to x = 0
            return cplx.where(mask_last, cplx.roll(v, xx - 1, ax), cplx.roll(v, -1, ax))
        return cplx.where(mask_first, cplx.roll(v, -(xx - 1), ax), cplx.roll(v, 1, ax))

    # ---- apply ---------------------------------------------------------
    # Shared unrolled spin/colour math lives in module-level project_half /
    # colour_mul / accumulate_half (also used by the fused Pallas kernel,
    # ops/pallas/). Colour multiplication commutes with the site shift, so
    # the backward hop shifts the *product* U^dag psi once instead of
    # shifting links and field separately.

    def apply(self, psi):
        """D psi; psi: (4, 3, T, Z, Y*X) as cplx.CF (or complex array);
        sharded per ``_field_spec`` when a device mesh is configured."""
        if self.device_mesh is None:
            return self._apply_local(self.links, psi)
        import jax

        fn = jax.shard_map(
            self._apply_local,
            mesh=self.device_mesh,
            in_specs=(self._links_spec(), self._field_spec()),
            out_specs=self._field_spec(),
        )
        return fn(self.links, psi)

    def _apply_local(self, links, psi):
        psi_slabs = [psi[s] for s in range(4)]
        out = [None] * 4
        # communication/compute overlap: issue every shift (the sharded
        # ones lower to ppermute halo exchanges) BEFORE any forward
        # colour contraction, so XLA's latency-hiding scheduler can fly
        # the face transfers of all 8 hops behind the local einsums
        # instead of serialising shift -> contract per direction
        fwd_h = []
        bwd_w = []
        for mu in range(4):
            h = project_half(psi_slabs, mu, True)
            fwd_h.append([self._shift(hq, mu, True) for hq in h])
            # backward hop shifts the product U^dag psi (colour mul
            # commutes with the site shift), so its compute precedes its
            # communication — also issued up front
            w = colour_mul(links[mu], project_half(psi_slabs, mu, False),
                           dagger=True)
            bwd_w.append([self._shift(wq, mu, False) for wq in w])
        for mu in range(4):
            g = colour_mul(links[mu], fwd_h[mu], dagger=False)
            out = accumulate_half(out, g, mu, True)
            out = accumulate_half(out, bwd_w[mu], mu, False)
        return cplx.stack(out, axis=0)

    # ---- convenience ----------------------------------------------------
    def random_field(self, key, dtype=jnp.float32) -> cplx.CF:
        return cplx.random(key, self.field_shape, dtype)
