"""Two-level adaptive (smoothed-aggregation) multigrid preconditioner.

TPU-native re-design of the reference's ``MG<T>`` (MG.h:20-526):

Setup (reference ``MG::initialise``, MG.h:132-285):
1. near-null vectors by inverse power iteration (MG.h:139-143);
2. chirality-preserving doubling phi_± = (1 ± gamma_5) phi / 2
   (``vec_double``, MG.h:146-149, 317-345);
3. 4-D spacetime blocking — a reshape, not an index map (MG.h:155);
4. per-block orthonormalisation — batched QR (complex path) or batched
   modified Gram--Schmidt (split re/im path) over (n_blocks, block_len, ne)
   instead of serial Gram--Schmidt (MG.h:190-198);
5. Galerkin coarse operator C = P^H A P assembled per block column with the
   *correct* neighbour bases (the reference's 9-point-stencil assembly,
   MG.h:203-278, has the -mu basis bug Q3 and hardcodes 14 OpenMP threads);
   stored dense (MXU matvec) or block-ELL (``BlockSparseOperator``).

Apply (reference ``MG::solve``, MG.h:406-430) — as a *correct* V-cycle
(pre-smooth, restricted-residual coarse solve, prolongated correction,
post-smooth), or, with the smoother off, additive coarse-grid deflation
M = I + P C^-1 P^H (a pure P C^-1 P^H is rank-deficient and stalls the
outer Krylov method; the reference instead discards the coarse correction
entirely, quirk Q2, and returns uninitialised memory, quirk Q1).

Representation/layout-generic: fields are complex jnp arrays in the
canonical flat layout ("flat") or split re/im ``cplx.CF`` pairs in the TPU
compute layout (4, 3, T, Z, Y*X) ("tpu", see ops/wilson_tpu.py). Blocked
forms coincide across layouts (mesh.BlockMap.to_blocked_tpu), so the same
coarse space is built either way.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from mgpgcr_tpu import cplx, fields
from mgpgcr_tpu.mesh import BlockMap, LatticeMesh
from mgpgcr_tpu.ops.base import LinearOperator
from mgpgcr_tpu.ops.bsr import BlockSparseOperator
from mgpgcr_tpu.ops.dense import DenseOperator
from mgpgcr_tpu.solvers.gcr import gcr_solve
from mgpgcr_tpu.solvers.params import GCRParams, MGParams
from mgpgcr_tpu.solvers.power import inverse_power_vectors


def _to_blocked(block_map: BlockMap, x, layout: str):
    return (
        block_map.to_blocked_tpu(x) if layout == "tpu" else block_map.to_blocked(x)
    )


def _from_blocked(block_map: BlockMap, xb, layout: str):
    return (
        block_map.from_blocked_tpu(xb)
        if layout == "tpu"
        else block_map.from_blocked(xb)
    )


# ---------------------------------------------------------------------------
# grid-transfer operators
# ---------------------------------------------------------------------------
def restrict(q, block_map: BlockMap, x, layout: str = "flat"):
    """R x = P^H x: fine field -> (..., nb * ne) (MG::restrict, MG.h:367-383).

    q: (ne, nb, block_len) orthonormal per-block basis — ne on a MAJOR
    axis: with ne minor the (8, 128) HBM tiling pads ne=12 to 128 lanes,
    an ~11x memory blow-up that OOMs 32^4 setups."""
    xb = _to_blocked(block_map, x, layout)  # (..., nb, bl)
    rc = cplx.einsum2("ebk,...bk->...be", cplx.conj(q), xb)
    return rc.reshape(rc.shape[:-2] + (q.shape[0] * q.shape[1],))


def prolong(q, block_map: BlockMap, xc, layout: str = "flat"):
    """P xc: (..., nb * ne) -> fine field (MG::expand, MG.h:348-364)."""
    ne, nb, _ = q.shape
    xcb = xc.reshape(xc.shape[:-1] + (nb, ne))
    xb = cplx.einsum2("ebk,...be->...bk", q, xcb)
    return _from_blocked(block_map, xb, layout)


# ---------------------------------------------------------------------------
# field-shaped transfer operators (TPU layout fast path)
# ---------------------------------------------------------------------------
def field_basis(q, block_map: BlockMap):
    """Blocked basis (ne, nb, bl) -> field-shaped (ne, 4, 3, T, Z, Y*X).

    The per-apply blocked relayout (``to_blocked_tpu``/``from_blocked_tpu``,
    a rank-8 shuffle XLA tiles badly on the 8-lane minor dims) was measured
    ~15x off HBM bandwidth at 32^4 — 23-25 ms each way, dominating the
    V-cycle. Storing ONE extra relayout of the basis (same bytes as q)
    makes the transfers reshape-only: block membership in the TPU layout
    (4,3,T,Z,Y*X) is a pure reshape T->(Bt,bt), Z->(Bz,bz),
    Y*X->(By,by,Bx,bx), so restrict/prolong become segmented reductions /
    broadcasts with NO data movement (restrict_field / prolong_field;
    measured 2.2x faster than the relayout form at 32^4 block 8)."""
    import jax as _jax

    return _jax.lax.map(block_map.from_blocked_tpu, q)


def _block_split(block_map: BlockMap):
    bpd = block_map.blocks_per_dim
    b = block_map.block_dims
    return (bpd[0], b[0], bpd[1], b[1], bpd[2], b[2], bpd[3], b[3])


def restrict_field(q_field, block_map: BlockMap, x):
    """R x on TPU-layout fields with a field-shaped basis: contract
    spin+colour, then block sums via pure reshapes. Output matches
    ``restrict``'s (nb*ne,) layout (b-major, e-minor)."""
    ne = q_field.shape[0]
    split = _block_split(block_map)
    p = cplx.einsum2("escTZV,scTZV->eTZV", cplx.conj(q_field), x)
    p = p.reshape((ne,) + split)  # (e, Bt,bt, Bz,bz, By,by, Bx,bx)
    rc = cplx.CF(
        p.re.sum(axis=(2, 4, 6, 8)), p.im.sum(axis=(2, 4, 6, 8))
    )  # (e, Bt, Bz, By, Bx)
    nb = block_map.n_blocks
    rc = cplx.transpose(rc.reshape(ne, nb), (1, 0))  # tiny
    return rc.reshape(nb * ne)


def prolong_field(q_field, block_map: BlockMap, xc):
    """P xc on TPU-layout fields with a field-shaped basis: broadcast the
    per-block coefficients over block interiors (reshape-only), one
    complex multiply-accumulate over e."""
    ne = q_field.shape[0]
    nb = block_map.n_blocks
    split = _block_split(block_map)
    t, z, y, xx = block_map.mesh.spacetime_dims
    xcb = cplx.transpose(xc.reshape(nb, ne), (1, 0)).reshape(
        (ne,) + tuple(s if i % 2 == 0 else 1 for i, s in enumerate(split))
    )

    def bcast(v):
        return jnp.broadcast_to(
            v, (ne,) + split
        ).reshape(ne, 1, 1, t, z, y * xx)

    cr, ci = bcast(xcb.re), bcast(xcb.im)
    re = (q_field.re * cr - q_field.im * ci).sum(axis=0)
    im = (q_field.re * ci + q_field.im * cr).sum(axis=0)
    return cplx.CF(re, im)


# ---------------------------------------------------------------------------
# preconditioner
# ---------------------------------------------------------------------------
@dataclasses.dataclass(frozen=True)
class MGPreconditioner(LinearOperator):
    a: LinearOperator  # fine operator
    q: jnp.ndarray  # (ne, nb, block_len) per-block orthonormal basis (or CF)
    coarse: LinearOperator  # Galerkin coarse operator (dense or block-ELL)
    block_map: BlockMap
    params: MGParams
    layout: str = "flat"  # "flat" canonical complex | "tpu" CF (4,3,T,Z,V)
    coarse_precond: "MGPreconditioner | None" = None  # next level (n_level > 2)
    # optional cheaper operator for the smoother solves only (e.g. bf16
    # link storage, ops/wilson_tpu.with_link_dtype): preconditioner-side
    # accuracy is forgiving, the outer residual still uses the exact a
    a_smooth: "LinearOperator | None" = None
    # field-shaped copy of q (TPU layout only): makes restrict/prolong
    # reshape-only segmented ops instead of per-apply blocked relayouts
    # (see ``field_basis``); same bytes as q, derived at setup / on load
    q_field: "jnp.ndarray | None" = None

    @property
    def shape(self) -> tuple[int, int]:
        return self.a.shape

    def _pallas_transfers(self) -> bool:
        be = self.params.transfer_backend
        if be == "xla" or self.q_field is None:
            return False
        return be == "pallas" or jax.default_backend() == "tpu"

    def restrict(self, x):
        if self.q_field is not None and x.ndim == 5:
            if self._pallas_transfers():
                from mgpgcr_tpu.ops.pallas.transfer import restrict_pallas

                return restrict_pallas(self.q_field, self.block_map, x)
            return restrict_field(self.q_field, self.block_map, x)
        return restrict(self.q, self.block_map, x, self.layout)

    def prolong(self, xc, base=None, damping: float = 1.0):
        """P xc, optionally fused with the correction's additive base:
        returns base + damping * P xc in ONE streaming pass on the Pallas
        path (the XLA fallback composes the same result)."""
        if self.q_field is not None and xc.ndim == 1:
            if self._pallas_transfers():
                from mgpgcr_tpu.ops.pallas.transfer import prolong_pallas

                return prolong_pallas(
                    self.q_field, self.block_map, xc, r=base, damping=damping
                )
            out = prolong_field(self.q_field, self.block_map, xc)
        else:
            out = prolong(self.q, self.block_map, xc, self.layout)
        if damping != 1.0:
            out = cplx.scale_real(
                out, jnp.asarray(damping, cplx.real_dtype(out))
            )
        return out if base is None else base + out

    def _neumann_smooth(self, a, rhs, x, x_is_zero: bool):
        """x + sum_{i<terms} (kD)^i r: the truncated hopping expansion of
        A^{-1} r applied to the current residual — (kD) t = t - A t, so
        each extra term costs exactly one fused operator pass. No dots,
        no direction stacks (params.smoother="neumann")."""
        r = rhs if x_is_zero else rhs - a.apply(x)
        acc = r
        t = r
        for _ in range(self.params.smoother_terms - 1):
            t = t - a.apply(t)  # t <- kD t
            acc = acc + t
        return acc if x_is_zero else x + acc

    @property
    def _has_smoother(self) -> bool:
        if self.params.smoother == "neumann":
            return True
        return self.params.smoother_gcr is not None

    def _smooth(self, rhs, x, n: int, x_is_zero: bool = False):
        if n == 0:
            return x
        if self.params.smoother == "neumann":
            a = self.a_smooth if self.a_smooth is not None else self.a
            for i in range(n):
                x = self._neumann_smooth(a, rhs, x, x_is_zero and i == 0)
            return x
        sp = self.params.smoother_gcr
        if sp is None:
            return x
        a = self.a_smooth if self.a_smooth is not None else self.a
        for i in range(n):
            if x_is_zero and i == 0:
                # pre-smooth from x = 0: r = rhs directly — the explicit
                # residual Dslash of the x0 path would stream A*0
                x = gcr_solve(a, rhs, sp).x
            else:
                # warm start: the solver computes r = rhs - A x0 in its
                # own (fused) init instead of a separate outer pass
                x = gcr_solve(a, rhs, sp, x0=x).x
        return x

    def apply(self, r):
        """One V(pre, post)-cycle approximating A^{-1} r (smoother on), or
        additive coarse-grid deflation M = I + P C^-1 P^H (smoother off —
        the reference's config of record, main.cpp:840-858; a pure
        P C^-1 P^H would be rank-deficient and stall the outer GCR)."""

        def coarse_correct(res, base):
            """base + damping * P C^-1 P^H res (base fused into the
            prolong pass on the Pallas transfer path)."""
            cp = self.coarse_precond.apply if self.coarse_precond is not None else None
            ec = gcr_solve(
                self.coarse, self.restrict(res), self.params.coarse_gcr, precond=cp
            ).x
            return self.prolong(
                ec, base=base, damping=self.params.correction_damping
            )

        if not self._has_smoother:
            return coarse_correct(r, r)
        x = cplx.zeros_like(r)
        x = self._smooth(r, x, self.params.n_pre_smooth, x_is_zero=True)
        x = coarse_correct(r - self.a.apply(x), x)
        x = self._smooth(r, x, self.params.n_post_smooth)
        return x

    def as_preconditioner(self) -> Callable:
        return self.apply


jax.tree_util.register_dataclass(
    MGPreconditioner,
    data_fields=["a", "q", "coarse", "coarse_precond", "a_smooth",
                 "q_field"],
    meta_fields=["block_map", "params", "layout"],
)


# ---------------------------------------------------------------------------
# setup
# ---------------------------------------------------------------------------
def chiral_double(vecs, mesh: LatticeMesh, layout: str = "flat", gamma5_fn=None):
    """(n, ...) -> (2n, ...): [P_+ v_i ...; P_- v_i ...] (MG.h:317-345)."""
    if gamma5_fn is not None:
        g5 = gamma5_fn(vecs)
    elif layout == "tpu":
        from mgpgcr_tpu.ops.wilson_tpu import gamma5_tpu

        g5 = gamma5_tpu(vecs)
    else:
        g5 = fields.gamma5(vecs, mesh)
    plus = cplx.scale_real(vecs + g5, 0.5)
    minus = cplx.scale_real(vecs - g5, 0.5)
    return cplx.concatenate([plus, minus], axis=0)


def coarse_gamma5_fn(ne: int):
    """gamma_5 on a coarse level: the chirally-doubled basis orders each
    block's dof as [ne/2 plus-chirality | ne/2 minus] (chirality subspaces
    are mutually orthogonal, so orthonormalisation cannot mix them), hence
    coarse gamma_5 is the sign pattern diag(+1..., -1...) per block."""
    import numpy as _np

    sign = _np.ones(ne)
    sign[ne // 2 :] = -1.0

    def g5(x):
        s = jnp.asarray(sign, cplx.real_dtype(x))
        flat = x.reshape(x.shape[:-1] + (x.shape[-1] // ne, ne))
        return cplx.scale_real(flat, s).reshape(x.shape)

    return g5


def _batched_mgs(mats):
    """Per-block modified Gram--Schmidt with reorthogonalisation:
    (ne, nb, bl) -> orthonormal columns (same layout). Works for complex
    and CF (no complex QR exists for the split re/im representation)."""
    ne, nb, bl = mats.shape
    cols = []
    for e in range(ne):
        v = mats[e]  # (nb, bl)
        for _ in range(2):  # one reorthogonalisation pass
            for qj in cols:
                proj = cplx.einsum2("bk,bk->b", cplx.conj(qj), v)
                v = v - proj.reshape(nb, 1) * qj
        nrm = jnp.sqrt(
            jnp.sum(cplx.abs2(v), axis=1, keepdims=True)
        )
        v = cplx.scale_real(v, 1.0 / nrm)
        cols.append(v)
    return cplx.stack(cols, axis=0)


def block_orthonormalize(vecs, block_map: BlockMap, layout: str = "flat"):
    """Per-block orthonormal basis from (ne, ...) vectors -> (ne, nb, bl).

    Batched thin-QR (complex path) / batched MGS (CF path); replaces the
    reference's per-block serial Gram--Schmidt (MG.h:190-198) — same
    column span, hence an equivalent coarse space. The basis keeps ne on
    a MAJOR axis: stored (nb, bl, ne) the TPU (8, 128) tiling pads
    ne (~12) to 128 lanes — an ~11x memory expansion that OOMs at 32^4.
    The blocking relayout itself runs per vector (lax.map) for the same
    reason: its rank-10 transpose temp pads ~13x."""
    blocked = jax.lax.map(
        lambda v: _to_blocked(block_map, v, layout), vecs
    )  # (ne, nb, bl)
    if blocked.shape[2] < blocked.shape[0]:
        raise ValueError("block_len smaller than number of coarse vectors")
    if cplx.is_cf(blocked):
        # blocks are independent: chunk the batched MGS over nb so XLA's
        # live temps stay bounded (unchunked at 32^4 block 8 ne 20 the
        # planner wants 17 GB of HLO temps — OOM on a 16 GB chip)
        ne, nb, bl = blocked.shape
        per_block = 2 * ne * bl * jnp.dtype(blocked.dtype).itemsize
        budget = 64 * 1024 * 1024
        cb = max(
            (d for d in range(1, nb + 1) if nb % d == 0 and d * per_block <= budget),
            default=1,
        )
        if cb == nb:
            return _batched_mgs(blocked)
        nchunk = nb // cb
        chunks = cplx.CF(
            blocked.re.reshape(ne, nchunk, cb, bl),
            blocked.im.reshape(ne, nchunk, cb, bl),
        )
        chunks = cplx.transpose(chunks, (1, 0, 2, 3))  # (nchunk, ne, cb, bl)
        out = jax.lax.map(_batched_mgs, chunks)
        out = cplx.transpose(out, (1, 0, 2, 3))
        return cplx.CF(
            out.re.reshape(ne, nb, bl), out.im.reshape(ne, nb, bl)
        )
    q, _ = jnp.linalg.qr(cplx.transpose(blocked, (1, 2, 0)), mode="reduced")
    return cplx.transpose(q, (2, 0, 1))


def galerkin_coarse_matrix(a: LinearOperator, q, block_map: BlockMap, layout: str = "flat"):
    """Dense Galerkin coarse matrix C = P^H A P, (nc, nc).

    Assembled one block-column-group at a time: the ne fine basis vectors of
    block b are applied through A *as one stacked SpMM*, then restricted
    against every block's basis in one einsum. This replaces the reference's
    quadruple OpenMP loop of 9 * nb * ne^2 individual fine SpMVs + dots
    (MG.h:206-278) and is exact (no 9-point truncation, no quirk-Q3 basis
    mixup); locality of A makes C block-9-point-sparse automatically."""
    ne, nb, bl = q.shape
    zeros_nb = (
        cplx.CF(jnp.zeros((ne, nb, bl), q.dtype), jnp.zeros((ne, nb, bl), q.dtype))
        if cplx.is_cf(q)
        else jnp.zeros((ne, nb, bl), q.dtype)
    )
    cols = []
    batch_apply = jax.jit(jax.vmap(a.apply))  # compiled once, reused per block
    for b in range(nb):
        basis_blocked = zeros_nb.at[:, b, :].set(q[:, b, :])
        basis = _from_blocked(block_map, basis_blocked, layout)  # (ne, fine...)
        ab = batch_apply(basis)  # (ne, fine...)
        cols.append(
            cplx.swapaxes(restrict(q, block_map, ab, layout), -1, -2)
        )  # (nc, ne)
    return cplx.concatenate(cols, axis=1)  # (nc, nc)


def galerkin_coarse_blocks(
    a: LinearOperator, q, block_map: BlockMap, layout: str = "flat"
):
    """Phase-probed Galerkin assembly: (nb, 9, ne, ne) stencil blocks + the
    neighbor table, in O(9 * ne) full-lattice operator applications —
    *independent of the number of blocks*.

    Replaces the per-block-column loop of ``galerkin_coarse_matrix`` (and
    the reference's quadruple OpenMP loop of 9*nb*ne^2 scalar dots,
    MG.h:206-278). Valid for operators with the 9-point block stencil
    (nearest-neighbour fine operator — the same locality assumption the
    reference's assembly hardcodes).

    Method: activate EVERY block column simultaneously, modulated by
    per-dimension roots of unity chi_p(B) = prod_mu omega_mu^(p_mu B_mu)
    with omega_mu = exp(2 pi i / blocks_per_dim[mu]). After one operator
    application and restriction, the row-r coarse vector is
        M_p[r] = sum_delta omega^(p . delta) C_delta[r],
    delta in {0, +-e_mu}: per dimension a 3-unknown Vandermonde system in
    (C_self-rest, C_+mu, C_-mu) solved from exponents p_mu in {0, 1, 2}.
    Dimensions with 2 blocks merge the +-mu couplings (one unknown, two
    measurements); single-block dimensions fold them into the diagonal —
    exactly the duplicate-stencil semantics of ``coarse_to_block_ell``.
    """
    ne, nb, bl = q.shape
    bpd = block_map.blocks_per_dim
    ns = len(bpd)
    is_cf = cplx.is_cf(q)
    rdt = q.dtype if is_cf else None

    def chi_for(p):
        grids = np.indices(bpd)
        theta = sum(
            2.0 * np.pi * p[mu] * grids[mu] / bpd[mu] for mu in range(ns)
        )
        chi = np.exp(1j * np.asarray(theta, np.float64)).reshape(-1)  # (nb,)
        if is_cf:
            return cplx.CF(
                jnp.asarray(chi.real, rdt), jnp.asarray(chi.imag, rdt)
            )
        return jnp.asarray(chi, _operator_dtype(a))

    # one jitted probe: XLA plans the transient (ne, fine-lattice) buffers
    # tightly instead of the eager op-by-op dispatch holding many live
    # field stacks at once (OOM at 32^4). a_ and q_ are ARGUMENTS — closed
    # over they would bake the gauge links / basis into the HLO as
    # constants and overflow the tunneled backend's remote-compile request.
    @jax.jit
    def _measure_core(a_, q_, chi):
        chi3 = (
            chi.reshape((1, nb, 1)) if is_cf else chi[None, :, None]
        )
        basis = q_ * chi3  # (ne, nb, bl) — already the blocked field layout

        # per-vector pipeline under lax.map, for two reasons: (a) vmapping
        # the Pallas stencil batches its grid and the 32^4 compile runs
        # >40 min through the tunnel; (b) the blocked<->lattice relayout
        # has a pad-hostile rank-10 transpose temp (~13x expansion — the
        # batched (ne, ...) form OOMs 16 GB HBM at 32^4, the single-field
        # form is ~1.2 GB)
        def one(col):  # (nb, bl) -> (nb, ne) restricted A-image
            f = _from_blocked(block_map, col, layout)
            fb = _to_blocked(block_map, a_.apply(f), layout)
            return cplx.einsum2("ebk,bk->be", cplx.conj(q_), fb)

        rbb = jax.lax.map(one, basis)  # (ne, nb, ne)
        chic = (
            cplx.conj(chi).reshape((1, nb, 1))
            if is_cf
            else jnp.conj(chi)[None, :, None]
        )
        rbb = rbb * chic
        return cplx.transpose(rbb, (1, 2, 0))  # (nb, f_row, e_col)

    def measure(p):
        """M_p[r; f, e] = sum_b chi_p(B_b) <phi_{r,f}, A phi_{b,e}>,
        un-phased by conj(chi_p(B_r)). Shape (nb, ne_row, ne_col)."""
        return _measure_core(a, q, chi_for(p))

    slots = stencil_from_probes(measure, bpd)
    blocks = cplx.stack(slots, axis=1)  # (nb, 9, ne, ne)
    table = jnp.asarray(block_map.neighbor_table(), jnp.int32)
    return blocks, table


def stencil_from_probes(measure, bpd):
    """Solve the per-row 9-point stencil slots [self, +d0, -d0, ...] from
    phase-probe measurements ``measure(p)`` (the Vandermonde-in-omega
    systems described in ``galerkin_coarse_blocks``). Shared by the
    single-device and the sharded (solvers/mg_dist.py) assemblies — the
    algebra is elementwise per coarse row, so it is sharding-agnostic."""
    ns = len(bpd)
    m0 = measure((0,) * ns)
    zero = cplx.zeros_like(m0)
    slots = [None] * (2 * ns + 1)  # [self, +d0, -d0, +d1, -d1, ...]
    diag = m0
    for mu in range(ns):
        d = bpd[mu]
        if d == 1:
            slots[1 + 2 * mu] = zero
            slots[2 + 2 * mu] = zero
            continue
        e_mu = tuple(1 if i == mu else 0 for i in range(ns))
        m1 = measure(e_mu)
        if d == 2:
            # omega = -1: M0 = R + c, M1 = R - c with c the merged +-mu
            # coupling (stored in the + slot; the - slot is the zeroed
            # duplicate, matching coarse_to_block_ell's dedup)
            c = (m0 - m1) * 0.5
            slots[1 + 2 * mu] = c
            slots[2 + 2 * mu] = zero
            diag = diag - c
            continue
        m2 = measure(tuple(2 * x for x in e_mu))
        w = np.exp(2j * np.pi / d)
        # D1 = (w-1) a + (w~-1) b ; D2 = (w^2-1) a + (w~^2-1) b
        d1 = m1 - m0
        d2 = m2 - m0
        c11, c12 = complex(w - 1), complex(np.conj(w) - 1)
        c21, c22 = complex(w**2 - 1), complex(np.conj(w) ** 2 - 1)
        det = c11 * c22 - c12 * c21
        a_co = d1 * (c22 / det) - d2 * (c12 / det)
        b_co = d2 * (c11 / det) - d1 * (c21 / det)
        slots[1 + 2 * mu] = a_co
        slots[2 + 2 * mu] = b_co
        diag = diag - a_co - b_co
    slots[0] = diag
    return slots


def build_coarse_operator(blocks, table, coarse_format: str, bpd):
    """Coarse operator in the requested compute format from the
    phase-probed stencil blocks (nb, 9, ne, ne) + neighbor table.

    - "dense": one (nc, nc) matrix, MXU matvec — best for small coarse
      grids (the reference's only format, a dense Eigen solve feed);
    - "bsr": block-ELL batched einsum (HierarchicalSparse.h:102-161);
    - "stencil": ``StencilBlockOperator`` over the block lattice — the
      same fused single-pass Pallas SpMV the ingested-matrix path uses
      (ops/pallas/spmv.py), picked for large coarse grids on TPU. The
      Galerkin operator IS a 9-point block stencil (the locality argument
      in ``galerkin_coarse_blocks``), so the formats agree exactly;
      duplicate +-mu slots on short block-lattice extents hold zeros, and
      a zero block contributes nothing under any of the three applies.
    """
    if coarse_format == "stencil":
        from mgpgcr_tpu.ops.blockstencil import StencilBlockOperator

        nb = blocks.shape[0]
        on_tpu = jax.devices()[0].platform == "tpu"
        backend = (
            "pallas" if (on_tpu and cplx.is_cf(blocks) and nb % 128 == 0)
            else "xla"
        )
        return StencilBlockOperator(blocks, tuple(int(b) for b in bpd),
                                    backend)
    if coarse_format == "bsr":
        return BlockSparseOperator(blocks, table)
    return DenseOperator(blocks_to_dense(blocks, table))


def blocks_to_dense(blocks, table) -> jnp.ndarray:
    """(nb, 9, ne, ne) stencil blocks -> dense Galerkin matrix (nc, nc)."""
    nb, k, ne, _ = blocks.shape
    rows = (
        np.arange(nb)[:, None, None, None] * ne
        + np.zeros((1, k, 1, 1), np.int64)
        + np.arange(ne)[None, None, :, None]
    )
    cols = np.asarray(table)[:, :, None, None] * ne + np.arange(ne)[
        None, None, None, :
    ]
    rows = jnp.asarray(np.broadcast_to(rows, blocks.shape[:4]).reshape(-1))
    cols = jnp.asarray(np.broadcast_to(cols, blocks.shape[:4]).reshape(-1))
    nc = nb * ne
    flat = blocks.reshape((nb * k * ne * ne,))
    if cplx.is_cf(blocks):
        zre = jnp.zeros((nc, nc), blocks.dtype)
        return cplx.CF(
            zre.at[rows, cols].add(flat.re), zre.at[rows, cols].add(flat.im)
        )
    dense = jnp.zeros((nc, nc), blocks.dtype)
    return dense.at[rows, cols].add(flat)


def coarse_to_block_ell(c, block_map: BlockMap, ne: int) -> BlockSparseOperator:
    """Extract the 9-point block structure of a dense Galerkin matrix into
    block-ELL form (the reference's HierarchicalSparse layout,
    HierarchicalSparse.h:22-48, with a uniform K=9 stencil)."""
    tab_np = block_map.neighbor_table()  # (nb, 9)
    table = jnp.asarray(tab_np)
    nb = table.shape[0]
    cb = c.reshape(nb, ne, nb, ne)
    # blocks[r, k] = C[r-block rows, table[r, k]-block cols]
    perm = cplx.transpose(cb, (0, 2, 1, 3))
    blocks = perm[jnp.arange(nb)[:, None], table]  # (nb, 9, ne, ne)
    # zero duplicate stencil entries (small lattices where +mu == -mu or
    # neighbour == self) so each coupling is counted once: slot j is a
    # duplicate when any earlier slot points at the same coarse column
    dup = (tab_np[:, :, None] == tab_np[:, None, :]) & (
        np.arange(9)[None, :, None] > np.arange(9)[None, None, :]
    )
    mask = jnp.asarray(dup.any(axis=2))[:, :, None, None]
    blocks = cplx.where(mask, cplx.zeros_like(blocks), blocks)
    return BlockSparseOperator(blocks, table.astype(jnp.int32))


def setup_mg(
    key: jax.Array,
    a: LinearOperator,
    mesh: LatticeMesh,
    params: MGParams,
    layout: str = "flat",
    gamma5_fn=None,
    smoother_operator: LinearOperator | None = None,
    _level: int = 1,
    _cf: bool = False,
) -> MGPreconditioner:
    """Full adaptive-MG setup (reference MG::initialise, MG.h:132-285),
    recursively multi-level for ``params.n_level > 2`` (the reference's
    n_level knob is declared but only two-level was ever implemented,
    MG.h:29, 407).

    layout="flat": canonical complex fields of shape (mesh.size,).
    layout="tpu": split re/im CF fields of shape (4, 3, T, Z, Y*X) —
    use with TpuWilsonDirac / PallasWilsonDirac operators.
    """
    if layout == "tpu":
        rdt = _operator_real_dtype(a)
        t, z, y, xx = mesh.spacetime_dims
        b0 = cplx.random(key, (4, 3, t, z, y * xx), rdt)
    elif _cf:  # flat CF fields (coarse levels under a split re/im fine level)
        b0 = cplx.random(key, (mesh.size,), _operator_real_dtype(a))
    else:
        b0 = fields.random_field(key, mesh.size, _operator_dtype(a))
    block_extent = params.block if _level == 1 else params.coarse_block
    vecs = inverse_power_vectors(
        a, b0, params.n_nullvecs, params.setup_gcr, params.setup_power_iters
    )
    doubled = chiral_double(vecs, mesh, layout, gamma5_fn)  # (2n, ...)
    block_map = mesh.blocking(block_extent)
    # jit the blocked orthonormalisation: eager dispatch holds many live
    # (ne, fine-lattice) temporaries through the layout transpose + MGS
    # sweeps and OOMs at 32^4; under jit XLA reuses the buffers
    q = jax.jit(lambda v: block_orthonormalize(v, block_map, layout))(
        doubled
    )  # (ne, nb, bl)
    ne = 2 * params.n_nullvecs
    if params.assembly == "phased":
        blocks, table = galerkin_coarse_blocks(a, q, block_map, layout)
        coarse = build_coarse_operator(
            blocks, table, params.coarse_format, block_map.blocks_per_dim
        )
    else:  # per-block-column sweep: no stencil-locality assumption
        c = galerkin_coarse_matrix(a, q, block_map, layout)
        if params.coarse_format == "bsr":
            coarse = coarse_to_block_ell(c, block_map, ne)
        elif params.coarse_format == "stencil":
            raise ValueError(
                "coarse_format='stencil' requires the phase-probed "
                "assembly (assembly='phased')"
            )
        else:
            coarse = DenseOperator(c)

    coarse_precond = None
    if params.n_level - _level > 1:
        bpd = block_map.blocks_per_dim
        cb = params.coarse_block
        if all(d % cb == 0 and d >= cb for d in bpd) and (
            cb**4 * ne >= 2 * params.n_nullvecs
        ):
            coarse_mesh = LatticeMesh((*bpd, ne), n_spacetime=4)
            key, sub = jax.random.split(key)
            coarse_precond = setup_mg(
                sub,
                coarse,
                coarse_mesh,
                params,
                layout="flat",
                gamma5_fn=coarse_gamma5_fn(ne),
                _level=_level + 1,
                _cf=cplx.is_cf(q),
            )
    q_field = (
        jax.jit(lambda v: field_basis(v, block_map))(q)
        if layout == "tpu"
        else None
    )
    if q_field is not None and params.transfer_dtype is not None:
        tdt = jnp.dtype(params.transfer_dtype)
        q_field = cplx.CF(q_field.re.astype(tdt), q_field.im.astype(tdt))
    return MGPreconditioner(
        a=a,
        q=q,
        coarse=coarse,
        block_map=block_map,
        params=params,
        layout=layout,
        coarse_precond=coarse_precond,
        a_smooth=smoother_operator,
        q_field=q_field,
    )




def _operator_dtype(a) -> jnp.dtype:
    for leaf in jax.tree_util.tree_leaves(a):
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.complexfloating):
            return leaf.dtype
    return jnp.complex64


def _operator_real_dtype(a):
    for leaf in jax.tree_util.tree_leaves(a):
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
            return leaf.dtype
    return jnp.float32
