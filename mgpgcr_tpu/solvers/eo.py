"""Even-odd (Schur-complement) solve driver for A = I - k D.

Reduces the full Wilson--Dirac solve to the half-dimension even-site
system S x_e = b_e + k D_eo b_o with S = I - k^2 D_eo D_oe, then back-
substitutes the odd sites, x_o = b_o + k D_oe x_e (ops/eo.py).  Exact:
the reconstructed x solves the original system to the Schur solve's
tolerance.  Beyond-reference capability (the reference solves the full
system only, GCR.h:159-302); composes with any GCR preconditioner on the
even subsystem.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

from mgpgcr_tpu import cplx
from mgpgcr_tpu.mesh import LatticeMesh
from mgpgcr_tpu.ops.eo import (
    EvenOddWilson,
    field_from_eo,
    field_to_eo,
    make_schur,
)
from mgpgcr_tpu.solvers.gcr import Preconditioner, gcr_solve
from mgpgcr_tpu.solvers.params import GCRParams
from mgpgcr_tpu.solvers.result import SolveResult


def eo_solve(
    eo: EvenOddWilson,
    k,
    rhs: cplx.CF,
    params: GCRParams,
    precond: Optional[Preconditioner] = None,
    mesh: LatticeMesh | None = None,
) -> SolveResult:
    """Solve (I - k D) x = rhs through the even-odd Schur complement.

    ``rhs`` is a full-lattice TPU-layout field (4, 3, T, Z, Y*X); the
    returned result's ``x`` is full-lattice again.  Convergence history
    and iteration counts are those of the half-dimension Schur GCR solve.
    ``precond`` (optional) preconditions the Schur system."""
    mesh = mesh if mesh is not None else eo.mesh
    kcf = cplx.ascf(k, cplx.real_dtype(rhs))
    b_e, b_o = field_to_eo(rhs, mesh)
    s = make_schur(eo, kcf, cplx.real_dtype(rhs))

    rhs_e = b_e + kcf * eo.apply_eo(b_o)
    res = gcr_solve(s, rhs_e, params, precond=precond)
    x_e = res.x
    x_o = b_o + kcf * eo.apply_oe(x_e)
    return dataclasses.replace(res, x=field_from_eo(x_e, x_o, mesh))
