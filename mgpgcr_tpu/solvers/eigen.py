"""Low-mode eigensolver: inverse iteration with Rayleigh-quotient values.

Equivalent of the reference's eigen setup (the misnamed ``Arnoldi``,
MG.h:72-122; validated there by ``test_EigenSolver``, main.cpp:145-191,
against Eigen's JacobiSVD). Produces approximate smallest-|lambda|
eigenpairs of an operator via inverse power iteration with an inexact GCR
inverse, plus Rayleigh-quotient eigenvalue estimates and residual norms so
callers can judge quality — the reference returns vectors only.

Representation-generic (complex arrays or split re/im ``cplx.CF``).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from mgpgcr_tpu import cplx
from mgpgcr_tpu.solvers.params import GCRParams
from mgpgcr_tpu.solvers.power import inverse_power_vectors


@dataclasses.dataclass
class EigenResult:
    vectors: object  # (n, ...) stacked approximate eigenvectors
    values: np.ndarray  # (n,) complex Rayleigh quotients <v, A v>
    residuals: np.ndarray  # (n,) real ||A v - lambda v|| per unit vector


def smallest_eigenpairs(
    key,
    a,
    n: int,
    b0,
    params: GCRParams | None = None,
    n_power_iters: int = 10,
) -> EigenResult:
    """Approximate the n smallest-magnitude eigenpairs of ``a``.

    b0: initial random field in the operator's representation/layout
    (e.g. ``fields.random_field`` or ``cplx.random``).
    """
    del key  # determinism comes from b0; kept for API symmetry
    if params is None:
        params = GCRParams(tol=1e-8, max_iter=10, restart=10)
    vecs = inverse_power_vectors(a, b0, n, params, n_power_iters)

    values = np.empty(n, dtype=np.complex128)
    residuals = np.empty(n, dtype=np.float64)
    for i in range(n):
        v = vecs[i]
        av = a.apply(v)
        lam = cplx.vdot(v, av)
        if cplx.is_cf(lam):
            lam_c = complex(float(lam.re), float(lam.im))
        else:
            lam_c = complex(lam)
        r = av - lam_c * v
        values[i] = lam_c
        residuals[i] = float(jnp.sqrt(cplx.abs2_sum(r)))
    return EigenResult(vectors=vecs, values=values, residuals=residuals)
