"""Pure-numpy double-precision GCR oracle.

Independent re-execution of the GCR algorithm for trajectory validation
(SURVEY.md §4: "convergence-trajectory comparison against a NumPy/SciPy
double-precision re-execution of the reference algorithm").

Two conventions:
- ``conjugate_coeffs=False``: textbook residual-minimising coefficients
  alpha = <Ap, r>/<Ap, Ap> — what mgpgcr_tpu's solver implements.
- ``conjugate_coeffs=True``: the reference's convention (GCR.h:230, 251-262
  with vec_innprod = sum conj(x) y): alpha = <r, Ap>/<Ap, Ap>, i.e. the
  conjugate — a quirk that still converges on the gamma5-hermitian Wilson
  systems but is not the minimiser in general.
"""

from __future__ import annotations

import numpy as np


def oracle_gcr(
    apply_a,
    rhs: np.ndarray,
    tol: float,
    max_iter: int,
    restart: int = 0,
    truncation: int = 0,
    conjugate_coeffs: bool = False,
):
    """Returns (x, relres_history) with history[i] = ||r_i|| / ||rhs||."""
    assert not (restart and truncation)
    storage = restart or truncation or max_iter
    rhs = np.asarray(rhs, np.complex128)
    rhs_norm2 = np.vdot(rhs, rhs).real

    x = np.zeros_like(rhs)
    r = rhs.copy()
    p = r.copy()
    ap = apply_a(p)
    ps, aps = [p.copy()], [ap.copy()]
    hist = [1.0]
    count = 0
    for _ in range(max_iter):
        count += 1
        if conjugate_coeffs:
            alpha = np.conj(np.vdot(ap, r)) / np.vdot(ap, ap).real
        else:
            alpha = np.vdot(ap, r) / np.vdot(ap, ap).real
        x = x + alpha * p
        r = r - alpha * ap
        r2 = np.vdot(r, r).real
        hist.append(float(np.sqrt(r2 / rhs_norm2)))
        if r2 <= tol * tol * rhs_norm2:
            break
        ar = apply_a(r)
        p_new = r.copy()
        ap_new = ar.copy()
        for pi, api in zip(ps, aps):
            if conjugate_coeffs:
                beta = np.conj(np.vdot(api, ar)) / np.vdot(api, api).real
            else:
                beta = np.vdot(api, ar) / np.vdot(api, api).real
            p_new -= beta * pi
            ap_new -= beta * api
        p, ap = p_new, ap_new
        if restart and count % restart == 0:
            ps, aps = [], []
            count = 0
        ps.append(p.copy())
        aps.append(ap.copy())
        if truncation and len(ps) > storage:
            ps.pop(0)
            aps.pop(0)
    return x, hist
