"""Mixed-precision iterative refinement.

The reference solves in complex128 to tol 1e-13 (GCR.h:288, main.cpp:858).
TPUs have no native f64: the accelerator path runs split re/im f32
(``cplx.CF``), whose attainable relative residual bottoms out near 1e-6.
Classical iterative refinement recovers full double precision:

    x_{k+1} = x_k + Solve_lo(rhs - A_hi x_k)

with the residual computed in complex128 (host numpy / CPU backend) and
only the *correction* solved in low precision on the accelerator. Each
round multiplies the residual by the low-precision solver's contraction
factor, so a handful of f32 TPU solves reach the reference's 1e-13 — the
acceptance criterion of BASELINE.md ("converges to identical tolerance").

``refined_solve`` is representation-agnostic: it talks numpy complex128 at
the interface and delegates to two callables the caller builds (the
low-precision solve round-trips through the accelerator representation).
``wilson_refined_solve`` wires it up for the Wilson-Dirac TPU path.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import numpy as np


@dataclasses.dataclass
class RefineResult:
    x: np.ndarray  # complex128 solution
    converged: bool
    n_refine: int  # refinement rounds taken
    final_relres: float  # true complex128 relative residual
    history: list  # relres after each round (history[0] = initial 1.0)
    # inner low-precision solver iterations per refinement round (filled
    # by wrappers that can observe them, e.g. wilson_refined_solve); the
    # reference's iterations-to-tol metric (main.cpp k sweeps) maps to
    # sum(inner_iters) on the refined TPU path
    inner_iters: list = dataclasses.field(default_factory=list)

    @property
    def total_inner_iters(self) -> int:
        return int(sum(self.inner_iters))


def refined_solve(
    solve_lo: Callable[[np.ndarray], np.ndarray],
    apply_hi: Callable[[np.ndarray], np.ndarray],
    rhs: np.ndarray,
    tol: float = 1e-12,
    max_refine: int = 30,
) -> RefineResult:
    """Iterative refinement to complex128 accuracy.

    solve_lo(r) -> approximate A^-1 r (any precision, returns complex128)
    apply_hi(x) -> A x in complex128 (the trusted residual operator)
    """
    rhs = np.asarray(rhs, dtype=np.complex128)
    rhs_norm = np.linalg.norm(rhs)
    if rhs_norm == 0.0:
        return RefineResult(np.zeros_like(rhs), True, 0, 0.0, [0.0])
    x = np.zeros_like(rhs)
    r = rhs.copy()
    history = [1.0]
    for it in range(1, max_refine + 1):
        x = x + np.asarray(solve_lo(r), dtype=np.complex128)
        r = rhs - np.asarray(apply_hi(x), dtype=np.complex128)
        rel = float(np.linalg.norm(r) / rhs_norm)
        history.append(rel)
        if rel <= tol:
            return RefineResult(x, True, it, rel, history)
        # stagnation guard: low-precision solver no longer contracting
        if len(history) >= 3 and rel > 0.5 * history[-2]:
            break
    return RefineResult(x, history[-1] <= tol, len(history) - 1, history[-1], history)


def wilson_refined_solve(
    a_lo,
    mesh,
    rhs: np.ndarray,
    inner_params,
    apply_hi: Callable[[np.ndarray], np.ndarray],
    precond=None,
    tol: float = 1e-12,
    max_refine: int = 30,
) -> RefineResult:
    """Refinement wrapper for a TPU-layout CF operator ``a_lo``
    (TpuWilsonDirac / PallasWilsonDirac wrapped in DiracOperator).

    ``apply_hi`` is the complex128 ground-truth operator (e.g. the
    canonical ``WilsonDiracOperator`` on the CPU backend, or a scipy CSR
    matvec of the ingested fixture). rhs: flat complex128 (N,).
    """
    import jax.numpy as jnp

    from mgpgcr_tpu import cplx
    from mgpgcr_tpu.ops.wilson_tpu import field_from_tpu, field_to_tpu
    from mgpgcr_tpu.solvers.gcr import gcr_solve_jit

    rdt = cplx.real_dtype(
        a_lo.d.links if hasattr(a_lo, "d") else a_lo.links
    )

    inner_iters: list = []

    def solve_lo(r_np: np.ndarray) -> np.ndarray:
        # scale into f32 range, solve on the accelerator, scale back
        scale = np.max(np.abs(r_np)) or 1.0
        r_cf = field_to_tpu(cplx.from_numpy(r_np / scale, rdt), mesh)
        res = gcr_solve_jit(a_lo, r_cf, inner_params, precond=precond)
        inner_iters.append(int(res.n_iters))
        dx = cplx.to_numpy(field_from_tpu(res.x, mesh))
        return dx * scale

    out = refined_solve(solve_lo, apply_hi, rhs, tol=tol, max_refine=max_refine)
    out.inner_iters = inner_iters
    return out
