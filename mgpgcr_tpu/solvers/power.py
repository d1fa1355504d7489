"""Near-null-space (low-mode) setup via inverse power iteration.

Equivalent of the reference's ``Arnoldi`` class (MG.h:72-122), which —
despite its name (quirk Q7) — performs inverse power iteration with an
inexact GCR inverse: 10 repeated solves for the first vector (MG.h:101-105),
then one solve + modified Gram--Schmidt + normalise per additional vector
(MG.h:110-121). The iterates converge to the low modes of A, which is what
the adaptive-MG coarse space needs.

Representation-generic: fields may be complex jnp arrays or split re/im
``cplx.CF`` pairs of any layout; the caller provides the initial random
field ``b0`` in the desired representation.
"""

from __future__ import annotations

from mgpgcr_tpu import cplx
from mgpgcr_tpu.solvers.gcr import gcr_solve_jit
from mgpgcr_tpu.solvers.params import GCRParams


def _normalize(v):
    import jax.numpy as jnp

    return cplx.scale_real(v, 1.0 / jnp.sqrt(cplx.abs2_sum(v)))


def inverse_power_vectors(
    a,
    b0,
    n_vecs: int,
    params: GCRParams,
    n_power_iters: int = 10,
):
    """Return (n_vecs, *field_shape) approximately-orthonormal low modes,
    stacked along a new leading axis, in b0's representation."""
    b = _normalize(b0)

    # jitted solves: every iteration reuses one compiled executable —
    # essential for sharded operators, where eager shard_map dispatch
    # re-traces and re-partitions per call
    # vector 0: repeated inexact inverse applications (MG.h:101-105)
    for _ in range(n_power_iters):
        b = gcr_solve_jit(a, b, params, x0=b).x
        b = _normalize(b)
    vecs = [b]

    # vectors 1..n-1: one solve + Gram--Schmidt (MG.h:110-121)
    for _ in range(1, n_vecs):
        w = gcr_solve_jit(a, vecs[-1], params).x
        for v in vecs:
            w = w - cplx.vdot(v, w) * v
        vecs.append(_normalize(w))

    return cplx.stack(vecs, axis=0)
