"""Near-null-space (low-mode) setup via inverse power iteration.

Equivalent of the reference's ``Arnoldi`` class (MG.h:72-122), which —
despite its name (quirk Q7) — performs inverse power iteration with an
inexact GCR inverse: 10 repeated solves for the first vector (MG.h:101-105),
then one solve + modified Gram--Schmidt + normalise per additional vector
(MG.h:110-121). The iterates converge to the low modes of A, which is what
the adaptive-MG coarse space needs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mgpgcr_tpu import fields
from mgpgcr_tpu.solvers.gcr import gcr_solve_jit
from mgpgcr_tpu.solvers.params import GCRParams


def inverse_power_vectors(
    key: jax.Array,
    a,
    n_vecs: int,
    dim: int,
    params: GCRParams,
    n_power_iters: int = 10,
    dtype=jnp.complex128,
) -> jnp.ndarray:
    """Return (n_vecs, dim) approximately-orthonormal low-mode vectors."""
    b = fields.random_field(key, dim, dtype)

    # vector 0: repeated inexact inverse applications (MG.h:101-105)
    for _ in range(n_power_iters):
        b = gcr_solve_jit(a, b, params, x0=b).x
        b = fields.normalize(b)
    vecs = [b]

    # vectors 1..n-1: one solve + Gram--Schmidt (MG.h:110-121)
    for _ in range(1, n_vecs):
        w = gcr_solve_jit(a, vecs[-1], params).x
        for v in vecs:
            w = w - fields.dot(v, w) * v
        vecs.append(fields.normalize(w))

    return jnp.stack(vecs)
