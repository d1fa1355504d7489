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
from mgpgcr_tpu.solvers.gcr import _allsum, gcr_solve_jit
from mgpgcr_tpu.solvers.params import GCRParams


def _normalize(v, axis_names: tuple = ()):
    import jax.numpy as jnp

    return cplx.scale_real(
        v, 1.0 / jnp.sqrt(_allsum(cplx.abs2_sum(v), axis_names))
    )


def inverse_power_vectors(
    a,
    b0,
    n_vecs: int,
    params: GCRParams,
    n_power_iters: int = 10,
    axis_names: tuple = (),
):
    """Return (n_vecs, *field_shape) approximately-orthonormal low modes,
    stacked along a new leading axis, in b0's representation.

    ``axis_names``: set when running on LOCAL shards inside ``shard_map``
    (the sharded MG setup, solvers/mg_dist.py) — every norm and
    Gram--Schmidt dot becomes a psum and the GCR solves distribute."""
    b = _normalize(b0, axis_names)

    # jitted solves: every iteration reuses one compiled executable —
    # essential for sharded operators, where eager shard_map dispatch
    # re-traces and re-partitions per call
    # vector 0: repeated inexact inverse applications (MG.h:101-105)
    for _ in range(n_power_iters):
        b = gcr_solve_jit(a, b, params, x0=b, axis_names=axis_names).x
        b = _normalize(b, axis_names)
    vecs = [b]

    # vectors 1..n-1: one solve + Gram--Schmidt (MG.h:110-121)
    for _ in range(1, n_vecs):
        w = gcr_solve_jit(a, vecs[-1], params, axis_names=axis_names).x
        for v in vecs:
            w = w - _allsum(cplx.vdot(v, w), axis_names) * v
        vecs.append(_normalize(w, axis_names))

    return cplx.stack(vecs, axis=0)
