"""Field (lattice vector) algebra as pure functions over jnp arrays.

TPU-native replacement of the reference's ``Fields.h`` container class. A
field is simply a complex ``jnp.ndarray``: flat ``(N,)``, lattice-shaped
``(T,Z,Y,X,4,3)``, or a stack ``(B, N)`` of fields. All the reference's
member operations (Fields.h:53-63) become free functions that jit/vmap/shard
cleanly. Elementwise ops come straight from jnp; this module provides the
inner products and the spinor-structure operations.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mgpgcr_tpu.mesh import LatticeMesh


def random_field(
    key: jax.Array,
    mesh_or_shape,
    dtype=jnp.complex128,
) -> jnp.ndarray:
    """Random complex field with re, im ~ U[-1, 1), matching the reference's
    ``Field::init_rand`` distribution (Fields.h:126-135)."""
    if isinstance(mesh_or_shape, LatticeMesh):
        shape = (mesh_or_shape.size,)
    elif isinstance(mesh_or_shape, int):
        shape = (mesh_or_shape,)
    else:
        shape = tuple(mesh_or_shape)
    rdt = jnp.zeros((), dtype).real.dtype
    kr, ki = jax.random.split(key)
    re = jax.random.uniform(kr, shape, rdt, minval=-1.0, maxval=1.0)
    im = jax.random.uniform(ki, shape, rdt, minval=-1.0, maxval=1.0)
    return (re + 1j * im).astype(dtype)


def dot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Conjugate inner product <a, b> = sum conj(a) * b (Fields.h:217-226)."""
    return jnp.sum(jnp.conj(a) * b)


def squared_norm(a: jnp.ndarray) -> jnp.ndarray:
    """||a||^2 as a real scalar (Fields.h:229-235)."""
    return jnp.sum(jnp.real(a) ** 2 + jnp.imag(a) ** 2)


def norm(a: jnp.ndarray) -> jnp.ndarray:
    return jnp.sqrt(squared_norm(a))


def normalize(a: jnp.ndarray) -> jnp.ndarray:
    """a / ||a|| (Fields.h:238-243)."""
    return a / norm(a).astype(a.dtype)


def _to_spin(x: jnp.ndarray, mesh: LatticeMesh | None):
    """View x with an explicit spinor axis: (..., 4, 3)."""
    if x.ndim >= 2 and x.shape[-2:] == (4, 3):
        return x, None
    if mesh is None:
        raise ValueError("flat fields need a mesh to locate the spinor axis")
    lead = x.shape[:-1]
    return x.reshape(lead + mesh.dims), lead


def gamma5(x: jnp.ndarray, mesh: LatticeMesh | None = None) -> jnp.ndarray:
    """Apply gamma_5: spinor components swap 0<->2, 1<->3 (Fields.h:311-338).

    This is gamma_5 in the Dirac basis, where gamma_5 = [[0, I], [I, 0]] in
    2x2 spinor blocks. Accepts flat (with mesh) or lattice-shaped fields.
    """
    from mgpgcr_tpu import cplx

    xs, lead = _to_spin(x, mesh)
    ns = xs.ndim - 2  # spinor axis position
    out = cplx.take(xs, jnp.array([2, 3, 0, 1]), axis=ns)
    if lead is not None:
        out = out.reshape(x.shape)
    return out


def chiral_project(
    x: jnp.ndarray, sign: int, mesh: LatticeMesh | None = None
) -> jnp.ndarray:
    """P_+- x = 0.5 * (x +- gamma_5 x) — the chirality-preserving doubling of
    the MG setup (MG.h:317-345)."""
    g5x = gamma5(x, mesh)
    return 0.5 * (x + sign * g5x)


def gram_schmidt(vectors: jnp.ndarray) -> jnp.ndarray:
    """Modified Gram--Schmidt orthonormalisation of rows of (n, N).

    Equivalent of the reference's per-vector orthogonalisation loops
    (MG.h:110-121, 190-198) — retained for exact-trajectory comparisons;
    the MG setup itself uses batched QR which spans the same subspace.
    """
    n = vectors.shape[0]

    def body(i, vecs):
        v = vecs[i]

        def inner(j, v):
            proj = jnp.where(j < i, dot(vecs[j], v), 0.0 + 0.0j)
            return v - proj * vecs[j]

        v = jax.lax.fori_loop(0, n, inner, v)
        v = v / jnp.sqrt(squared_norm(v)).astype(v.dtype)
        return vecs.at[i].set(v)

    return jax.lax.fori_loop(0, n, body, vectors)
