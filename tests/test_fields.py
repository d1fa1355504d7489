"""Field algebra tests (reference analogue: test_fields, main.cpp:60-143,
and test_gamma5, main.cpp:967-1004; oracle = numpy, tol 1e-13)."""

import jax
import jax.numpy as jnp
import numpy as np

from mgpgcr_tpu import fields
from mgpgcr_tpu.mesh import LatticeMesh

MESH = LatticeMesh((2, 2, 2, 2, 4, 3))


def _rand(n, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal(n) + 1j * rng.standard_normal(n)


def test_dot_norm_vs_numpy():
    a, b = _rand(100, 1), _rand(100, 2)
    got = complex(fields.dot(jnp.asarray(a), jnp.asarray(b)))
    assert abs(got - np.vdot(a, b)) < 1e-12
    assert abs(float(fields.squared_norm(jnp.asarray(a))) - np.vdot(a, a).real) < 1e-10
    nrm = np.asarray(fields.normalize(jnp.asarray(a)))
    assert abs(np.linalg.norm(nrm) - 1.0) < 1e-13


def test_random_field_distribution():
    x = fields.random_field(jax.random.PRNGKey(0), MESH)
    x = np.asarray(x)
    assert x.shape == (MESH.size,)
    assert np.abs(x.real).max() <= 1.0 and np.abs(x.imag).max() <= 1.0
    assert np.abs(x).min() > 0  # not zero-filled


def test_gamma5_involution_and_hermiticity():
    x = fields.random_field(jax.random.PRNGKey(1), MESH)
    y = fields.random_field(jax.random.PRNGKey(2), MESH)
    g5x = fields.gamma5(x, MESH)
    # involution: gamma5^2 = 1
    np.testing.assert_allclose(
        np.asarray(fields.gamma5(g5x, MESH)), np.asarray(x), rtol=0, atol=0
    )
    # hermitian: <y, g5 x> = <g5 y, x>
    lhs = complex(fields.dot(y, g5x))
    rhs = complex(fields.dot(fields.gamma5(y, MESH), x))
    assert abs(lhs - rhs) < 1e-12


def test_gamma5_spinor_swap():
    """gamma5 swaps spinor components 0<->2, 1<->3 (Fields.h:311-338)."""
    x = np.zeros(MESH.dims, dtype=np.complex128)
    x[0, 0, 0, 0, 0, 1] = 2.0 + 1j
    g5 = np.asarray(fields.gamma5(jnp.asarray(x)))
    assert g5[0, 0, 0, 0, 2, 1] == 2.0 + 1j
    assert g5[0, 0, 0, 0, 0, 1] == 0.0


def test_chiral_projectors():
    x = fields.random_field(jax.random.PRNGKey(3), MESH)
    p_plus = fields.chiral_project(x, +1, MESH)
    p_minus = fields.chiral_project(x, -1, MESH)
    # completeness
    np.testing.assert_allclose(
        np.asarray(p_plus + p_minus), np.asarray(x), atol=1e-15
    )
    # idempotence P+^2 = P+
    np.testing.assert_allclose(
        np.asarray(fields.chiral_project(p_plus, +1, MESH)),
        np.asarray(p_plus),
        atol=1e-14,
    )
    # orthogonality P- P+ = 0
    assert float(fields.norm(fields.chiral_project(p_plus, -1, MESH))) < 1e-14


def test_gram_schmidt():
    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.standard_normal((4, 50)) + 1j * rng.standard_normal((4, 50)))
    q = np.asarray(fields.gram_schmidt(v))
    gram = q.conj() @ q.T
    np.testing.assert_allclose(gram, np.eye(4), atol=1e-12)
