"""Wilson-structure detection for ingested matrices (ops/ingest.py).

The reference treats every parsed matrix as Wilson--Dirac by construction
(main.cpp builds A = I - kD around Parse.cpp's output unconditionally);
``detect_wilson`` recovers that structure FROM the ingested numbers with
full verification, so the solve can route through the half-spinor
streaming kernel instead of the generic block-stencil SpMV.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mgpgcr_tpu import cplx
from mgpgcr_tpu.mesh import LatticeMesh
from mgpgcr_tpu.ops.ingest import detect_wilson, wilson_operator_from_csr
from mgpgcr_tpu.ops.wilson import materialize_csr, random_links_np
from mgpgcr_tpu.ops.wilson_tpu import field_from_tpu, field_to_tpu

REFERENCE_MATRIX = os.environ.get(
    "MGPGCR_REFERENCE_MATRIX",
    "/root/reference/data/sample_matrix/4x4parsed.txt",
)


@pytest.fixture(scope="module")
def generated():
    mesh = LatticeMesh((4, 4, 4, 4, 4, 3))
    links = random_links_np(11, mesh)
    return mesh, links, materialize_csr(links, mesh)


def test_detect_recovers_links(generated):
    mesh, links, csr = generated
    det = detect_wilson(csr, mesh.spacetime_dims)
    assert det is not None
    assert det.diag == 0
    assert det.signs == (1, 1, 1, 1)
    assert det.spin_transform is None
    assert det.max_error < 1e-12
    np.testing.assert_allclose(det.links, links, atol=1e-13)


def test_detect_rejects_perturbed(generated):
    mesh, _, csr = generated
    vals = np.asarray(csr.data).copy()
    vals[len(vals) // 2] += 1e-3  # break the Kronecker structure
    import mgpgcr_tpu.ops.csr as csrmod

    bad = csrmod.CSRMatrix(
        jnp.asarray(csr.indptr), jnp.asarray(csr.indices),
        jnp.asarray(vals), csr.shape,
    )
    assert detect_wilson(bad, mesh.spacetime_dims) is None


def test_detect_rejects_short_extents(generated):
    mesh, _, csr = generated
    assert detect_wilson(csr, (2, 8, 4, 4)) is None


def test_reference_fixture_is_wilson():
    """The reference's own checked-in 4^4 matrix factorises: its hopping
    blocks are exact Kronecker products with this repo's Dirac-basis
    projectors, and the extracted links are unitary gauge fields."""
    if not os.path.exists(REFERENCE_MATRIX):
        pytest.skip("reference 4x4 fixture not available")
    from mgpgcr_tpu.io.parsed_txt import read_parsed_txt

    csr = read_parsed_txt(REFERENCE_MATRIX)
    det = detect_wilson(csr, (4, 4, 4, 4), tol=1e-8)
    assert det is not None
    assert det.diag == 0
    # the fixture's gamma convention: spatial gammas flipped relative to
    # ops/wilson.py => conjugation by gamma_t routes it natively
    assert det.signs == (1, -1, -1, -1)
    np.testing.assert_allclose(
        det.spin_transform, np.diag([1.0, 1.0, -1.0, -1.0]), atol=0
    )
    # extracted links are unitary (parsed at float precision)
    u = det.links.reshape(-1, 3, 3)
    uu = np.einsum("nab,ncb->nac", u, u.conj())
    np.testing.assert_allclose(
        uu,
        np.broadcast_to(np.eye(3, dtype=uu.dtype), uu.shape),
        rtol=0,
        atol=1e-5,
    )


def test_reference_fixture_routed_matches_ell():
    """End to end on the reference's own data: A = I - kD through the
    detection-routed native stencil (incl. the gamma_t spin conjugation)
    reproduces the generic ingested ELL apply."""
    if not os.path.exists(REFERENCE_MATRIX):
        pytest.skip("reference 4x4 fixture not available")
    from mgpgcr_tpu.io.parsed_txt import read_parsed_txt
    from mgpgcr_tpu.ops.dirac import make_dirac

    csr = read_parsed_txt(REFERENCE_MATRIX)
    mesh = LatticeMesh((4, 4, 4, 4, 4, 3))
    k = 0.2
    a = wilson_operator_from_csr(
        csr, (4, 4, 4, 4), k, dtype=jnp.float64,
        backend="pallas_interpret", tol=1e-8,
    )
    assert a is not None
    a_ell = make_dirac(csr.to_ell(), k=k)
    rng = np.random.default_rng(3)
    x = rng.standard_normal(mesh.size) + 1j * rng.standard_normal(mesh.size)
    want = np.asarray(a_ell.apply(jnp.asarray(x)))
    xt = field_to_tpu(cplx.from_numpy(x, jnp.float64), mesh)
    got = cplx.to_numpy(field_from_tpu(a.apply(xt), mesh))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_routed_operator_matches_ell(generated):
    """A = I - kD through the detection-routed stencil operator equals the
    generic ingested ELL path on the same flat vector."""
    mesh, _, csr = generated
    k = 0.15
    a = wilson_operator_from_csr(
        csr, mesh.spacetime_dims, k, dtype=jnp.float64,
        backend="pallas_interpret",
    )
    assert a is not None

    from mgpgcr_tpu.ops.dirac import make_dirac

    a_ell = make_dirac(csr.to_ell(), k=k)
    rng = np.random.default_rng(5)
    x = rng.standard_normal(mesh.size) + 1j * rng.standard_normal(mesh.size)
    want = np.asarray(a_ell.apply(jnp.asarray(x)))

    xt = field_to_tpu(cplx.from_numpy(x, jnp.float64), mesh)
    got_t = a.apply(xt)
    got = cplx.to_numpy(field_from_tpu(got_t, mesh))
    np.testing.assert_allclose(got, want, atol=1e-10)


def test_routed_operator_rejects_diagonal(generated):
    mesh, _, csr = generated
    n = mesh.size
    import mgpgcr_tpu.ops.csr as csrmod

    eye = csrmod.CSRMatrix.from_triplets(
        np.arange(n), np.arange(n), np.full(n, 2.0 + 0j), (n, n)
    )
    a_plus = csr + eye
    with pytest.raises(ValueError, match="uniform diagonal"):
        wilson_operator_from_csr(
            a_plus, mesh.spacetime_dims, 0.1, backend="pallas_interpret"
        )
