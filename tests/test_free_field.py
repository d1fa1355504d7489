"""Free-field (unit gauge links) exact-spectrum tests.

For U = 1 the hopping operator diagonalises in momentum space:

    D(p) = sum_mu [(1 - gamma_mu) e^{i p_mu} + (1 + gamma_mu) e^{-i p_mu}]
         = 2 sum_mu cos p_mu  -  2 i sum_mu sin(p_mu) gamma_mu,

and since the Euclidean gammas are Hermitian, anticommuting and square
to 1, the eigenvalues are

    lambda(p) = 2 sum_mu cos p_mu  -+  2 i sqrt(sum_mu sin^2 p_mu),

each with multiplicity 2 (spin) x 3 (colour). Periodic momenta are
p_mu = 2 pi k / L_mu; the anti-periodic temporal BC shifts
p_t -> p_t + pi / T. This pins the whole stencil — gamma algebra,
neighbour shifts, boundary phases — against closed-form physics, not
just against another implementation."""

import itertools

import numpy as np
import pytest

from mgpgcr_tpu.mesh import LatticeMesh
from mgpgcr_tpu.ops.wilson import antiperiodic_t, materialize_csr, unit_links

DIMS = (4, 4, 2, 2)


def _analytic_spectrum(dims, antiperiodic: bool) -> np.ndarray:
    eigs = []
    for k in itertools.product(*[range(d) for d in dims]):
        p = [2.0 * np.pi * ki / di for ki, di in zip(k, dims)]
        if antiperiodic:
            p[0] += np.pi / dims[0]
        c = 2.0 * sum(np.cos(pm) for pm in p)
        s = 2.0 * np.sqrt(sum(np.sin(pm) ** 2 for pm in p))
        eigs += [c + 1j * s] * 6 + [c - 1j * s] * 6
    return np.asarray(eigs)


def _sorted(v: np.ndarray) -> np.ndarray:
    order = np.lexsort((np.round(v.imag, 9), np.round(v.real, 9)))
    return v[order]


@pytest.mark.parametrize("antiperiodic", [False, True], ids=["periodic", "antiperiodic"])
def test_free_field_spectrum(antiperiodic):
    mesh = LatticeMesh((*DIMS, 4, 3))
    links = np.asarray(unit_links(mesh))
    if antiperiodic:
        links = antiperiodic_t(links)
    m = materialize_csr(links, mesh)
    import scipy.sparse as sp

    dense = sp.csr_matrix(
        (m.data, m.indices, m.indptr), shape=m.shape
    ).toarray()
    got = _sorted(np.linalg.eigvals(dense))
    want = _sorted(_analytic_spectrum(DIMS, antiperiodic))
    np.testing.assert_allclose(got, want, atol=1e-9)
