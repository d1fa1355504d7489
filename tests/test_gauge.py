"""Quenched gauge generator validation (mgpgcr_tpu/gauge.py).

The physics anchor: the quenched Wilson-action average plaquette at
beta = 6.0 is 0.5937 in the infinite-volume limit (standard tadpole
input u0 = <P>^(1/4) = 0.8778). Hot and cold starts must converge to
the same value from opposite sides — the classic thermalisation
cross-check — and links must stay exactly SU(3).

This closes the reference's data-provenance gap: its matrices come from
thermalised conf5 configurations (/root/reference/src/Parse.cpp:13,
main.cpp:837, blobs missing); Haar-random links are not physically
comparable (different k_c, milder near-null structure).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from mgpgcr_tpu.gauge import plaquette, thermalized_links
from mgpgcr_tpu.mesh import LatticeMesh

MESH = LatticeMesh((4, 4, 4, 4, 4, 3))
PLAQ_B6 = 0.5937  # infinite-volume quenched Wilson <P> at beta = 6.0


def _su3_maxdev(links) -> float:
    u = np.asarray(links)
    eye = np.eye(3)
    udag_u = np.einsum("...ji,...jk->...ik", u.conj(), u)
    dev_unit = np.abs(udag_u - eye).max()
    dev_det = np.abs(np.linalg.det(u) - 1.0).max()
    return max(float(dev_unit), float(dev_det))


@pytest.mark.slow
@pytest.mark.slow
def test_hot_cold_starts_agree_at_beta6():
    links_h, hist_h = thermalized_links(
        0, MESH, beta=6.0, n_sweeps=40, n_or=2, dtype=jnp.complex128
    )
    links_c, hist_c = thermalized_links(
        1, MESH, beta=6.0, n_sweeps=40, n_or=2, dtype=jnp.complex128,
        start="cold",
    )
    p_h, p_c = hist_h[-1], hist_c[-1]
    # 4^4 at 40 sweeps: finite-volume + statistics tolerance
    assert abs(p_h - PLAQ_B6) < 0.05, (p_h, hist_h)
    assert abs(p_c - PLAQ_B6) < 0.05, (p_c, hist_c)
    assert abs(p_h - p_c) < 0.05
    assert _su3_maxdev(links_h) < 1e-10
    assert _su3_maxdev(links_c) < 1e-10


@pytest.mark.slow
def test_heatbath_orders_hot_start():
    """A few sweeps at strong coupling must raise the plaquette well
    above the Haar-random expectation <P> = 0 and keep links SU(3)."""
    links, hist = thermalized_links(
        2, MESH, beta=6.0, n_sweeps=6, n_or=1, dtype=jnp.complex128,
        measure_every=2,
    )
    assert hist[-1] > 0.35, hist
    assert hist == sorted(hist), hist  # monotone approach from hot start
    assert _su3_maxdev(links) < 1e-10


def test_plaquette_of_unit_links_is_one():
    eye = jnp.broadcast_to(
        jnp.eye(3, dtype=jnp.complex128), (4, 4, 4, 4, 4, 3, 3)
    )
    assert abs(float(plaquette(eye)) - 1.0) < 1e-12
