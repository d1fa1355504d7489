"""CF (split re/im) heat bath vs the complex reference implementation.

gauge_tpu.py re-expresses gauge.py's Cabibbo–Marinari / Kennedy–Pendleton
generator in the TPU representation. The complex implementation is the
oracle: staples, plaquette and a FULL combined HB+OR sweep must agree in
f64 (same PRNG keys → same update, by construction of the draw shapes),
and the f32 path must keep links exactly SU(3) and thermalise the
plaquette toward <P>(beta=6) ~ 0.594."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mgpgcr_tpu import cplx, gauge, gauge_tpu
from mgpgcr_tpu.mesh import LatticeMesh

DIMS = (4, 4, 2, 4, 4, 3)


def _hot_links_c(seed=0, dtype=jnp.complex128):
    from mgpgcr_tpu.ops.wilson import random_links_np

    mesh = LatticeMesh(DIMS)
    return jnp.asarray(random_links_np(seed, mesh), dtype), mesh


def _su3_errors(links_np: np.ndarray):
    u = links_np.reshape(-1, 3, 3)
    uni = np.abs(u @ u.conj().transpose(0, 2, 1) - np.eye(3)).max()
    det = np.abs(np.linalg.det(u) - 1.0).max()
    return uni, det


def test_staples_match_complex():
    links_c, _ = _hot_links_c()
    cf = gauge_tpu.to_colour_major(cplx.ascf(links_c, jnp.float64))
    for mu in range(4):
        a_c = np.asarray(gauge.staples(links_c, mu))
        a_cf = cplx.to_numpy(
            gauge_tpu.from_colour_major(
                # re-insert the mu axis for the canonical converter
                cplx.stack([gauge_tpu.staples_cf(cf, mu)] * 4, 0)
            )
        )[mu]
        np.testing.assert_allclose(a_cf, a_c, atol=1e-12)


def test_plaquette_matches_complex():
    links_c, _ = _hot_links_c()
    cf = gauge_tpu.to_colour_major(cplx.ascf(links_c, jnp.float64))
    p_c = float(gauge.plaquette(links_c))
    p_cf = float(gauge_tpu.plaquette_cf(cf))
    assert abs(p_c - p_cf) < 1e-12


@pytest.mark.slow
def test_full_sweep_matches_complex_in_f64():
    """Same key, same hot start: the CF sweep IS the complex sweep —
    heat-bath draws, overrelaxation reflections and re-unitarisation all
    agree to f64 rounding."""
    links_c, _ = _hot_links_c(seed=3)
    cf = gauge_tpu.to_colour_major(cplx.ascf(links_c, jnp.float64))
    key = jax.random.PRNGKey(42)
    out_c = np.asarray(gauge.sweep(key, links_c, 6.0, n_or=2))
    out_cf = cplx.to_numpy(
        gauge_tpu.from_colour_major(gauge_tpu.sweep_cf(key, cf, 6.0, n_or=2))
    )
    np.testing.assert_allclose(out_cf, out_c, atol=1e-10)


@pytest.mark.slow
def test_f32_sweeps_stay_su3_and_heat_toward_equilibrium():
    mesh = LatticeMesh(DIMS)
    links, hist = gauge_tpu.thermalized_links_cf(
        0, mesh, beta=6.0, n_sweeps=6, n_or=2, dtype=jnp.float32,
        start="hot", measure_every=2,
    )
    assert links.shape == (4, *mesh.spacetime_dims, 3, 3)
    uni, det = _su3_errors(cplx.to_numpy(links))
    assert uni < 2e-6 and det < 2e-6
    # hot start has <P> ~ 0; beta = 6 drives it up toward ~0.59
    assert hist[-1] > 0.35


@pytest.mark.slow
def test_cold_start_first_sweep_plaquette_high():
    """From unit links at beta = 6 the plaquette stays near 1 after one
    sweep (equilibrium is approached from above ~0.59 < P < 1)."""
    mesh = LatticeMesh(DIMS)
    links, hist = gauge_tpu.thermalized_links_cf(
        1, mesh, beta=6.0, n_sweeps=2, n_or=1, dtype=jnp.float32,
        start="cold", measure_every=1,
    )
    assert 0.5 < hist[0] <= 1.0
