"""Fused Pallas Dslash kernel: correctness vs the XLA slab implementation.

Runs in Pallas interpreter mode on the CPU backend (the kernel's compiled
path is exercised on real TPU hardware by bench.py; on v5e it matches the
XLA path bit-for-bit, measured err == 0.0).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mgpgcr_tpu import cplx, fields
from mgpgcr_tpu.mesh import LatticeMesh
from mgpgcr_tpu.ops.wilson import WilsonDiracOperator, random_links
from mgpgcr_tpu.ops.wilson_tpu import (
    TpuWilsonDirac,
    field_from_tpu,
    field_to_tpu,
    links_to_tpu,
)
from mgpgcr_tpu.ops.pallas.dslash import PallasWilsonDirac, _pick_block


def _problem(dims):
    mesh = LatticeMesh(dims)
    links = random_links(jax.random.PRNGKey(0), mesh)
    psi = fields.random_field(jax.random.PRNGKey(1), mesh)
    links_t = links_to_tpu(cplx.ascf(links, jnp.float64), mesh)
    psi_t = field_to_tpu(cplx.ascf(psi, jnp.float64), mesh)
    ref = TpuWilsonDirac(links_t, mesh).apply(psi_t)
    return mesh, links_t, psi_t, ref


@pytest.mark.parametrize(
    "tb,zb",
    [(1, 6), (2, 6), (4, 6)],
)
def test_dslash_z_resident(tb, zb):
    """Grid over T only; z/y/x shifts in-block."""
    mesh, links_t, psi_t, ref = _problem((4, 6, 2, 8, 4, 3))
    op = PallasWilsonDirac(links_t, mesh, tb, zb, interpret=True)
    got = op.apply(psi_t)
    np.testing.assert_allclose(
        cplx.to_numpy(got), cplx.to_numpy(ref), atol=1e-13
    )


def test_dslash_z_blocked():
    """z gridded in multiples of 8 with thick halo views."""
    mesh, links_t, psi_t, ref = _problem((2, 16, 2, 8, 4, 3))
    op = PallasWilsonDirac(links_t, mesh, 1, 8, interpret=True)
    got = op.apply(psi_t)
    np.testing.assert_allclose(
        cplx.to_numpy(got), cplx.to_numpy(ref), atol=1e-13
    )


@pytest.mark.slow
def test_dslash_matches_canonical_operator():
    """Kernel output equals the canonical-layout reference stencil."""
    dims = (4, 4, 2, 4, 4, 3)
    mesh = LatticeMesh(dims)
    links = random_links(jax.random.PRNGKey(5), mesh)
    psi = fields.random_field(jax.random.PRNGKey(6), mesh)
    ref = WilsonDiracOperator(links, mesh).apply(psi)

    op = PallasWilsonDirac.build(cplx.ascf(links), mesh, 2, 4, interpret=True)
    got_t = op.apply(field_to_tpu(cplx.ascf(psi), mesh))
    got = cplx.to_numpy(field_from_tpu(got_t, mesh))
    np.testing.assert_allclose(got, np.asarray(psi * 0 + ref), atol=1e-13)


def test_pick_block_invariants():
    for t, z, v in [(16, 16, 256), (32, 32, 1024), (4, 6, 16), (8, 8, 4096)]:
        tb, zb = _pick_block(t, z, v)
        assert t % tb == 0 and z % zb == 0
        assert zb == z or zb % 8 == 0
        assert tb * zb * v <= max(32768, v)


@pytest.mark.slow
def test_bf16_links_accuracy():
    """bf16 link storage (preconditioner-side traffic optimization) stays
    within ~1e-2 relative of the f32 operator."""
    from mgpgcr_tpu.ops.wilson_tpu import with_link_dtype

    mesh, links_t, psi_t, ref = _problem((4, 4, 2, 4, 4, 3))
    op32 = PallasWilsonDirac(
        cplx.CF(links_t.re.astype(jnp.float32), links_t.im.astype(jnp.float32)),
        mesh, 2, 4, interpret=True,
    )
    op16 = with_link_dtype(op32, jnp.bfloat16)
    psi32 = cplx.CF(psi_t.re.astype(jnp.float32), psi_t.im.astype(jnp.float32))
    a = cplx.to_numpy(op32.apply(psi32))
    b = cplx.to_numpy(op16.apply(psi32))
    rel = np.linalg.norm(b - a) / np.linalg.norm(a)
    assert rel < 1e-2, rel


def test_fused_dirac_apply():
    """apply_dirac computes psi - k D psi in one kernel pass, matching the
    two-pass composition exactly."""
    from mgpgcr_tpu.ops.dirac import DiracOperator
    from mgpgcr_tpu.ops.pallas.dslash import links_to_tmajor

    mesh, links_t, psi_t, ref_d = _problem((4, 6, 2, 8, 4, 3))
    op = PallasWilsonDirac(links_to_tmajor(links_t), mesh, interpret=True)
    k = cplx.from_scalar(0.13 + 0.02j, jnp.float64)
    a = DiracOperator(op, k)
    got = a.apply(psi_t)
    want = psi_t - k * ref_d
    np.testing.assert_allclose(
        cplx.to_numpy(got), cplx.to_numpy(want), atol=1e-13
    )


@pytest.mark.slow
def test_tmajor_build_and_layout_inference():
    """build() stores t-major links for streaming-eligible problems; both
    layouts produce identical results."""
    from mgpgcr_tpu.ops.pallas.dslash import _links_is_tmajor, links_to_tmajor

    mesh, links_t, psi_t, ref = _problem((4, 6, 2, 8, 4, 3))
    op_mu = PallasWilsonDirac(links_t, mesh, interpret=True)
    op_tm = PallasWilsonDirac(links_to_tmajor(links_t), mesh, interpret=True)
    assert not _links_is_tmajor(op_mu.links)
    assert _links_is_tmajor(op_tm.links)
    np.testing.assert_allclose(
        cplx.to_numpy(op_mu.apply(psi_t)), cplx.to_numpy(ref), atol=1e-13
    )
    np.testing.assert_allclose(
        cplx.to_numpy(op_tm.apply(psi_t)), cplx.to_numpy(ref), atol=1e-13
    )


def test_compressed_links_exact_for_su3():
    """Two-row (12-real) storage reconstructs row2 = conj(row0 x row1)
    in-kernel; exact (to f64 roundoff) for true SU(3) links."""
    from mgpgcr_tpu.ops.pallas.dslash import links_to_tmajor

    mesh, links_t, psi_t, ref = _problem((4, 6, 2, 8, 4, 3))
    op = PallasWilsonDirac(links_to_tmajor(links_t), mesh, interpret=True)
    opc = op.with_compressed_links()
    assert opc.links.shape[2] == 2
    np.testing.assert_allclose(
        cplx.to_numpy(opc.apply(psi_t)), cplx.to_numpy(ref), atol=1e-12
    )
    # fused A = I - kD agrees too
    k = 0.137
    got = opc.apply_dirac(psi_t, k)
    want = psi_t - k * ref
    np.testing.assert_allclose(
        cplx.to_numpy(got), cplx.to_numpy(want), atol=1e-12
    )


def test_compressed_links_bf16_accuracy():
    """bf16 two-row storage: reconstruction in f32 keeps the relative
    error at the bf16-storage level (~1e-2 elementwise, ~2e-3 rms)."""
    from mgpgcr_tpu.ops.pallas.dslash import links_to_tmajor
    from mgpgcr_tpu.ops.wilson_tpu import with_link_dtype

    mesh = LatticeMesh((4, 6, 2, 8, 4, 3))
    links = random_links(jax.random.PRNGKey(0), mesh)
    psi = fields.random_field(jax.random.PRNGKey(1), mesh)
    links_t = links_to_tpu(cplx.ascf(links, jnp.float32), mesh)
    psi_t = field_to_tpu(cplx.ascf(psi, jnp.float32), mesh)
    op32 = PallasWilsonDirac(links_to_tmajor(links_t), mesh, interpret=True)
    ref = cplx.to_numpy(op32.apply(psi_t))
    op16c = with_link_dtype(op32, jnp.bfloat16).with_compressed_links()
    got = cplx.to_numpy(op16c.apply(psi_t))
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 5e-3, rel
