"""Pallas MG grid-transfer kernels vs the XLA field-shaped forms.

Interpreter mode on the CPU backend (the compiled path is exercised at
32^4 on TPU — parity measured ~3e-7 relative f32). Reference operators
being replaced: MG::restrict / MG::expand (MG.h:348-403).
"""

import jax
import jax.numpy as jnp
import pytest

from mgpgcr_tpu import cplx
from mgpgcr_tpu.mesh import LatticeMesh
from mgpgcr_tpu.ops.pallas.transfer import prolong_pallas, restrict_pallas
from mgpgcr_tpu.solvers.mg import field_basis, prolong_field, restrict_field


def _setup(dims=(4, 4, 4, 4), block=2, ne=6, dt=jnp.float32):
    mesh = LatticeMesh((*dims, 4, 3))
    bm = mesh.blocking(block)
    q = cplx.random(jax.random.PRNGKey(0), (ne, bm.n_blocks, bm.block_len), dt)
    qf = field_basis(q, bm)
    t, z, y, xx = dims
    x = cplx.random(jax.random.PRNGKey(1), (4, 3, t, z, y * xx), dt)
    xc = cplx.random(jax.random.PRNGKey(2), (bm.n_blocks * ne,), dt)
    return bm, qf, x, xc


def _maxerr(a, b):
    return max(
        float(jnp.max(jnp.abs(a.re - b.re))), float(jnp.max(jnp.abs(a.im - b.im)))
    )


@pytest.mark.parametrize("dims,block", [((4, 4, 4, 4), 2), ((2, 4, 2, 8), 2)])
def test_restrict_matches_field_form(dims, block):
    bm, qf, x, _ = _setup(dims, block)
    ref = restrict_field(qf, bm, x)
    out = restrict_pallas(qf, bm, x)
    assert _maxerr(ref, out) < 1e-5


@pytest.mark.parametrize("dims,block", [((4, 4, 4, 4), 2), ((2, 4, 2, 8), 2)])
def test_prolong_matches_field_form(dims, block):
    bm, qf, _, xc = _setup(dims, block)
    ref = prolong_field(qf, bm, xc)
    out = prolong_pallas(qf, bm, xc)
    assert _maxerr(ref, out) < 1e-5


def test_prolong_fused_base_and_damping():
    bm, qf, x, xc = _setup()
    ref = x + cplx.scale_real(prolong_field(qf, bm, xc), jnp.float32(0.3))
    out = prolong_pallas(qf, bm, xc, r=x, damping=0.3)
    assert _maxerr(ref, out) < 1e-5


def test_bf16_basis_storage():
    bm, qf, x, xc = _setup()
    qf16 = cplx.CF(qf.re.astype(jnp.bfloat16), qf.im.astype(jnp.bfloat16))
    ref = restrict_field(qf, bm, x)
    out = restrict_pallas(qf16, bm, x)
    scale = float(jnp.max(jnp.abs(ref.re)))
    assert _maxerr(ref, out) / scale < 3e-2  # bf16 basis rounding only
    ref_p = prolong_field(qf, bm, xc)
    out_p = prolong_pallas(qf16, bm, xc)
    scale_p = float(jnp.max(jnp.abs(ref_p.re)))
    assert _maxerr(ref_p, out_p) / scale_p < 3e-2


@pytest.mark.slow
def test_mg_preconditioner_pallas_route():
    """End-to-end MGPreconditioner apply: forced-pallas transfers must
    reproduce the XLA route (same coarse solve between them)."""
    import dataclasses

    from mgpgcr_tpu.ops.dirac import DiracOperator
    from mgpgcr_tpu.ops.wilson import random_links_cf
    from mgpgcr_tpu.ops.wilson_tpu import TpuWilsonDirac
    from mgpgcr_tpu.solvers.mg import setup_mg
    from mgpgcr_tpu.solvers.params import MGParams

    dims = (4, 4, 4, 4)
    mesh = LatticeMesh((*dims, 4, 3))
    links = random_links_cf(0, mesh, jnp.float32)
    d = TpuWilsonDirac.build(links, mesh)
    a = DiracOperator(d, cplx.from_scalar(0.12, jnp.float32))
    mgp = setup_mg(
        jax.random.PRNGKey(3), a, mesh,
        MGParams(block=2, n_nullvecs=2, transfer_backend="xla"),
        layout="tpu",
    )
    mgp_pallas = dataclasses.replace(
        mgp, params=dataclasses.replace(mgp.params, transfer_backend="pallas")
    )
    r = cplx.random(jax.random.PRNGKey(4), d.field_shape, jnp.float32)
    out_x = mgp.apply(r)
    out_p = mgp_pallas.apply(r)
    scale = float(jnp.max(jnp.abs(out_x.re)))
    assert _maxerr(out_x, out_p) / scale < 1e-4
