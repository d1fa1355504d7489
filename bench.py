"""Headline benchmark: Wilson--Dirac SpMV throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The hot kernel of the whole framework is the Wilson--Dirac hopping-operator
application (the reference's CSR SpMV, Operator.h:331-346, costed at
O(nnz) per GCR iteration — SemesterProject.pdf §2.2). Here it is the fused
Pallas Dslash kernel (ops/pallas/dslash.py) on a 32^4 lattice; effective
nonzeros per site are 39 x 12 = 468, matching the reference fixture's
uniform 39 nnz/row (data/sample_matrix/4x4parsed.txt).

``vs_baseline``: the reference publishes no throughput numbers
(BASELINE.md), so the self-generated baseline is the kernel's
speed-of-light: the HBM-bandwidth roofline for the minimal traffic of one
application (links + field in, field out) on the local chip. A value of
0.37 means 37% of roofline.

Links are random complex (not SU(3)-projected) — identical memory/compute
shape, skips a minutes-long host-side QR that would dominate bench time.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp

from mgpgcr_tpu import cplx
from mgpgcr_tpu.mesh import LatticeMesh
from mgpgcr_tpu.ops.pallas.dslash import PallasWilsonDirac
from mgpgcr_tpu.ops.wilson_tpu import TpuWilsonDirac

# HBM bandwidth (bytes/s) per chip by TPU generation; conservative defaults.
_HBM_BW = {
    "v4": 1.2e12,
    "v5 lite": 8.192e11,
    "v5e": 8.192e11,
    "v5p": 2.765e12,
    "v6": 1.64e12,
    "cpu": 5.0e10,
}


def _chip_bandwidth() -> float:
    dev = jax.devices()[0]
    kind = getattr(dev, "device_kind", "cpu").lower()
    for key, bw in _HBM_BW.items():
        if key in kind:
            return bw
    return _HBM_BW["cpu"]


def main() -> None:
    on_tpu = jax.devices()[0].platform == "tpu"
    dims = (32, 32, 32, 32) if on_tpu else (8, 8, 8, 8)
    t, z, y, xx = dims
    mesh = LatticeMesh((*dims, 4, 3))
    rdtype = jnp.float32  # split re/im CF pairs: the TPU complex representation

    links = cplx.random(jax.random.PRNGKey(0), (4, 3, 3, t, z, y * xx), rdtype)
    if on_tpu:
        op = PallasWilsonDirac(links, mesh)
    else:  # CPU smoke path: XLA slab implementation, same layout/semantics
        op = TpuWilsonDirac(links, mesh)
    psi = cplx.random(jax.random.PRNGKey(1), op.field_shape, rdtype)

    # op passed as a jit *argument* (closed-over links would be baked into
    # the HLO as hundreds of MB of constants). The iterated field is
    # rescaled each application so it stays finite (||D|| > 1).
    apply_n = jax.jit(
        lambda op, x: jax.lax.fori_loop(
            0, 100, lambda _, v: cplx.scale_real(op.apply(v), 0.05), x
        )
    )
    # warm-up/compile; the scalar fetch absorbs the backend's (large,
    # one-time) first-sync stall so it stays out of the timed region
    out = apply_n(op, psi)
    float(jnp.sum(out.re))

    reps = 5
    t0 = time.perf_counter()
    out = psi
    for _ in range(reps):
        out = apply_n(op, out)
    float(jnp.sum(out.re))  # device-to-host fetch = reliable full sync
    dt = time.perf_counter() - t0
    n_apps = 100 * reps

    v = mesh.n_sites
    eff_nnz = 39 * 12 * v  # uniform 39 nnz/row x 12 rows/site (fixture layout)
    nnz_per_s = eff_nnz * n_apps / dt

    # roofline: minimal HBM traffic per application — per site, in complex
    # elements: links 4 x 9 + field read 12 + field write 12, each 2 reals
    itemsize = 2 * jnp.zeros((), rdtype).dtype.itemsize
    bytes_per_app = v * (4 * 9 + 12 + 12) * itemsize
    sol_apps = _chip_bandwidth() / bytes_per_app
    sol_nnz = eff_nnz * sol_apps

    print(
        f"# lattice {dims}, {n_apps} applications in {dt:.3f}s "
        f"({n_apps / dt:.1f} apps/s, {dt / n_apps * 1e6:.0f} us/apply), "
        f"device={jax.devices()[0].device_kind}",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "wilson_dirac_spmv_throughput",
                "value": round(nnz_per_s / 1e9, 3),
                "unit": "Gnnz/s",
                "vs_baseline": round(nnz_per_s / sol_nnz, 4),
            }
        )
    )


def _main_with_retry() -> None:
    # the tunneled TPU backend occasionally fails a fetch with a transient
    # FAILED_PRECONDITION/UNIMPLEMENTED right after another process used
    # the chip; one retry after a pause recovers it (observed on v5e)
    try:
        main()
    except Exception as e:  # pragma: no cover
        print(f"# first attempt failed ({type(e).__name__}); retrying", file=sys.stderr)
        time.sleep(20)
        main()


if __name__ == "__main__":
    _main_with_retry()
