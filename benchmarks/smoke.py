"""Fast backend + regression smoke test (~2-3 min on the tunneled TPU).

Roadmap robustness item: the axon tunnel has failure modes that silently
corrupt timing work (first-fetch stalls, throttling swings, remote-compile
limits). This script checks, in order:

  1. backend alive: a trivial jit round-trips;
  2. correctness: a small fused GCR solve through the Pallas operator,
     INDEPENDENT residual verified;
  3. throughput: the production Dslash at 16^4 (chain-difference bare
     kernel) against an absolute sanity floor — healthy is ~110+ Gnnz/s
     at this size (small planes make per-call overheads dominate, so the
     32^4 figure is not comparable); below 30 the backend is throttled
     or broken.

Exit 0 all good / 1 regression / 2 broken. One JSON line per check.
Usage: python benchmarks/smoke.py [--platform cpu]
(this box pins a TPU platform via env + sitecustomize, so JAX_PLATFORMS
alone is too late — use --platform to smoke the CPU backend)
"""

from __future__ import annotations

import json
import sys
import time

import jax

if "--platform" in sys.argv:
    jax.config.update(
        "jax_platforms", sys.argv[sys.argv.index("--platform") + 1]
    )
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from mgpgcr_tpu import cplx  # noqa: E402
from mgpgcr_tpu.mesh import LatticeMesh  # noqa: E402
from mgpgcr_tpu.ops.dirac import DiracOperator  # noqa: E402
from mgpgcr_tpu.ops.pallas.dslash import PallasWilsonDirac  # noqa: E402
from mgpgcr_tpu.ops.wilson import random_links_cf  # noqa: E402
from mgpgcr_tpu.ops.wilson_tpu import TpuWilsonDirac, with_link_dtype  # noqa: E402
from mgpgcr_tpu.solvers.gcr import gcr_solve  # noqa: E402
from mgpgcr_tpu.solvers.params import GCRParams  # noqa: E402


_ORACLE_CHECK = r"""
import json, sys
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
sys.path.insert(0, "%(repo)s")
sys.path.insert(0, "%(repo)s/tests")
import mgpgcr_tpu as mg
from mgpgcr_tpu import fields
from mgpgcr_tpu.io import read_parsed_txt
from mgpgcr_tpu.ops.dirac import make_dirac
from oracle_gcr import oracle_gcr

a = make_dirac(read_parsed_txt("%(fixture)s").to_ell(), k=0.15)
mesh = mg.LatticeMesh((4, 4, 4, 4, 4, 3))
rhs = fields.random_field(jax.random.PRNGKey(42), mesh)
res = mg.gcr_solve(a, rhs, mg.GCRParams(tol=1e-10, max_iter=400, restart=5))
_, hist_o = oracle_gcr(
    lambda v: np.asarray(a.apply(jnp.asarray(v))), np.asarray(rhs),
    tol=1e-10, max_iter=400, restart=5,
)
hist = np.asarray(res.res_history)
hist = hist[~np.isnan(hist)]
ok = bool(res.converged) and len(hist) == len(hist_o) and bool(
    np.allclose(hist, hist_o, rtol=1e-6)
)
print(json.dumps({"iters": int(res.n_iters), "ok": ok}))
sys.exit(0 if ok else 1)
"""


def main() -> int:
    status = 0

    # 0. oracle parity on the reference fixture (complex128 CPU, own
    # subprocess: x64 + cpu config cannot be flipped in the TPU process).
    # Catches solver-trajectory regressions against the independent
    # numpy re-execution of the reference algorithm (GCR.h:159-302).
    import os
    import subprocess

    repo = __file__.rsplit("/", 2)[0]
    fixture = os.environ.get(
        "MGPGCR_REFERENCE_MATRIX",
        "/root/reference/data/sample_matrix/4x4parsed.txt",
    )
    if os.path.exists(fixture):
        t0 = time.perf_counter()
        proc = subprocess.run(
            [sys.executable, "-c",
             _ORACLE_CHECK % {"repo": repo, "fixture": fixture}],
            capture_output=True, text=True, timeout=900,
            env={**os.environ, "JAX_PLATFORMS": "cpu"},
        )
        ok = proc.returncode == 0
        print(
            json.dumps(
                {
                    "check": "oracle_parity_4^4",
                    "detail": (proc.stdout.strip().splitlines() or ["?"])[-1],
                    "seconds": round(time.perf_counter() - t0, 1),
                    "ok": ok,
                }
            ),
            flush=True,
        )
        if not ok:
            print(proc.stderr[-2000:], file=sys.stderr)
            return 2
    else:
        print(json.dumps({"check": "oracle_parity_4^4", "skipped":
                          "fixture not available"}), flush=True)

    # 1. backend alive
    t0 = time.perf_counter()
    x = jnp.ones((256, 256))
    v = float(jax.jit(lambda a: (a @ a).sum())(x))
    print(
        json.dumps(
            {
                "check": "backend",
                "platform": jax.devices()[0].platform,
                "device": getattr(jax.devices()[0], "device_kind", "?"),
                "first_sync_s": round(time.perf_counter() - t0, 2),
                "ok": v == 256.0 * 256 * 256,
            }
        ),
        flush=True,
    )

    # 2. correctness end to end
    on_tpu = jax.devices()[0].platform == "tpu"
    mesh = LatticeMesh((8, 8, 8, 8, 4, 3))
    links = random_links_cf(0, mesh, jnp.float32)
    op_cls = PallasWilsonDirac if on_tpu else TpuWilsonDirac
    d = op_cls.build(links, mesh)
    a = DiracOperator(d, cplx.from_scalar(0.12, jnp.float32))
    b = cplx.random(jax.random.PRNGKey(7), d.field_shape, jnp.float32)
    res = gcr_solve(a, b, GCRParams(tol=1e-5, max_iter=200, restart=5, fused=True))
    r = b - a.apply(res.x)
    rel = float(jnp.sqrt(cplx.abs2_sum(r) / cplx.abs2_sum(b)))
    ok = bool(res.converged) and rel < 1e-4
    print(
        json.dumps(
            {
                "check": "solve",
                "iters": int(res.n_iters),
                "indep_relres": rel,
                "ok": ok,
            }
        ),
        flush=True,
    )
    if not ok:
        return 2

    # 3. throughput vs recorded baseline (generous threshold: tunnel
    # throttling swings are +-20%; 2x slower means something is wrong)
    if on_tpu:
        import bench as _bench

        mesh16 = LatticeMesh((16, 16, 16, 16, 4, 3))
        links16 = cplx.random(
            jax.random.PRNGKey(0), (4, 3, 3, 16, 16, 256), jnp.float32
        )
        from mgpgcr_tpu.ops.pallas.dslash import links_to_tmajor

        op = with_link_dtype(
            PallasWilsonDirac(links_to_tmajor(links16), mesh16), jnp.bfloat16
        )
        psi = cplx.random(jax.random.PRNGKey(1), op.field_shape, jnp.float32)
        # bare kernel via the chain-difference estimator (bench.py round-4
        # protocol; the old _time_apply single-shot helper is gone)
        _bench._chain_time(op, psi, 2, inner=40)
        _bench._chain_time(op, psi, 4, inner=25)
        t2 = _bench._chain_time(op, psi, 2, inner=40)
        t4 = _bench._chain_time(op, psi, 4, inner=25)
        dt = max((t4 - t2) / 2, 1e-9)
        nnz = 39 * 12 * mesh16.n_sites
        gnnz = nnz / dt / 1e9
        # absolute sanity floor, not the 32^4 figure: at 16^4 the
        # t-planes are small (196 KB) and per-call overheads dominate
        # (~110 Gnnz/s healthy vs 629 at 32^4), so cross-size comparison
        # would false-alarm; below 30 the backend is throttled/broken
        ok = gnnz > 30.0
        print(
            json.dumps(
                {
                    "check": "throughput",
                    "gnnz_per_s_16^4": round(gnnz, 1),
                    "floor": 30.0,
                    "ok": ok,
                }
            ),
            flush=True,
        )
        if not ok:
            status = 1
    return status


if __name__ == "__main__":
    raise SystemExit(main())
