"""MG-GCR time-to-solution benchmark (single device).

The reference's headline experiment is iterations-to-tolerance near the
critical hopping parameter (main.cpp:834-875; SemesterProject.pdf §4.2
Fig. 1-2). This measures wall-clock and iterations for plain GCR vs
MG-preconditioned GCR on a synthetic Wilson-Dirac system, with the fused
Pallas Dslash on TPU (XLA slab path elsewhere). JSON-lines output.

Usage: python benchmarks/solve_bench.py [--lattice 16 16 16 16] [--k 0.125]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from mgpgcr_tpu import cplx  # noqa: E402
from mgpgcr_tpu.mesh import LatticeMesh  # noqa: E402
from mgpgcr_tpu.ops.dirac import DiracOperator  # noqa: E402
from mgpgcr_tpu.ops.pallas.dslash import PallasWilsonDirac  # noqa: E402
from mgpgcr_tpu.ops.wilson import random_links_cf  # noqa: E402
from mgpgcr_tpu.ops.wilson_tpu import TpuWilsonDirac  # noqa: E402
from mgpgcr_tpu.solvers.gcr import gcr_solve  # noqa: E402
from mgpgcr_tpu.solvers.mg import setup_mg  # noqa: E402
from mgpgcr_tpu.solvers.params import GCRParams, MGParams  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--lattice", type=int, nargs=4, default=[16, 16, 16, 16])
    ap.add_argument("--k", type=float, default=0.125)
    ap.add_argument("--tol", type=float, default=1e-5)
    ap.add_argument("--block", type=int, default=4)
    ap.add_argument("--nullvecs", type=int, default=6)
    ap.add_argument("--platform", help="force jax platform")
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    mesh = LatticeMesh((*args.lattice, 4, 3))
    on_tpu = jax.devices()[0].platform == "tpu"
    links = random_links_cf(0, mesh, jnp.float32)
    op_cls = PallasWilsonDirac if on_tpu else TpuWilsonDirac
    d = op_cls.build(links, mesh)
    a = DiracOperator(d, cplx.from_scalar(args.k, jnp.float32))
    rhs = cplx.random(jax.random.PRNGKey(7), d.field_shape, jnp.float32)

    def timed_solve(precond, max_iter):
        params = GCRParams(tol=args.tol, max_iter=max_iter, restart=5)
        solve = jax.jit(lambda a, b: gcr_solve(a, b, params, precond=precond))
        res = solve(a, rhs)
        float(res.final_relres)  # warm-up incl. first-sync stall
        t0 = time.perf_counter()
        res = solve(a, rhs)
        float(res.final_relres)
        dt = time.perf_counter() - t0
        r = rhs - a.apply(res.x)
        rel = float(jnp.sqrt(cplx.abs2_sum(r) / cplx.abs2_sum(rhs)))
        return {
            "converged": bool(res.converged),
            "iters": int(res.n_iters),
            "seconds": round(dt, 3),
            "indep_relres": rel,
        }

    out = {"lattice": args.lattice, "k": args.k, "tol": args.tol,
           "device": jax.devices()[0].device_kind}
    print(json.dumps({"phase": "plain", **out, **timed_solve(None, 2000)}), flush=True)

    t0 = time.perf_counter()
    mgp = setup_mg(
        jax.random.PRNGKey(3),
        a,
        mesh,
        MGParams(block=args.block, n_nullvecs=args.nullvecs),
        layout="tpu",
    )
    jax.block_until_ready(jax.tree_util.tree_leaves(mgp.coarse))
    setup_s = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "phase": "mg",
                **out,
                "setup_seconds": round(setup_s, 2),
                **timed_solve(mgp.apply, 500),
            }
        ),
        flush=True,
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
