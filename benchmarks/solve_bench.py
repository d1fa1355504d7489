"""MG-GCR time-to-solution benchmark (single device).

The reference's headline experiment is iterations-to-tolerance near the
critical hopping parameter (main.cpp:834-875; SemesterProject.pdf §4.2
Fig. 1-2). This measures wall-clock and iterations for plain GCR vs
MG-preconditioned GCR on a synthetic Wilson-Dirac system, with the fused
Pallas Dslash on TPU (XLA slab path elsewhere). JSON-lines output.

With ``--refine-tol 1e-11`` a third phase runs mixed-precision iterative
refinement (solvers/refine.py): f32 MG-GCR solves on the accelerator,
complex128 residuals against the scipy-CSR ground-truth operator on the
host — the reference's tolerance regime (tol 1e-13, main.cpp:858) reached
with TPU arithmetic.

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
from mgpgcr_tpu.utils.profiling import (  # noqa: E402
    annotate,
    dslash_roofline,
    gcr_iteration_roofline,
)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--lattice", type=int, nargs=4, default=[16, 16, 16, 16])
    ap.add_argument("--k", type=float, default=0.125)
    ap.add_argument("--tol", type=float, default=1e-5)
    ap.add_argument("--block", type=int, default=4)
    ap.add_argument("--nullvecs", type=int, default=6)
    ap.add_argument("--platform", help="force jax platform")
    ap.add_argument(
        "--eager",
        action="store_true",
        help="host-orchestrated outer GCR (for sizes whose whole-solve "
        "jit exceeds compile limits, e.g. 32^4 MG)",
    )
    ap.add_argument(
        "--fused",
        action="store_true",
        help="fused Pallas K1/K2/K3 iteration algebra (jitted AND eager "
        "outer loops)",
    )
    ap.add_argument(
        "--check-every",
        dest="check_every",
        type=int,
        default=1,
        help="eager loop: fetch the convergence scalar every N iterations "
        "(batches tunnel round-trips; may overrun by N-1 iterations)",
    )
    ap.add_argument(
        "--refine-tol",
        type=float,
        help="also run mixed-precision refinement to this true complex128 "
        "relative residual (e.g. 1e-11)",
    )
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

    def timed_solve(precond, max_iter, phase):
        from mgpgcr_tpu.solvers.gcr import gcr_solve_eager

        params = GCRParams(
            tol=args.tol, max_iter=max_iter, restart=5, fused=args.fused
        )
        if args.eager:
            solve = lambda a, b: gcr_solve_eager(  # noqa: E731
                a, b, params, precond=precond, check_every=args.check_every
            )
        else:
            solve = jax.jit(lambda a, b: gcr_solve(a, b, params, precond=precond))
        with annotate(f"{phase}_warmup"):
            res = solve(a, rhs)
            float(res.final_relres)  # warm-up incl. first-sync stall
        with annotate(phase):
            t0 = time.perf_counter()
            res = solve(a, rhs)
            float(res.final_relres)
            dt = time.perf_counter() - t0
        r = rhs - a.apply(res.x)
        rel = float(jnp.sqrt(cplx.abs2_sum(r) / cplx.abs2_sum(rhs)))
        out = {
            "converged": bool(res.converged),
            "iters": int(res.n_iters),
            "seconds": round(dt, 3),
            "indep_relres": rel,
        }
        # archived roofline counters (utils/profiling.py): a measured bare
        # operator apply + the per-iteration estimate for this phase
        t0 = time.perf_counter()
        float(cplx.abs2_sum(a.apply(rhs)))
        dt_ap = time.perf_counter() - t0
        print(
            json.dumps({"phase": f"{phase}_roofline",
                        **dslash_roofline(mesh, dt_ap).asdict()}),
            flush=True,
        )
        if out["iters"]:
            per_it = out["seconds"] / out["iters"] - dt_ap
            # skip when the estimate is non-positive (tiny dispatch-bound
            # problems: a warm solve iteration can beat one cold apply)
            if per_it > 0:
                print(
                    json.dumps(
                        {"phase": f"{phase}_iter_roofline",
                         **gcr_iteration_roofline(mesh, per_it, 5).asdict()}
                    ),
                    flush=True,
                )
        return out

    out = {"lattice": args.lattice, "k": args.k, "tol": args.tol,
           "device": jax.devices()[0].device_kind}
    print(
        json.dumps({"phase": "plain", **out, **timed_solve(None, 2000, "plain")}),
        flush=True,
    )

    t0 = time.perf_counter()
    with annotate("mg_setup"):
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
                **timed_solve(mgp.apply, 500, "mg"),
            }
        ),
        flush=True,
    )

    if args.refine_tol:
        import numpy as np
        import scipy.sparse as sp

        from mgpgcr_tpu.ops.wilson import materialize_csr, random_links_np
        from mgpgcr_tpu.ops.wilson_tpu import field_from_tpu
        from mgpgcr_tpu.solvers.refine import wilson_refined_solve

        # ground-truth complex128 operator: the same seed-0 Haar links the
        # CF path uses (random_links_cf seeds numpy identically), as a
        # host scipy CSR matvec
        csr = materialize_csr(random_links_np(0, mesh), mesh)
        d_hi = sp.csr_matrix(
            (np.asarray(csr.data), np.asarray(csr.indices), np.asarray(csr.indptr)),
            shape=csr.shape,
        )
        apply_hi = lambda v: v - args.k * (d_hi @ v)  # noqa: E731
        rhs_np = np.asarray(
            cplx.to_numpy(field_from_tpu(rhs, mesh)), dtype=np.complex128
        )
        inner = GCRParams(tol=args.tol, max_iter=500, restart=5)
        # warm-up: solve_lo compiles on the first refinement round; do one
        # full refined solve untimed, then time the second
        for phase in ("refine_warmup", "refine"):
            t0 = time.perf_counter()
            rr = wilson_refined_solve(
                a, mesh, rhs_np, inner, apply_hi,
                precond=mgp.apply, tol=args.refine_tol,
            )
            dt = time.perf_counter() - t0
        print(
            json.dumps(
                {
                    "phase": "refine",
                    **out,
                    "refine_tol": args.refine_tol,
                    "converged": rr.converged,
                    "rounds": rr.n_refine,
                    "seconds": round(dt, 3),
                    "true_relres": rr.final_relres,
                }
            ),
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
