"""The reference's signature experiment at scale, on the TPU path.

SemesterProject.pdf §4.2 Fig. 1 / main.cpp:845-847 (k_critical_mg_precond):
sweep the hopping parameter k = kmin + j (k_c - kmin)/n toward the
configuration's own critical k_c and solve A x = rhs, A = I - kD, to
relative residual 1e-13. Plain GCR's iteration count diverges (and fails
outright at k_c); MG-preconditioned GCR stays ~flat — "decoupled from the
condition number".

TPU-native version of that result:
  - 1e-13 is reached by mixed-precision iterative refinement (the f32
    accelerator path solves corrections; the residual is recomputed in
    complex128 on the CPU backend — solvers/refine.py rationale). The
    iterations-to-tol metric is the SUM of inner f32 GCR iterations.
  - k_c is located on the actual gauge configuration by residual-stall
    bisection (plain f32 GCR converges below k_c, stalls above), since
    every configuration has its own k_c (reference: 4^4 0.20611, 8^4
    0.17865, main.cpp:699,845).
  - gauge links are either Haar-random or quenched-thermalised
    (--beta, gauge.py) — the latter is physically comparable to the
    reference's conf5 Monte-Carlo matrices.

One MG setup (at --setup-k, default k_c) serves the whole sweep; the fine
operator k is rebound per point. Inner solvers are jitted ONCE (k and the
preconditioner are pytree leaves/arguments, not closure constants).

Output: one JSON line per (k, solver) with total inner iterations,
refinement rounds, wall seconds, and the final complex128 residual.

Usage (8^4 thermalised, full signature):
  python benchmarks/kc_signature.py --lattice 8 8 8 8 --beta 6.0 \
      --links-cache /tmp/l8b6.npz --find-kc
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mgpgcr_tpu import cplx  # noqa: E402
from mgpgcr_tpu.mesh import LatticeMesh  # noqa: E402
from mgpgcr_tpu.ops.dirac import DiracOperator  # noqa: E402
from mgpgcr_tpu.ops.pallas.dslash import PallasWilsonDirac  # noqa: E402
from mgpgcr_tpu.ops.wilson import dirac_apply_np  # noqa: E402
from mgpgcr_tpu.ops.wilson_tpu import (  # noqa: E402
    TpuWilsonDirac,
    field_from_tpu,
    field_to_tpu,
)
from mgpgcr_tpu.solvers.gcr import gcr_solve  # noqa: E402
from mgpgcr_tpu.solvers.mg import setup_mg  # noqa: E402
from mgpgcr_tpu.solvers.params import GCRParams, MGParams  # noqa: E402
from mgpgcr_tpu.utils.retry import with_tunnel_retry  # noqa: E402

from showdown import get_links  # noqa: E402  (shared gauge-config loader)


def parse_args(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--lattice", type=int, nargs=4, default=[8, 8, 8, 8])
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--beta", type=float, help="thermalised links at this "
                    "beta (gauge.py heat-bath); default Haar-random")
    ap.add_argument("--sweeps", type=int, default=80)
    ap.add_argument("--links-cache")
    ap.add_argument("--tol", type=float, default=1e-13,
                    help="true complex128 relative-residual target "
                    "(reference: 1e-13, main.cpp:858)")
    ap.add_argument("--kc", type=float, help="known critical k (skip hunt)")
    ap.add_argument("--find-kc", action="store_true",
                    help="residual-stall bisection for this config's k_c")
    ap.add_argument("--kmin", type=float, default=0.05)
    ap.add_argument("--n-sweep", type=int, default=10,
                    help="sweep points kmin..k_c (reference: 10)")
    ap.add_argument("--setup-k", type=float,
                    help="MG setup hopping parameter (default: k_c)")
    ap.add_argument("--restart", type=int, default=5)
    ap.add_argument("--plain-cap", type=int, default=2000,
                    help="inner f32 iteration cap per refinement round")
    ap.add_argument("--mg-cap", type=int, default=300)
    ap.add_argument("--inner-tol", type=float, default=1e-5)
    ap.add_argument("--max-refine", type=int, default=30)
    ap.add_argument("--block", type=int, default=4)
    ap.add_argument("--nullvecs", type=int, default=10,
                    help="reference config of record: 10 (-> 20 chiral-"
                    "doubled), main.cpp:853")
    ap.add_argument("--coarse-format", default="dense",
                    choices=["dense", "bsr", "stencil"])
    ap.add_argument("--coarse-max-iter", type=int,
                    help="coarse GCR cap (default 50; 25 measured "
                    "wall-clock-optimal at 32^4 block 4 — "
                    "docs/EXPERIMENTS.md V-cycle cost anatomy)")
    ap.add_argument("--transfer-dtype", default=None)
    ap.add_argument("--no-smoother", action="store_true",
                    help="deflation-only V-cycle (default: smoothed — the "
                    "config of the proven parity tables, docs/EXPERIMENTS.md)")
    ap.add_argument("--mg-ckpt")
    ap.add_argument("--skip-plain", action="store_true")
    ap.add_argument("--skip-mg", action="store_true")
    return ap.parse_args(argv)


def main(argv=None) -> int:
    args = parse_args(argv)
    mesh = LatticeMesh((*args.lattice, 4, 3))
    on_tpu = jax.devices()[0].platform == "tpu"
    links = get_links(args, mesh)
    op_cls = PallasWilsonDirac if on_tpu else TpuWilsonDirac
    d_lo = op_cls.build(links, mesh)

    # complex128 ground-truth operator, pure host-side numpy (the
    # tunneled TPU has no complex support and flipping jax_enable_x64
    # mid-process breaks f32 Pallas tracing; one 8^4 apply is ~ms)
    links_hi = np.asarray(links.re, np.float64) + 1j * np.asarray(
        links.im, np.float64
    )

    rng = np.random.default_rng(7)
    n = mesh.size
    rhs_np = (rng.uniform(-1, 1, n) + 1j * rng.uniform(-1, 1, n)).astype(
        np.complex128
    )
    rhs_norm = float(np.linalg.norm(rhs_np))

    base = {"lattice": args.lattice, "device": jax.devices()[0].device_kind,
            "seed": args.seed, "beta": args.beta, "tol": args.tol}

    def a_lo_at(k: float) -> DiracOperator:
        return DiracOperator(d_lo, cplx.from_scalar(k, jnp.float32))

    def apply_hi(k: float, x: np.ndarray) -> np.ndarray:
        return dirac_apply_np(links_hi, mesh, x, k=k)

    # ---- k_c hunt: plain f32 GCR converges below k_c, stalls above ----
    hunt_params = GCRParams(
        tol=1e-4, max_iter=1500, restart=args.restart, fused=on_tpu
    )
    hunt_jit = jax.jit(lambda a, b: gcr_solve(a, b, hunt_params))
    rhs_cf = field_to_tpu(cplx.from_numpy(rhs_np / rhs_norm, jnp.float32), mesh)

    def hunt_converges(k: float) -> bool:
        res = with_tunnel_retry(
            lambda: hunt_jit(a_lo_at(k), rhs_cf), label=f"hunt_k{k:.4f}"
        )
        return bool(res.converged)

    kc = args.kc
    if kc is None and args.find_kc:
        t0 = time.time()
        lo, hi = args.kmin, 0.20
        while hunt_converges(hi):
            lo, hi = hi, hi * 1.3
        for _ in range(12):
            mid = 0.5 * (lo + hi)
            if hunt_converges(mid):
                lo = mid
            else:
                hi = mid
        kc = hi
        print(json.dumps({"phase": "kc_hunt", "kc": round(kc, 5),
                          "last_converging": round(lo, 5),
                          "cap": hunt_params.max_iter,
                          "seconds": round(time.time() - t0, 1), **base}),
              flush=True)
    if kc is None:
        raise SystemExit("need --kc or --find-kc")

    # ---- MG setup at setup_k (one hierarchy serves the sweep) ----------
    mgp = None
    if not args.skip_mg:
        setup_k = args.setup_k if args.setup_k is not None else kc
        coarse_gcr = MGParams().coarse_gcr
        if args.coarse_max_iter is not None:
            coarse_gcr = dataclasses.replace(
                coarse_gcr, max_iter=args.coarse_max_iter
            )
        mgparams = MGParams(
            block=args.block,
            n_nullvecs=args.nullvecs,
            smoother_gcr=None if args.no_smoother else MGParams().smoother_gcr,
            coarse_gcr=coarse_gcr,
            coarse_format=args.coarse_format,
            transfer_dtype=args.transfer_dtype,
        )
        if args.mg_ckpt and os.path.exists(args.mg_ckpt):
            from mgpgcr_tpu.io.checkpoint import load_mg_setup

            mgp = load_mg_setup(args.mg_ckpt, a_lo_at(setup_k))
            # cycle knobs follow this run's flags, not the saving run's
            mgp = dataclasses.replace(
                mgp,
                params=dataclasses.replace(
                    mgp.params,
                    coarse_gcr=mgparams.coarse_gcr,
                    smoother_gcr=mgparams.smoother_gcr,
                ),
            )
            src, setup_s = "checkpoint", 0.0
        else:
            t0 = time.time()

            def _do_setup():
                m = setup_mg(
                    jax.random.PRNGKey(3), a_lo_at(setup_k), mesh, mgparams,
                    layout="tpu",
                )
                jax.block_until_ready(jax.tree_util.tree_leaves(m.coarse))
                return m

            mgp = with_tunnel_retry(_do_setup, label="mg_setup")
            setup_s = time.time() - t0
            src = "setup"
            if args.mg_ckpt:
                from mgpgcr_tpu.io.checkpoint import save_mg_setup

                save_mg_setup(args.mg_ckpt, mgp)
        print(json.dumps({"phase": "mg_setup", "k_setup": setup_k,
                          "seconds": round(setup_s, 2), "source": src,
                          "nullvecs": args.nullvecs, "block": args.block,
                          **base}), flush=True)

    # ---- jitted-once inner solvers ------------------------------------
    plain_params = GCRParams(
        tol=args.inner_tol, max_iter=args.plain_cap, restart=args.restart,
        fused=on_tpu,
    )
    mg_params = GCRParams(
        tol=args.inner_tol, max_iter=args.mg_cap, restart=args.restart,
        fused=on_tpu, unroll="loop",
    )
    plain_jit = jax.jit(lambda a, b: gcr_solve(a, b, plain_params))
    mg_jit = jax.jit(lambda a, m, b: gcr_solve(a, b, mg_params, precond=m.apply))

    def refined(k: float, use_mg: bool) -> dict:
        """Classical iterative refinement to args.tol in complex128."""
        a_k = a_lo_at(k)
        mgp_k = dataclasses.replace(mgp, a=a_k) if use_mg else None
        x = np.zeros_like(rhs_np)
        r = rhs_np.copy()
        iters, hist = [], [1.0]
        t0 = time.time()
        for _ in range(args.max_refine):
            scale = np.max(np.abs(r)) or 1.0
            r_cf = field_to_tpu(cplx.from_numpy(r / scale, jnp.float32), mesh)
            res = with_tunnel_retry(
                lambda: (
                    mg_jit(a_k, mgp_k, r_cf)
                    if use_mg
                    else plain_jit(a_k, r_cf)
                ),
                label=f"refine_{'mg' if use_mg else 'plain'}_k{k:.4f}",
            )
            iters.append(int(res.n_iters))
            dx = cplx.to_numpy(field_from_tpu(res.x, mesh)) * scale
            x = x + dx
            r = rhs_np - apply_hi(k, x)
            rel = float(np.linalg.norm(r) / rhs_norm)
            hist.append(rel)
            if rel <= args.tol:
                break
            if len(hist) >= 3 and rel > 0.5 * hist[-2]:
                break  # stagnation: inner solver no longer contracting
        return {
            "phase": "mg" if use_mg else "plain",
            "k": round(k, 5),
            "converged": hist[-1] <= args.tol,
            "total_inner_iters": int(sum(iters)),
            "inner_iters": iters,
            "n_refine": len(iters),
            "final_relres": hist[-1],
            "seconds": round(time.time() - t0, 2),
            **base,
        }

    ks = [
        args.kmin + j * (kc - args.kmin) / args.n_sweep
        for j in range(1, args.n_sweep + 1)
    ]
    for k in ks:
        if not args.skip_plain:
            print(json.dumps(refined(k, use_mg=False)), flush=True)
        if mgp is not None:
            print(json.dumps(refined(k, use_mg=True)), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
