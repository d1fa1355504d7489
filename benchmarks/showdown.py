"""MG-GCR vs plain GCR wall-clock showdown on one chip.

The reference's whole reason to exist is the combination MG.h:406-430
composed into GCR.h:222-288: near the critical hopping parameter plain
GCR stalls while MG-preconditioned GCR keeps near-constant iterations
(SemesterProject.pdf §4.2 Fig. 1). This driver measures the TPU-native
framework's version of that claim ON WALL-CLOCK at production sizes:
jitted plain fused GCR vs jitted (or eager) MG-GCR at the same true
residual, with every round-4 lever switchable — Pallas grid transfers,
bf16 transfer basis, deflation-only vs smoothed V-cycle, coarse format,
dynamic-loop vs cycle-unrolled outer body, and MG setup checkpointing so
k-sweeps re-use one setup.

JSON-lines output; one line per phase.

Usage:
  python benchmarks/showdown.py --lattice 32 32 32 32 --k 0.27 \
      --no-smoother --coarse-format stencil --transfer-dtype bfloat16 \
      --mg-ckpt /tmp/mg32.npz
"""

from __future__ import annotations

import argparse
import json
import os
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
from mgpgcr_tpu.ops.wilson_tpu import TpuWilsonDirac, with_link_dtype  # noqa: E402
from mgpgcr_tpu.solvers.gcr import gcr_solve, gcr_solve_eager  # noqa: E402
from mgpgcr_tpu.solvers.mg import setup_mg  # noqa: E402
from mgpgcr_tpu.solvers.params import GCRParams, MGParams  # noqa: E402
from mgpgcr_tpu.utils.retry import with_tunnel_retry  # noqa: E402


def parse_args(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--lattice", type=int, nargs=4, default=[16, 16, 16, 16])
    ap.add_argument("--k", type=float, nargs="+", default=[0.125])
    ap.add_argument("--tol", type=float, default=1e-5)
    ap.add_argument("--restart", type=int, default=5)
    ap.add_argument("--max-iter", type=int, default=4000)
    ap.add_argument("--mg-max-iter", type=int, default=500)
    ap.add_argument("--block", type=int, default=8)
    ap.add_argument("--nullvecs", type=int, default=6)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--setup-k", type=float, help="hopping parameter for the "
                    "MG setup solves (default: max of --k; one setup serves "
                    "the whole sweep — the near-null space varies slowly in k)")
    ap.add_argument("--no-smoother", action="store_true",
                    help="deflation-only M = I + P C^-1 P^H (the reference's "
                    "config of record, main.cpp:840-858)")
    ap.add_argument("--smoother-iters", type=int,
                    help="GCR smoother iterations per pre/post smooth "
                    "(default: MGParams default, 4); the smoother's Dslash "
                    "passes dominate the V-cycle at scale")
    ap.add_argument("--smoother-alg", choices=["gcr", "neumann"],
                    default="gcr",
                    help="neumann: truncated hopping expansion "
                    "x += sum (kD)^i r — one fused Dslash per term, no "
                    "dots/stacks (params.smoother)")
    ap.add_argument("--smoother-terms", type=int, default=4,
                    help="Neumann series length")
    ap.add_argument("--smoother-trunc", type=int,
                    help="smoother GCR truncation (stored directions). "
                    "1 = minimal-residual smoothing: no direction stack "
                    "traffic in K3 — the cheapest V-cycle smoother "
                    "(default: restart mode with the full window)")
    ap.add_argument("--coarse-max-iter", type=int,
                    help="coarse-solve GCR iteration cap (default 50)")
    ap.add_argument("--coarse-format", default="dense",
                    choices=["dense", "bsr", "stencil"])
    ap.add_argument("--transfer-dtype", default=None,
                    help="q_field storage dtype (e.g. bfloat16)")
    ap.add_argument("--unroll", default="auto",
                    choices=["auto", "cycles", "loop"])
    ap.add_argument("--eager-mg", action="store_true",
                    help="host-orchestrated MG-GCR outer loop instead of "
                    "whole-solve jit")
    ap.add_argument("--check-every", type=int, default=4)
    ap.add_argument("--mg-ckpt", help="MG setup checkpoint path (load if "
                    "present, else set up and save)")
    ap.add_argument("--skip-plain", action="store_true")
    ap.add_argument("--skip-mg", action="store_true")
    ap.add_argument("--smoother-dtype", default="bfloat16",
                    help="link storage dtype for the smoother-side operator")
    ap.add_argument("--repeats", type=int, default=2,
                    help="timed repeats per solve (min reported)")
    ap.add_argument("--beta", type=float,
                    help="use a quenched thermalised gauge configuration "
                    "at this beta (gauge.py heat-bath) instead of "
                    "Haar-random links — physically comparable to the "
                    "reference's conf5 Monte-Carlo matrices")
    ap.add_argument("--sweeps", type=int, default=80,
                    help="thermalisation sweeps for --beta")
    ap.add_argument("--links-cache",
                    help="npz path to save/load the gauge configuration "
                    "(re-used across k hunts and sweeps)")
    return ap.parse_args(argv)


def get_links(args, mesh) -> "cplx.CF":
    import numpy as np

    if args.links_cache and os.path.exists(args.links_cache):
        dat = np.load(args.links_cache)
        print(json.dumps({"phase": "links", "source": args.links_cache,
                          "beta": float(dat.get("beta", 0.0))}), flush=True)
        return cplx.CF(jnp.asarray(dat["re"]), jnp.asarray(dat["im"]))
    if args.beta is not None:
        t0 = time.time()
        if jax.devices()[0].platform == "cpu":
            # CPU: complex heat bath (exact complex128/64 path)
            from mgpgcr_tpu.gauge import thermalized_links

            links_c, hist = thermalized_links(
                args.seed, mesh, beta=args.beta, n_sweeps=args.sweeps,
                dtype=jnp.complex64,
            )
            links_np = np.asarray(links_c)
            links = cplx.CF(
                jnp.asarray(links_np.real, jnp.float32),
                jnp.asarray(links_np.imag, jnp.float32),
            )
            src = "heatbath_cpu"
        else:
            # accelerator: split re/im f32 sweeps on-device (gauge_tpu)
            # — minutes at 32^4 where the CPU path took hours
            from mgpgcr_tpu.gauge_tpu import thermalized_links_cf

            links, hist = thermalized_links_cf(
                args.seed, mesh, beta=args.beta, n_sweeps=args.sweeps,
            )
            src = "heatbath_tpu"
        print(json.dumps({"phase": "links", "source": src,
                          "beta": args.beta, "sweeps": args.sweeps,
                          "plaquette": [round(p, 4) for p in hist[-3:]],
                          "seconds": round(time.time() - t0, 1)}), flush=True)
        if args.links_cache:
            np.savez(args.links_cache, re=np.asarray(links.re),
                     im=np.asarray(links.im), beta=args.beta)
        return links
    return random_links_cf(args.seed, mesh, jnp.float32)


def true_relres(a, x, rhs) -> float:
    r = rhs - a.apply(x)
    return float(jnp.sqrt(cplx.abs2_sum(r) / cplx.abs2_sum(rhs)))


def main(argv=None) -> int:
    args = parse_args(argv)
    mesh = LatticeMesh((*args.lattice, 4, 3))
    on_tpu = jax.devices()[0].platform == "tpu"
    links = get_links(args, mesh)
    op_cls = PallasWilsonDirac if on_tpu else TpuWilsonDirac
    d = op_cls.build(links, mesh)
    rhs = cplx.random(jax.random.PRNGKey(7), d.field_shape, jnp.float32)
    base = {"lattice": args.lattice, "tol": args.tol,
            "device": jax.devices()[0].device_kind, "seed": args.seed}

    def a_at(k: float) -> DiracOperator:
        return DiracOperator(d, cplx.from_scalar(k, jnp.float32))

    def timed(solve, a, phase, k):
        def run():
            res = solve(a, rhs)
            float(res.final_relres)  # true sync (tunnel-safe)
            return res

        # warm-up: compile + first-sync stall; retried — a dropped
        # remote-compile here used to kill whole sweep rows (r4 32^4)
        res = with_tunnel_retry(run, label=f"{phase}_warmup_k{k}")
        best = float("inf")
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            res = with_tunnel_retry(run, label=f"{phase}_k{k}")
            best = min(best, time.perf_counter() - t0)
        rec = {
            "phase": phase, "k": k, **base,
            "converged": bool(res.converged),
            "iters": int(res.n_iters),
            "seconds": round(best, 4),
            "ms_per_iter": round(best / max(int(res.n_iters), 1) * 1e3, 3),
            "indep_relres": true_relres(a, res.x, rhs),
        }
        print(json.dumps(rec), flush=True)
        return rec

    plain_params = GCRParams(
        tol=args.tol, max_iter=args.max_iter, restart=args.restart,
        fused=on_tpu,
    )
    plain_solve = jax.jit(
        lambda a, b: gcr_solve(a, b, plain_params), static_argnames=()
    )

    mgp = None
    if not args.skip_mg:
        setup_k = args.setup_k if args.setup_k is not None else max(args.k)
        if args.no_smoother or args.smoother_iters == 0:
            smoother = None
        elif args.smoother_iters is not None or args.smoother_trunc is not None:
            its = (
                args.smoother_iters
                if args.smoother_iters is not None
                else MGParams().smoother_gcr.max_iter
            )
            if args.smoother_trunc is not None:
                smoother = GCRParams(
                    tol=0.0, max_iter=its,
                    truncation=min(args.smoother_trunc, its), fused=on_tpu,
                )
            else:
                smoother = GCRParams(
                    tol=0.0, max_iter=its, restart=its, fused=on_tpu,
                )
        else:
            smoother = MGParams().smoother_gcr
        coarse_gcr = MGParams().coarse_gcr
        if args.coarse_max_iter is not None:
            import dataclasses as _dc

            coarse_gcr = _dc.replace(
                coarse_gcr, max_iter=args.coarse_max_iter
            )
        mgparams = MGParams(
            block=args.block,
            n_nullvecs=args.nullvecs,
            smoother_gcr=smoother,
            smoother=args.smoother_alg,
            smoother_terms=args.smoother_terms,
            coarse_gcr=coarse_gcr,
            coarse_format=args.coarse_format,
            transfer_dtype=args.transfer_dtype,
        )
        a_setup = a_at(setup_k)
        smooth_op = None
        if not args.no_smoother and args.smoother_dtype and on_tpu:
            smooth_op = DiracOperator(
                with_link_dtype(d, jnp.dtype(args.smoother_dtype)),
                cplx.from_scalar(setup_k, jnp.float32),
            )
        if args.mg_ckpt and os.path.exists(args.mg_ckpt):
            from mgpgcr_tpu.io.checkpoint import load_mg_setup

            import dataclasses as _dc

            t0 = time.perf_counter()
            mgp = load_mg_setup(args.mg_ckpt, a_setup)
            # the checkpoint persists the SETUP products (basis + coarse
            # op); cycle knobs (smoother/coarse GCR) follow this run's
            # flags, not the saving run's — smoother experiments reuse
            # one expensive setup
            mgp = _dc.replace(
                mgp,
                params=_dc.replace(
                    mgp.params, smoother_gcr=smoother, coarse_gcr=coarse_gcr,
                    smoother=args.smoother_alg,
                    smoother_terms=args.smoother_terms,
                ),
            )
            if smooth_op is not None:
                mgp = _dc.replace(mgp, a_smooth=smooth_op)
            setup_s = time.perf_counter() - t0
            src = "checkpoint"
        else:
            t0 = time.perf_counter()

            def _do_setup():
                m = setup_mg(
                    jax.random.PRNGKey(3), a_setup, mesh, mgparams,
                    layout="tpu", smoother_operator=smooth_op,
                )
                jax.block_until_ready(jax.tree_util.tree_leaves(m.coarse))
                return m

            mgp = with_tunnel_retry(_do_setup, label="mg_setup")
            setup_s = time.perf_counter() - t0
            src = "setup"
            if args.mg_ckpt:
                from mgpgcr_tpu.io.checkpoint import save_mg_setup

                save_mg_setup(args.mg_ckpt, mgp)
        print(json.dumps({"phase": "mg_setup", "k_setup": setup_k,
                          "seconds": round(setup_s, 2), "source": src,
                          **base}), flush=True)

    import dataclasses

    mg_params = GCRParams(
        tol=args.tol, max_iter=args.mg_max_iter, restart=args.restart,
        fused=on_tpu, unroll=args.unroll,
    )

    # the preconditioner is a jit ARGUMENT (device buffers by reference):
    # closing over it bakes the basis/links into the HLO as constants and
    # the tunneled backend rejects the remote-compile request (HTTP 413).
    # One compile serves the whole k sweep (same shapes; k is a leaf).
    mg_jit = jax.jit(
        lambda a, m, b: gcr_solve(a, b, mg_params, precond=m.apply)
    )

    def mg_solve_for(k: float):
        # rebind the fine operator (and its k) into the loaded hierarchy;
        # the coarse space was built at setup_k (near-null spaces vary
        # slowly in k — the standard MG re-use across a k sweep). The
        # smoother-side operator must follow k too: left at setup_k it
        # smooths a DIFFERENT system (supercritical setup_k poisons every
        # sweep solve).
        a_k = a_at(k)
        a_sm = mgp.a_smooth
        if a_sm is not None:
            a_sm = dataclasses.replace(
                a_sm, k=cplx.from_scalar(k, jnp.float32)
            )
        mgp_k = dataclasses.replace(mgp, a=a_k, a_smooth=a_sm)
        if args.eager_mg:
            return a_k, lambda a, b: gcr_solve_eager(
                a, b, mg_params, precond=mgp_k.apply,
                check_every=args.check_every,
            )
        return a_k, lambda a, b: mg_jit(a, mgp_k, b)

    for k in args.k:
        if not args.skip_plain:
            timed(plain_solve, a_at(k), "plain", k)
        if mgp is not None:
            a_k, solve = mg_solve_for(k)
            timed(solve, a_k, "mg", k)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
