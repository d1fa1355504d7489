"""Distributed MG-GCR per-phase cost breakdown + communication model.

Quantifies the coarse level's share of one distributed MG-GCR iteration
(the Amdahl term of the replicated-coarse design) and the effect of the
sharded-coarse mitigation (solvers/mg_dist.py ShardLocalCoarseStencil):

1. ANALYTIC per-iteration model from shapes alone — exact byte / flop
   counts, no timing noise, valid for any device count without hardware:
   - fine-level flops (Dslash applies: outer + smoother) and HBM bytes,
   - halo traffic per iteration (ghost planes per Dslash apply),
   - psum count (fused GCR scalars + smoother + coarse dots),
   - coarse all_gather bytes (replicated design) vs ppermute ghost bytes
     (sharded design),
   - coarse-solve flops: REDUNDANT x ndev when replicated, 1/ndev each
     when sharded.
2. MEASURED wall-clock phase shares on the faked device mesh (one jitted
   program per phase). On the CPU mesh the Pallas fine kernels run in
   interpreter mode, which inflates fine-level times by orders of
   magnitude — the measured numbers are for RELATIVE comparison of the
   coarse-phase variants only; the analytic model is the headline.

Reference hot loop being scaled: the coarse-level block SpMV
HierarchicalSparse.h:102-161 inside MG::solve MG.h:406-430.

Usage (faked 8-device mesh):
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python benchmarks/mg_dist_phases.py --lattice 8 8 8 8 --block 4
"""

from __future__ import annotations

import argparse
import json
import math
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def parse_args(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--lattice", type=int, nargs=4, default=[8, 8, 8, 8])
    ap.add_argument("--block", type=int, default=4)
    ap.add_argument("--nullvecs", type=int, default=4)
    ap.add_argument("--axes", nargs="+", default=["t", "z"])
    ap.add_argument("--sizes", type=int, nargs="+", default=[4, 2])
    ap.add_argument("--restart", type=int, default=5)
    ap.add_argument("--coarse-iters", type=int, default=20)
    ap.add_argument("--smoother-iters", type=int, default=2)
    ap.add_argument("--k", type=float, default=0.12)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--out", default="MG_DIST_PHASES.json")
    ap.add_argument("--platform", help="force jax platform (this box pins "
                    "a TPU platform via env, so env vars alone are too "
                    "late — pass --platform cpu for the faked mesh)")
    ap.add_argument("--model-only", action="store_true",
                    help="emit the analytic model without building the "
                    "sharded hierarchy (any lattice/device count — e.g. "
                    "the 32^4 production config on 8/32/256 chips)")
    return ap.parse_args(argv)


def analytic_model(dims, block, ne, ndev, restart, coarse_iters,
                   smoother_iters, itemsize=4):
    """Exact per-outer-iteration byte/flop counts from shapes.

    Counts complex values as 2 reals of ``itemsize`` bytes. Fine Dslash
    flop model: 8 hops x (su3 matvec 66 + projector/accum ~24) per site
    x 4 spinors-halved = 1320 flops/site (the standard Wilson count);
    coarse stencil: 9 blocks x ne^2 complex MACs = 9*8*ne^2 flops/row.
    """
    v = math.prod(dims)
    field_b = v * 12 * 2 * itemsize  # one (4,3,lattice) complex field
    nb = math.prod(d // block for d in dims)
    nc = nb * ne

    # per-device fine shard (t,z decomposition assumed over first axes)
    v_loc = v // ndev
    field_loc_b = field_b // ndev

    # ---- fine level, per outer iteration ----
    dslash_flops = 1320 * v
    n_fine_applies = 1 + 2 * smoother_iters  # A z + smoother residuals/applies
    smoother_inner_applies = smoother_iters * 2  # GCR(2) ~ 2 applies each
    fine_applies = n_fine_applies + smoother_inner_applies
    fine_flops = fine_applies * dslash_flops

    # halo ghosts: 3-axis T x Z x Y decomposition sends 2 ghost planes per
    # sharded axis per apply; plane = field / extent of that axis
    t, z, y, xx = dims
    halo_b = 0
    if ndev > 1:
        # assume (t, z) mesh axes (the production layout)
        halo_b = fine_applies * 2 * (field_b // t + field_b // z)

    # psums per iteration: fused GCR ~4 scalars + smoother dots
    psums = 4 + smoother_iters * 4

    # ---- coarse level, per outer iteration ----
    coarse_row_flops = 9 * 8 * ne * ne
    coarse_apply_flops = nb * coarse_row_flops
    # coarse GCR: ~1 apply + ~10 vector ops of length nc per iteration
    coarse_solve_flops = coarse_iters * (coarse_apply_flops + 10 * 8 * nc)
    coarse_vec_b = nc * 2 * itemsize

    replicated = {
        "all_gather_bytes_per_vcycle": coarse_vec_b * (ndev - 1) // ndev,
        "coarse_flops_total_fleet": coarse_solve_flops * ndev,  # redundant
        "coarse_flops_critical_path": coarse_solve_flops,
        "coarse_psums": 0,
    }
    sharded = {
        "all_gather_bytes_per_vcycle": 0,
        # each coarse stencil apply ppermutes 2 ghost block-planes per
        # sharded axis; coarse field plane = coarse_vec / blocks-per-axis
        "ppermute_bytes_per_vcycle": coarse_iters
        * 2
        * (coarse_vec_b // (t // block) + coarse_vec_b // (z // block)),
        "coarse_flops_total_fleet": coarse_solve_flops,  # split over ndev
        "coarse_flops_critical_path": coarse_solve_flops // ndev,
        "coarse_psums": coarse_iters * 4,
    }
    total_crit_repl = fine_flops // ndev + replicated["coarse_flops_critical_path"]
    total_crit_shard = fine_flops // ndev + sharded["coarse_flops_critical_path"]
    return {
        "dims": list(dims),
        "ndev": ndev,
        "nb": nb,
        "ne": ne,
        "nc": nc,
        "fine_flops_per_iter": fine_flops,
        "fine_applies_per_iter": fine_applies,
        "halo_bytes_per_iter": halo_b,
        "outer_psums_per_iter": psums,
        "coarse_solve_flops_per_vcycle": coarse_solve_flops,
        "replicated": replicated,
        "sharded": sharded,
        "coarse_fraction_of_critical_path": {
            "replicated": replicated["coarse_flops_critical_path"]
            / total_crit_repl,
            "sharded": sharded["coarse_flops_critical_path"]
            / total_crit_shard,
        },
    }


def main(argv=None) -> int:
    args = parse_args(argv)
    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from mgpgcr_tpu import cplx
    from mgpgcr_tpu.mesh import LatticeMesh
    from mgpgcr_tpu.ops.dirac import DiracOperator
    from mgpgcr_tpu.ops.pallas.dslash import PallasWilsonDirac
    from mgpgcr_tpu.ops.wilson import random_links_cf
    from mgpgcr_tpu.parallel import make_lattice_device_mesh
    from mgpgcr_tpu.solvers.mg_dist import (
        mg_gcr_solve_sharded,
        setup_mg_sharded,
    )
    from mgpgcr_tpu.solvers.params import GCRParams, MGParams

    dims = tuple(args.lattice)
    mesh = LatticeMesh((*dims, 4, 3))
    ndev = int(np.prod(args.sizes))
    ne = 2 * args.nullvecs
    model = analytic_model(
        dims, args.block, ne, ndev, args.restart, args.coarse_iters,
        args.smoother_iters,
    )
    print(json.dumps({"phase": "model", **model}), flush=True)
    if args.model_only:
        return 0

    interpret = jax.default_backend() != "tpu"
    dmesh = make_lattice_device_mesh(
        ndev, axis_names=tuple(args.axes), axis_sizes=tuple(args.sizes)
    )
    links = random_links_cf(0, mesh, jnp.float32)
    kw = dict(
        axis_t="t" if "t" in args.axes else None,
        axis_z="z" if "z" in args.axes else None,
    )
    d = PallasWilsonDirac.build_sharded(
        links, mesh, dmesh, interpret=interpret, **kw
    )
    a = DiracOperator(d, cplx.from_scalar(args.k, jnp.float32))
    base_mg = dict(
        block=args.block,
        n_nullvecs=args.nullvecs,
        setup_power_iters=3,
        setup_gcr=GCRParams(tol=1e-6, max_iter=6, restart=6),
        coarse_gcr=GCRParams(
            tol=1e-2, max_iter=args.coarse_iters, restart=10
        ),
        smoother_gcr=GCRParams(
            tol=0.0, max_iter=args.smoother_iters, restart=args.smoother_iters
        )
        if args.smoother_iters
        else None,
    )


    t_lat, z_lat, y, xx = dims
    rhs = cplx.random(jax.random.PRNGKey(7), (4, 3, t_lat, z_lat, y * xx), jnp.float32)
    rhs_sh = d.shard_field(rhs)
    gp = GCRParams(tol=1e-6, max_iter=30, restart=args.restart)

    def timed(fn, *fa):
        out = fn(*fa)
        jax.block_until_ready(jax.tree_util.tree_leaves(out))
        best = float("inf")
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            out = fn(*fa)
            jax.block_until_ready(jax.tree_util.tree_leaves(out))
            best = min(best, time.perf_counter() - t0)
        return best

    measured = {}
    for fmt in ("dense", "stencil"):
        mgp = setup_mg_sharded(
            jax.random.PRNGKey(3), a, MGParams(**base_mg, coarse_format=fmt)
        )
        t_vcycle = timed(jax.jit(mgp.apply), rhs_sh)
        solve = jax.jit(lambda r, m=mgp: mg_gcr_solve_sharded(r, gp, m))
        res = solve(rhs_sh)
        t_solve = timed(solve, rhs_sh)
        iters = max(int(res.n_iters), 1)
        measured[fmt] = {
            "coarse": "replicated+all_gather" if fmt == "dense" else
            "sharded (ShardLocalCoarseStencil)",
            "vcycle_s": round(t_vcycle, 4),
            "solve_s": round(t_solve, 4),
            "iters": iters,
            "ms_per_outer_iter": round(t_solve / iters * 1e3, 2),
            "converged": bool(res.converged),
        }
        print(json.dumps({"phase": f"measured_{fmt}", **measured[fmt]}),
              flush=True)

    artifact = {
        "note": "measured on interpret-mode CPU mesh unless device=tpu — "
        "relative coarse-variant comparison only; model is the headline",
        "device": jax.devices()[0].device_kind,
        "model": model,
        "measured": measured,
    }
    with open(args.out, "w") as f:
        json.dump(artifact, f, indent=1)
    print(json.dumps({"phase": "done", "out": args.out}), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
