"""Weak/strong scaling harness for the distributed Wilson-Dirac solve.

The BASELINE.md north star asks for nnz/s and iteration throughput at
1 chip / 1 host / N hosts with >=80% weak-scaling efficiency. This harness
measures exactly that on whatever devices are visible:

- real multi-chip TPU: run as-is on each host (``--coordinator`` /
  MGPGCR_* env wires ``jax.distributed``; on TPU pods plain
  ``jax.distributed.initialize()`` auto-detects);
- development: fake an N-device CPU mesh with
  XLA_FLAGS=--xla_force_host_platform_device_count=N JAX_PLATFORMS=cpu,
  or run a REAL multi-process rendezvous on one machine with
  ``--launch N --devices-per-proc K`` (self-spawns N processes that meet
  at a localhost coordinator; collectives cross process boundaries).

Weak scaling grows the lattice T-extent with the device count (constant
work per device); strong scaling fixes the global lattice. Results are
JSON lines: one per (mode, n_devices); ``--output`` also writes them to a
file (rank 0 only).

Usage:
  python benchmarks/scaling.py --mode weak --base-t 8 --lattice 8 8 8
  python benchmarks/scaling.py --mode strong --lattice 16 16 8 8
  python benchmarks/scaling.py --launch 2 --devices-per-proc 4 --platform cpu
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _launch(args, argv: list[str]) -> int:
    """Spawn ``--launch N`` local processes that rendezvous over localhost.
    This validates the REAL jax.distributed multi-process path (gRPC
    coordinator, cross-process collectives) without pod hardware."""
    n, k = args.launch, args.devices_per_proc
    port = 18765 + (os.getpid() % 1000)
    coord = f"127.0.0.1:{port}"
    child_argv = [a for a in argv if not a.startswith("--launch")]
    # strip the flag values too
    cleaned, skip = [], False
    for a in argv:
        if skip:
            skip = False
            continue
        if a in ("--launch", "--devices-per-proc"):
            skip = True
            continue
        cleaned.append(a)
    child_argv = cleaned
    procs = []
    for pid in range(n):
        env = dict(os.environ)
        env["MGPGCR_COORDINATOR"] = coord
        env["MGPGCR_NUM_PROCESSES"] = str(n)
        env["MGPGCR_PROCESS_ID"] = str(pid)
        env["JAX_PLATFORMS"] = args.platform or "cpu"
        env["XLA_FLAGS"] = (
            env.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={k}"
        ).strip()
        out = None if pid == 0 else subprocess.DEVNULL
        procs.append(
            subprocess.Popen(
                [sys.executable, __file__, *child_argv], env=env, stdout=out
            )
        )
    rc = 0
    for p in procs:
        rc |= p.wait()
    return rc


def measure(
    n_devices: int,
    dims: tuple[int, int, int, int],
    iters: int,
    kernel: str = "pallas",
    solver: str = "plain",
    block: int = 2,
    nullvecs: int = 2,
    coarse_format: str = "stencil",
) -> dict:
    import dataclasses

    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding

    from mgpgcr_tpu import cplx
    from mgpgcr_tpu.mesh import LatticeMesh
    from mgpgcr_tpu.ops.dirac import DiracOperator
    from mgpgcr_tpu.ops.pallas.dslash import PallasWilsonDirac
    from mgpgcr_tpu.ops.wilson_tpu import TpuWilsonDirac
    from mgpgcr_tpu.parallel import balanced_factors, make_lattice_device_mesh
    from mgpgcr_tpu.solvers.gcr import gcr_solve
    from mgpgcr_tpu.solvers.gcr_dist import gcr_solve_sharded
    from mgpgcr_tpu.solvers.params import GCRParams

    st, sz = balanced_factors(n_devices, 2)
    dmesh = make_lattice_device_mesh(n_devices, ("t", "z"), (st, sz))
    mesh = LatticeMesh((*dims, 4, 3))
    t, z, y, xx = dims
    assert t % st == 0 and z % sz == 0, (dims, (st, sz))

    if kernel == "pallas":
        # the production path (round-3): ghost-plane streaming Pallas
        # Dslash + fused K1/K2/K3 iteration kernels, the WHOLE solve in
        # one shard_map region (solvers/gcr_dist.py) — per-device work is
        # the single-chip headline kernel, not the XLA slab fallback
        interpret = jax.devices()[0].platform != "tpu"
        proto = PallasWilsonDirac(
            cplx.CF(jnp.zeros(()), jnp.zeros(())),
            mesh, None, None, interpret, False, dmesh, "t", "z",
        )
    else:
        proto = TpuWilsonDirac(
            cplx.CF(
                jnp.zeros((4, 3, 3, t, z, y * xx), jnp.float32),
                jnp.zeros((4, 3, 3, t, z, y * xx), jnp.float32),
            ),
            mesh,
            dmesh,
            "t",
            "z",
        )
    links_shape = (
        (t, 4, 3, 3, z, y * xx)  # t-major: streaming-kernel layout
        if kernel == "pallas"
        else (4, 3, 3, t, z, y * xx)
    )
    # generate data ON DEVICE with explicit output shardings: correct and
    # identical across processes (multi-process runs cannot device_put a
    # host array onto non-addressable devices)
    links_sh = NamedSharding(dmesh, proto._links_spec())
    field_sh = NamedSharding(dmesh, proto._field_spec())
    gen_links = jax.jit(
        lambda: cplx.random(jax.random.PRNGKey(0), links_shape, jnp.float32),
        out_shardings=cplx.CF(links_sh, links_sh),
    )
    gen_field = jax.jit(
        lambda: cplx.random(jax.random.PRNGKey(1), (4, 3, t, z, y * xx), jnp.float32),
        out_shardings=cplx.CF(field_sh, field_sh),
    )
    d = dataclasses.replace(proto, links=gen_links())
    a = DiracOperator(d, cplx.from_scalar(0.05, jnp.float32))
    rhs = gen_field()

    params = GCRParams(tol=0.0, max_iter=iters, restart=5)
    mg_extra = {}
    if solver == "mg":
        # the round-4/5 distributed MG path: sharded setup, per-shard
        # V-cycle with the fused z-step outer iteration; coarse level
        # sharded (ShardLocalCoarseStencil) or replicated per
        # --coarse-format — the pair the MG_DIST_PHASES model compares
        assert kernel == "pallas", "--solver mg wants the pallas kernels"
        from mgpgcr_tpu.solvers.mg_dist import (
            mg_gcr_solve_sharded,
            setup_mg_sharded,
        )
        from mgpgcr_tpu.solvers.params import MGParams

        mgparams = MGParams(
            block=block,
            n_nullvecs=nullvecs,
            setup_power_iters=1,
            setup_gcr=GCRParams(tol=1e-4, max_iter=4, restart=4),
            coarse_gcr=GCRParams(tol=1e-2, max_iter=10, restart=10),
            smoother_gcr=GCRParams(tol=0.0, max_iter=2, restart=2),
            coarse_format=coarse_format,
        )
        t_setup = time.perf_counter()
        mgp = setup_mg_sharded(jax.random.PRNGKey(3), a, mgparams)
        jax.block_until_ready(jax.tree_util.tree_leaves(mgp.q5))
        mg_extra = {
            "solver": "mg",
            "coarse_format": coarse_format,
            "block": block,
            "ne": 2 * nullvecs,
            "setup_s": round(time.perf_counter() - t_setup, 2),
        }
        solve = jax.jit(lambda a_, b: mg_gcr_solve_sharded(b, params, mgp).x)
    elif kernel == "pallas":
        solve = jax.jit(
            lambda a, b: gcr_solve_sharded(a, b, params, fused=True).x
        )
    else:
        solve = jax.jit(lambda a, b: gcr_solve(a, b, params).x)
    def sync(o):
        # true-fetch sync: this tunneled TPU backend's block_until_ready
        # returns early; a scalar device->host fetch is the reliable barrier
        float(jnp.sum(jnp.asarray(o.re if hasattr(o, "re") else o)[0]))

    out = solve(a, rhs)
    sync(out)  # warm-up (compile) + sync
    t0 = time.perf_counter()
    out = solve(a, rhs)
    sync(out)
    dt = time.perf_counter() - t0

    sites = t * z * y * xx
    eff_nnz = 39 * 12 * sites
    rec = {
        "n_devices": n_devices,
        "n_processes": jax.process_count(),
        "kernel": kernel,
        "mesh_axes": [st, sz],
        "lattice": list(dims),
        "iters": iters,
        "seconds": round(dt, 4),
        "iters_per_s": round(iters / dt, 2),
        "gnnz_per_s": round(eff_nnz * iters / dt / 1e9, 3),
        **mg_extra,
    }
    if mg_extra:
        # join the measured row with the MG_DIST_PHASES byte/flop model
        # (same config): comm cost vs redundant-solve attribution per row
        try:
            from mg_dist_phases import analytic_model

            rec["model"] = analytic_model(
                dims, block, 2 * nullvecs, n_devices, 5, 10, 2,
            )
        except Exception as e:  # noqa: BLE001 — model join is best-effort
            rec["model_error"] = f"{type(e).__name__}: {e}"
    return rec


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["weak", "strong"], default="weak")
    ap.add_argument("--base-t", type=int, default=8, help="weak: per-device T extent")
    ap.add_argument(
        "--lattice",
        type=int,
        nargs="+",
        default=[8, 8, 8],
        help="weak: Z Y X (T grows); strong: T Z Y X (fixed)",
    )
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument(
        "--kernel",
        choices=["pallas", "xla"],
        default="pallas",
        help="pallas: distributed fused streaming kernels in one shard_map "
        "(the production path); xla: GSPMD slab-stencil fallback",
    )
    ap.add_argument("--solver", choices=["plain", "mg"], default="plain",
                    help="mg: distributed MG-GCR (sharded setup + per-"
                    "shard V-cycle; coarse level per --coarse-format) — "
                    "the round-4/5 kernels under scaling measurement")
    ap.add_argument("--coarse-format", default="stencil",
                    choices=["dense", "stencil"],
                    help="mg: sharded stencil coarse vs replicated dense")
    ap.add_argument("--block", type=int, default=2)
    ap.add_argument("--nullvecs", type=int, default=2)
    ap.add_argument("--devices", type=int, nargs="*", default=None)
    ap.add_argument("--output", help="also append JSON lines to this file (rank 0)")
    ap.add_argument(
        "--platform",
        help="force jax platform (this environment pins a TPU platform; "
        "env vars alone are too late — cpu runs need --platform cpu)",
    )
    # multi-process: explicit rendezvous flags, or --launch self-spawn
    ap.add_argument("--coordinator", help="host:port of rank-0 coordinator")
    ap.add_argument("--num-processes", type=int)
    ap.add_argument("--process-id", type=int)
    ap.add_argument(
        "--launch",
        type=int,
        help="self-spawn N local processes that rendezvous over localhost "
        "(CPU validation of the multi-host path)",
    )
    ap.add_argument("--devices-per-proc", type=int, default=4)
    args = ap.parse_args()

    if args.launch:
        return _launch(args, sys.argv[1:])

    import jax

    if args.platform:
        # must happen BEFORE jax.distributed.initialize: this box's
        # sitecustomize pins a TPU platform, and a child process meant to
        # rendezvous on CPU would otherwise grab the (single) TPU
        jax.config.update("jax_platforms", args.platform)

    from mgpgcr_tpu.parallel.dist import init_distributed, is_coordinator

    dist = init_distributed(
        coordinator=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id,
    )

    n_avail = len(jax.devices())
    if dist.is_multiprocess:
        # every process must join every collective: measure at the full
        # global device count only
        counts = [n_avail]
    else:
        counts = args.devices or [n for n in (1, 2, 4, 8, 16, 32) if n <= n_avail]

    results = []
    out_f = None
    if args.output and is_coordinator():
        out_f = open(args.output, "a")
    for n in counts:
        if args.mode == "weak":
            z, y, xx = args.lattice[:3]
            from mgpgcr_tpu.parallel import balanced_factors

            st, sz = balanced_factors(n, 2)
            dims = (args.base_t * st, z * sz, y, xx)
        else:
            dims = tuple(args.lattice[:4])
        r = measure(
            n, dims, args.iters, kernel=args.kernel, solver=args.solver,
            block=args.block, nullvecs=args.nullvecs,
            coarse_format=args.coarse_format,
        )
        r["mode"] = args.mode
        if results:
            base = results[0]
            if args.mode == "weak":
                r["efficiency"] = round(
                    (r["gnnz_per_s"] / r["n_devices"])
                    / (base["gnnz_per_s"] / base["n_devices"]),
                    4,
                )
                # On a VIRTUAL mesh (N forced host devices on one physical
                # CPU) per-device efficiency cannot exceed cores/N; the
                # meaningful number there is total-throughput retention:
                # ideal decomposition keeps total gnnz/s flat while the
                # problem is sharded, so any drop is decomposition +
                # collective overhead on constant silicon.
                r["throughput_retention"] = round(
                    r["gnnz_per_s"] / base["gnnz_per_s"], 4
                )
            else:
                r["speedup"] = round(r["seconds"] and base["seconds"] / r["seconds"], 4)
        if is_coordinator():
            print(json.dumps(r), flush=True)
            if out_f:
                out_f.write(json.dumps(r) + "\n")
                out_f.flush()
        results.append(r)
    if out_f:
        out_f.close()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
