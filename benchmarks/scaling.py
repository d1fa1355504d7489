"""Weak/strong scaling harness for the distributed Wilson-Dirac solve.

The BASELINE.md north star asks for nnz/s and iteration throughput at
1 chip / 1 host / N hosts with >=80% weak-scaling efficiency. This harness
measures exactly that on whatever devices are visible:

- real multi-chip TPU: run as-is (jax.distributed for multi-host);
- development: fake an N-device CPU mesh with
  XLA_FLAGS=--xla_force_host_platform_device_count=N JAX_PLATFORMS=cpu.

Weak scaling grows the lattice T-extent with the device count (constant
work per device); strong scaling fixes the global lattice. Results are
JSON lines: one per (mode, n_devices).

Usage:
  python benchmarks/scaling.py --mode weak --base-t 8 --lattice 8 8 8
  python benchmarks/scaling.py --mode strong --lattice 16 16 8 8
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
from mgpgcr_tpu.ops.wilson_tpu import TpuWilsonDirac  # noqa: E402
from mgpgcr_tpu.parallel import balanced_factors, make_lattice_device_mesh  # noqa: E402
from mgpgcr_tpu.solvers.gcr import gcr_solve  # noqa: E402
from mgpgcr_tpu.solvers.params import GCRParams  # noqa: E402


def measure(n_devices: int, dims: tuple[int, int, int, int], iters: int) -> dict:
    st, sz = balanced_factors(n_devices, 2)
    dmesh = make_lattice_device_mesh(n_devices, ("t", "z"), (st, sz))
    mesh = LatticeMesh((*dims, 4, 3))
    t, z, y, xx = dims
    assert t % st == 0 and z % sz == 0, (dims, (st, sz))

    from jax.sharding import NamedSharding

    links = cplx.random(jax.random.PRNGKey(0), (4, 3, 3, t, z, y * xx), jnp.float32)
    proto = TpuWilsonDirac(links, mesh, dmesh, "t", "z")
    links = jax.device_put(links, NamedSharding(dmesh, proto._links_spec()))
    d = TpuWilsonDirac(links, mesh, dmesh, "t", "z")
    a = DiracOperator(d, cplx.from_scalar(0.05, jnp.float32))
    rhs = d.shard_field(cplx.random(jax.random.PRNGKey(1), d.field_shape, jnp.float32))

    params = GCRParams(tol=0.0, max_iter=iters, restart=5)
    solve = jax.jit(lambda a, b: gcr_solve(a, b, params).x)
    out = solve(a, rhs)
    float(jnp.sum(out.re))  # warm-up + true sync
    t0 = time.perf_counter()
    out = solve(a, rhs)
    float(jnp.sum(out.re))
    dt = time.perf_counter() - t0

    sites = t * z * y * xx
    eff_nnz = 39 * 12 * sites
    return {
        "n_devices": n_devices,
        "mesh_axes": [st, sz],
        "lattice": list(dims),
        "iters": iters,
        "seconds": round(dt, 4),
        "iters_per_s": round(iters / dt, 2),
        "gnnz_per_s": round(eff_nnz * iters / dt / 1e9, 3),
    }


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
    ap.add_argument("--devices", type=int, nargs="*", default=None)
    ap.add_argument(
        "--platform",
        help="force jax platform (this environment pins a TPU platform; "
        "env vars alone are too late — cpu runs need --platform cpu)",
    )
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    n_avail = len(jax.devices())
    counts = args.devices or [n for n in (1, 2, 4, 8, 16, 32) if n <= n_avail]

    results = []
    for n in counts:
        if args.mode == "weak":
            z, y, xx = args.lattice[:3]
            st, sz = balanced_factors(n, 2)
            dims = (args.base_t * st, z * sz, y, xx)
        else:
            dims = tuple(args.lattice[:4])
        r = measure(n, dims, args.iters)
        r["mode"] = args.mode
        if results:
            base = results[0]
            if args.mode == "weak":
                r["efficiency"] = round(
                    (r["gnnz_per_s"] / r["n_devices"])
                    / (base["gnnz_per_s"] / base["n_devices"]),
                    4,
                )
            else:
                r["speedup"] = round(r["seconds"] and base["seconds"] / r["seconds"], 4)
        print(json.dumps(r), flush=True)
        results.append(r)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
