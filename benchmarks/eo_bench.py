"""Even-odd (Schur) vs full-system GCR: iterations and wall-clock.

The reference always solves the full system (GCR.h:159-302); even-odd
preconditioning is the standard Wilson-fermion trick this framework adds
(ops/eo.py, solvers/eo.py): solve S x_e = b'_e with S = I - k^2 D_eo D_oe
on half the sites, back-substitute the odd half. The Schur system is
better conditioned (spectrum ~ squared/contracted), so it takes fewer
iterations, each on half the volume.

Usage: python benchmarks/eo_bench.py [--lattice 8 8 8 8] [--k 0.125 ...]
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
from mgpgcr_tpu.ops.eo import EvenOddWilson  # noqa: E402
from mgpgcr_tpu.ops.wilson import random_links_cf  # noqa: E402
from mgpgcr_tpu.ops.wilson_tpu import TpuWilsonDirac  # noqa: E402
from mgpgcr_tpu.solvers.eo import eo_solve  # noqa: E402
from mgpgcr_tpu.solvers.gcr import gcr_solve  # noqa: E402
from mgpgcr_tpu.solvers.params import GCRParams  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--lattice", type=int, nargs=4, default=[8, 8, 8, 8])
    ap.add_argument("--k", type=float, nargs="+", default=[0.125])
    ap.add_argument("--tol", type=float, default=1e-5)
    ap.add_argument("--max-iter", type=int, default=2000)
    ap.add_argument("--restart", type=int, default=5)
    ap.add_argument("--platform", help="force jax platform")
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    mesh = LatticeMesh((*args.lattice, 4, 3))
    links = random_links_cf(0, mesh, jnp.float32)
    d = TpuWilsonDirac.build(links, mesh)
    eo = EvenOddWilson.from_full(d.links, mesh)
    rhs = cplx.random(jax.random.PRNGKey(7), d.field_shape, jnp.float32)
    params = GCRParams(tol=args.tol, max_iter=args.max_iter, restart=args.restart)

    def timed(fn, *fargs):
        res = fn(*fargs)
        float(res.final_relres)  # warm-up + first-sync
        t0 = time.perf_counter()
        res = fn(*fargs)
        float(res.final_relres)
        return res, time.perf_counter() - t0

    for k in args.k:
        a = DiracOperator(d, cplx.from_scalar(k, jnp.float32))
        full = jax.jit(lambda a, b: gcr_solve(a, b, params))
        res_f, dt_f = timed(full, a, rhs)
        r = rhs - a.apply(res_f.x)
        rel_f = float(jnp.sqrt(cplx.abs2_sum(r) / cplx.abs2_sum(rhs)))

        schur = jax.jit(
            lambda kk, b: eo_solve(eo, kk, b, params, mesh=mesh),
        )
        res_e, dt_e = timed(schur, cplx.from_scalar(k, jnp.float32), rhs)
        r = rhs - a.apply(res_e.x)
        rel_e = float(jnp.sqrt(cplx.abs2_sum(r) / cplx.abs2_sum(rhs)))

        print(
            json.dumps(
                {
                    "lattice": args.lattice,
                    "k": k,
                    "tol": args.tol,
                    "device": jax.devices()[0].device_kind,
                    "full": {
                        "iters": int(res_f.n_iters),
                        "seconds": round(dt_f, 4),
                        "indep_relres": rel_f,
                    },
                    "even_odd": {
                        "iters": int(res_e.n_iters),
                        "seconds": round(dt_e, 4),
                        "indep_relres": rel_e,
                    },
                }
            ),
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
