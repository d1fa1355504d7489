"""Generate a thermalised quenched SU(3) configuration on the TPU.

The round-4 blocker for the flagship 32^4 showdown was generation cost:
the complex heat bath is CPU-only (5+ h at 32^4). gauge_tpu.py runs the
same Cabibbo–Marinari / Kennedy–Pendleton sweeps as split re/im f32 on
the accelerator — minutes at 32^4. This driver adds the operational
wrapper: periodic plaquette prints, periodic npz checkpoints (a tunnel
drop costs at most ``--ckpt-every`` sweeps, not the whole run), and the
standard output format consumed by showdown/kc_signature --links-cache
(npz with re/im in the canonical (4, T, Z, Y, X, 3, 3) layout + beta).

    python benchmarks/gen_gauge.py --lattice 32 32 32 32 --beta 6.0 \
        --sweeps 120 --out data/links_32_b6.0_s0.npz
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from mgpgcr_tpu import cplx  # noqa: E402
from mgpgcr_tpu.gauge_tpu import (  # noqa: E402
    from_colour_major,
    plaquette_cf,
    sweep_cf,
    to_colour_major,
)
from mgpgcr_tpu.mesh import LatticeMesh  # noqa: E402
from mgpgcr_tpu.utils.retry import with_tunnel_retry  # noqa: E402


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--lattice", type=int, nargs=4, default=[16, 16, 16, 16],
                   metavar=("T", "Z", "Y", "X"))
    p.add_argument("--beta", type=float, default=6.0)
    p.add_argument("--sweeps", type=int, default=100)
    p.add_argument("--n-or", dest="n_or", type=int, default=3,
                   help="overrelaxation sweeps per heat-bath sweep")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--start", choices=["hot", "cold"], default="hot")
    p.add_argument("--out", required=True, help="output npz path")
    p.add_argument("--ckpt-every", dest="ckpt_every", type=int, default=20,
                   help="save a resumable checkpoint every N sweeps")
    p.add_argument("--measure-every", dest="measure_every", type=int, default=5)
    p.add_argument("--platform", help="force jax platform (cpu for testing)")
    return p.parse_args(argv)


def _save(path: str, links_cm, beta: float, sweeps_done: int, seed: int):
    canonical = from_colour_major(links_cm)
    tmp = path + ".tmp.npz"
    np.savez(
        tmp,
        re=np.asarray(canonical.re),
        im=np.asarray(canonical.im),
        beta=beta,
        sweeps=sweeps_done,
        seed=seed,
    )
    os.replace(tmp, path)


def main(argv=None) -> int:
    args = parse_args(argv)
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    mesh = LatticeMesh((*args.lattice, 4, 3))
    key = jax.random.PRNGKey(args.seed)
    base = {"lattice": args.lattice, "beta": args.beta, "seed": args.seed,
            "device": jax.devices()[0].device_kind}

    start_sweep = 0
    if os.path.exists(args.out):
        dat = np.load(args.out)
        if "sweeps" in dat and int(dat["sweeps"]) < args.sweeps:
            links = to_colour_major(
                cplx.CF(jnp.asarray(dat["re"]), jnp.asarray(dat["im"]))
            )
            start_sweep = int(dat["sweeps"])
            print(json.dumps({"phase": "resume", "from_sweep": start_sweep,
                              **base}), flush=True)
        else:
            print(json.dumps({"phase": "done", "already": True, **base}),
                  flush=True)
            return 0
    if start_sweep == 0:
        if args.start == "cold":
            st = mesh.spacetime_dims
            eye = jnp.broadcast_to(
                jnp.eye(3, jnp.float32)[:, :, None, None, None, None],
                (3, 3, *st),
            )
            links = cplx.CF(
                jnp.broadcast_to(eye, (4, 3, 3, *st)).astype(jnp.float32),
                jnp.zeros((4, 3, 3, *st), jnp.float32),
            )
        else:
            from mgpgcr_tpu.ops.wilson import random_links_np

            t0 = time.time()
            z = random_links_np(args.seed, mesh)
            links = to_colour_major(cplx.from_numpy(z, jnp.float32))
            print(json.dumps({"phase": "hot_start",
                              "seconds": round(time.time() - t0, 1), **base}),
                  flush=True)

    t_run = time.time()
    for s in range(start_sweep, args.sweeps):
        k = jax.random.fold_in(key, 1000 + s)
        t0 = time.time()
        links = with_tunnel_retry(
            lambda: sweep_cf(k, links, args.beta, args.n_or),
            label=f"sweep_{s}",
        )
        if (s + 1) % args.measure_every == 0 or s == args.sweeps - 1:
            p = float(with_tunnel_retry(
                lambda: plaquette_cf(links), label=f"plaq_{s}"
            ))
            print(json.dumps({"phase": "sweep", "n": s + 1,
                              "plaquette": round(p, 5),
                              "sweep_s": round(time.time() - t0, 2), **base}),
                  flush=True)
        if (s + 1) % args.ckpt_every == 0 and s + 1 < args.sweeps:
            _save(args.out, links, args.beta, s + 1, args.seed)
    _save(args.out, links, args.beta, args.sweeps, args.seed)
    p = float(plaquette_cf(links))
    print(json.dumps({"phase": "done", "plaquette": round(p, 5),
                      "sweeps": args.sweeps,
                      "total_s": round(time.time() - t_run, 1),
                      "out": args.out, **base}), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
