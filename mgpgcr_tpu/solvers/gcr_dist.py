"""Distributed GCR driver: the WHOLE solve inside one shard_map region.

Round-2 gap being closed: multi-chip solves previously ran the GSPMD-
propagated XLA slab stencil with unfused iteration algebra (~6x the fused
kernels' cost per iteration). Here the entire ``gcr_solve`` while_loop —
operator applies, K1/K2/K3 streaming kernels, direction stacks — runs on
per-device shards inside a single ``shard_map``:

- the operator is the ghost-plane streaming Pallas Dslash
  (ops/pallas/dslash_dist.py), whose halo exchange is the iteration's only
  large cross-device traffic (one (4,3,1,Z,V) plane per t/z hop);
- the fused GCR kernels (ops/pallas/gcr_kernels.py) are pure row-chunked
  streams, so they run unchanged on the local shard; their SMEM scalar
  outputs become global values via ``lax.psum`` (gcr.py ``_allsum``,
  enabled by ``axis_names``) — a few scalars per iteration;
- the while_loop carry's scalars (residual norms, alpha/beta numerators)
  are identical on every device by construction, so the loop control is
  coherent without further synchronisation.

This keeps per-device work IDENTICAL to the single-chip fused solver —
the weak-scaling unit is the round-2 headline kernel, not a fallback.

Reference cost anchor: the GCR iteration loop GCR.h:222-288 over the SpMV
Operator.h:331-346.
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import PartitionSpec as P

from mgpgcr_tpu.ops.dirac import DiracOperator
from mgpgcr_tpu.ops.pallas.dslash import PallasWilsonDirac
from mgpgcr_tpu.solvers.gcr import gcr_solve
from mgpgcr_tpu.solvers.params import GCRParams
from mgpgcr_tpu.solvers.result import SolveResult


def gcr_solve_sharded(
    a,
    rhs,
    params: GCRParams,
    precond=None,
    x0=None,
    fused: Optional[bool] = None,
) -> SolveResult:
    """Domain-decomposed GCR solve of ``a x = rhs``.

    ``a`` is a ``DiracOperator`` wrapping a device-mesh
    ``PallasWilsonDirac`` (``build_sharded``), or such an operator bare.
    ``rhs``/``x0`` are (4,3,T,Z,V) CF fields laid out per
    ``op.shard_field``. ``precond``, when given, must be a callable that
    is correct on LOCAL shards inside shard_map (its own reductions
    psummed over the same axes — e.g. a smoother built from this module).

    Returns a ``SolveResult`` whose ``x`` keeps the input sharding and
    whose scalars/history are replicated.
    """
    if isinstance(a, DiracOperator):
        d, k = a.d, a.k
    else:
        d, k = a, None
    if not isinstance(d, PallasWilsonDirac) or d.device_mesh is None:
        raise ValueError(
            "gcr_solve_sharded wants a PallasWilsonDirac built with "
            "build_sharded (device mesh attached)"
        )
    names = tuple(n for n in (d.axis_t, d.axis_z) if n is not None)
    fspec = d._field_spec()
    lspec = d._links_spec()

    args = [d.links, rhs]
    specs = [lspec, fspec]
    if k is not None:
        args.append(k)
        specs.append(P())
    if x0 is not None:
        args.append(x0)
        specs.append(fspec)

    def local_solve(*ops):
        from mgpgcr_tpu.ops.pallas.gcr_dslash_dist import ShardLocalWilsonDirac

        it = iter(ops)
        links = next(it)
        rhs_loc = next(it)
        k_loc = next(it) if k is not None else None
        x0_loc = next(it) if x0 is not None else None
        # a typed per-shard operator (not a bare closure) so gcr_solve can
        # recognise it and run iterations through the one-pass fused step
        # (ghost-plane r-update + Dslash + beta dots in one kernel)
        local = ShardLocalWilsonDirac(
            links,
            d.local_mesh(),
            d.axis_t,
            d._axis_size(d.axis_t),
            d.axis_z,
            d._axis_size(d.axis_z),
            d.anti_t,
            d.interpret,
        )
        a_loc = DiracOperator(local, k_loc) if k_loc is not None else local
        return gcr_solve(
            a_loc,
            rhs_loc,
            params,
            precond=precond,
            x0=x0_loc,
            fused=fused,
            axis_names=names,
        )

    out_specs = SolveResult(
        x=fspec, converged=P(), n_iters=P(), final_relres=P(),
        res_history=P(),
    )
    fn = jax.shard_map(
        local_solve,
        mesh=d.device_mesh,
        in_specs=tuple(specs),
        out_specs=out_specs,
        check_vma=False,  # pallas_call out_shapes carry no vma annotations
    )
    return fn(*args)
