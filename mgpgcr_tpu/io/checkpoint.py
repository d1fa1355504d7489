"""MG-setup checkpointing.

The adaptive-MG setup (near-null solves + Galerkin assembly) is the
expensive precompute of the whole pipeline (reference MG::initialise,
MG.h:132-285 — its only persistence is the parsed-CSR cache, SURVEY.md §5).
These helpers save/restore the setup products — the per-block prolongator
basis ``q`` and the Galerkin coarse operator — as a portable .npz, so a
solve session (or a restarted job) can skip setup entirely.

Both representations round-trip: complex128 arrays (flat layout) and split
re/im ``cplx.CF`` pairs (TPU layout).
"""

from __future__ import annotations

import dataclasses
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from mgpgcr_tpu import cplx
from mgpgcr_tpu.mesh import LatticeMesh
from mgpgcr_tpu.ops.blockstencil import StencilBlockOperator
from mgpgcr_tpu.ops.bsr import BlockSparseOperator
from mgpgcr_tpu.ops.dense import DenseOperator
from mgpgcr_tpu.solvers.mg import MGPreconditioner
from mgpgcr_tpu.solvers.params import GCRParams, MGParams

# bumped 1 -> 2 when the block basis layout changed from (nb, bl, ne) to
# (ne, nb, bl) (the ne-minor form pads ~11x under TPU tiling); version-1
# checkpoints are rejected rather than silently misinterpreted
_FORMAT_VERSION = 2


def _params_to_dict(p):
    if p is None:
        return None
    d = dataclasses.asdict(p)
    return d


def _gcr_from_dict(d):
    return GCRParams(**d) if d is not None else None


def _mg_params_from_dict(d) -> MGParams:
    d = dict(d)
    for key in ("setup_gcr", "coarse_gcr", "smoother_gcr"):
        d[key] = _gcr_from_dict(d.get(key))
    return MGParams(**d)


def _save_cdata(cdata, p: str, arrays: dict) -> None:
    if cplx.is_cf(cdata):
        arrays[p + "coarse_re"] = np.asarray(cdata.re)
        arrays[p + "coarse_im"] = np.asarray(cdata.im)
    else:
        arrays[p + "coarse"] = np.asarray(cdata)


def _load_cdata(z, p: str, meta: dict):
    if meta["cf"]:
        return cplx.CF(
            jnp.asarray(z[p + "coarse_re"]), jnp.asarray(z[p + "coarse_im"])
        )
    return jnp.asarray(z[p + "coarse"])


def _coarse_to_arrays(coarse, p: str, arrays: dict) -> tuple[str, dict]:
    """Serialise a (replicated) coarse operator; returns (kind, extra)."""
    extra = {}
    if isinstance(coarse, DenseOperator):
        kind, cdata = "dense", coarse.a
    elif isinstance(coarse, BlockSparseOperator):
        kind, cdata = "bsr", coarse.blocks
        arrays[p + "coarse_cols"] = np.asarray(coarse.block_cols)
    elif isinstance(coarse, StencilBlockOperator):
        kind, cdata = "stencil", coarse.blocks
        extra["coarse_dims"] = list(coarse.dims)
        extra["coarse_backend"] = coarse.backend
    else:
        raise TypeError(f"unsupported coarse operator {type(coarse)!r}")
    _save_cdata(cdata, p, arrays)
    return kind, extra


def _coarse_from_arrays(z, p: str, meta: dict):
    cdata = _load_cdata(z, p, meta)
    if meta["coarse_kind"] == "dense":
        return DenseOperator(cdata)
    if meta["coarse_kind"] == "stencil":
        return StencilBlockOperator(
            cdata, tuple(meta["coarse_dims"]), meta["coarse_backend"]
        )
    return BlockSparseOperator(cdata, jnp.asarray(z[p + "coarse_cols"]))


def _collect_level(mgp: MGPreconditioner, p: str, arrays: dict) -> dict:
    """Serialise one level's arrays under key prefix ``p``; returns meta."""
    is_cf = cplx.is_cf(mgp.q)
    if is_cf:
        arrays[p + "q_re"] = np.asarray(mgp.q.re)
        arrays[p + "q_im"] = np.asarray(mgp.q.im)
    else:
        arrays[p + "q"] = np.asarray(mgp.q)

    coarse_kind, extra = _coarse_to_arrays(mgp.coarse, p, arrays)

    return {
        "layout": mgp.layout,
        "cf": is_cf,
        "coarse_kind": coarse_kind,
        "mesh_dims": list(mgp.block_map.mesh.dims),
        "n_spacetime": mgp.block_map.mesh.n_spacetime,
        "block_dims": list(mgp.block_map.block_dims),
        "params": _params_to_dict(mgp.params),
        **extra,
    }


def save_mg_setup(path: str | os.PathLike, mgp: MGPreconditioner) -> None:
    """Persist every level of the (possibly multi-level) MG hierarchy."""
    arrays: dict[str, np.ndarray] = {}
    levels = []
    node = mgp
    i = 0
    while node is not None:
        levels.append(_collect_level(node, f"l{i}_", arrays))
        node = node.coarse_precond
        i += 1
    meta = {"version": _FORMAT_VERSION, "levels": levels}
    np.savez_compressed(path, meta=json.dumps(meta), **arrays)


def _load_level(z, p: str, meta: dict, a, coarse_precond) -> MGPreconditioner:
    mesh = LatticeMesh(tuple(meta["mesh_dims"]), meta["n_spacetime"])
    block_map = mesh.blocking(tuple(meta["block_dims"]))
    params = _mg_params_from_dict(meta["params"])
    if meta["cf"]:
        q = cplx.CF(jnp.asarray(z[p + "q_re"]), jnp.asarray(z[p + "q_im"]))
    else:
        q = jnp.asarray(z[p + "q"])
    coarse = _coarse_from_arrays(z, p, meta)
    q_field = None
    if meta["layout"] == "tpu":
        # derived, not stored: same bytes as q, pure relayout
        from mgpgcr_tpu.solvers.mg import field_basis

        q_field = jax.jit(lambda v: field_basis(v, block_map))(q)
    return MGPreconditioner(
        a=a,
        q=q,
        coarse=coarse,
        block_map=block_map,
        params=params,
        layout=meta["layout"],
        coarse_precond=coarse_precond,
        q_field=q_field,
    ), coarse


def load_mg_setup(path: str | os.PathLike, a) -> MGPreconditioner:
    """Rebuild the MG hierarchy around fine operator ``a``; each deeper
    level's fine operator is the previous level's coarse operator."""
    with np.load(path, allow_pickle=False) as z:
        meta = json.loads(str(z["meta"]))
        if meta["version"] != _FORMAT_VERSION:
            raise ValueError(f"unknown MG checkpoint version {meta['version']}")
        levels = meta["levels"]
        # rebuild coarse operators top-down, then preconditioners bottom-up
        built = []
        fine_op = a
        for i, lv in enumerate(levels):
            node, coarse = _load_level(z, f"l{i}_", lv, fine_op, None)
            built.append(node)
            fine_op = coarse
        result = None
        for node in reversed(built):
            result = dataclasses.replace(node, coarse_precond=result)
        return result


# ---------------------------------------------------------------------------
# sharded hierarchy (solvers/mg_dist.py ShardedMGPreconditioner)
# ---------------------------------------------------------------------------
def save_mg_setup_sharded(path: str | os.PathLike, smgp) -> None:
    """Persist a sharded MG hierarchy: the per-shard basis ``q5`` and the
    coarse level (shard-local stencil rows, or a replicated operator) are
    gathered to host arrays; the shard geometry is NOT stored — it is
    re-derived at load from the operator's device mesh, so a checkpoint
    restores onto any mesh with the same axis extents. Deeper replicated
    levels reuse the single-device level serialiser."""
    from mgpgcr_tpu.solvers.mg_dist import ShardLocalCoarseStencil

    arrays: dict[str, np.ndarray] = {}
    arrays["q5_re"] = np.asarray(smgp.q5.re)
    arrays["q5_im"] = np.asarray(smgp.q5.im)
    coarse = smgp.coarse
    if isinstance(coarse, ShardLocalCoarseStencil):
        coarse_kind, extra = "stencil_sharded", {}
        _save_cdata(coarse.blocks, "c_", arrays)
    else:
        coarse_kind, extra = _coarse_to_arrays(coarse, "c_", arrays)
    levels = []
    node = smgp.coarse_precond
    i = 0
    while node is not None:
        levels.append(_collect_level(node, f"l{i}_", arrays))
        node = node.coarse_precond
        i += 1
    meta = {
        "version": _FORMAT_VERSION,
        "sharded": True,
        "cf": True,
        "block": list(smgp.geom.block),
        "coarse_kind": coarse_kind,
        "params": _params_to_dict(smgp.params),
        "levels": levels,
        **extra,
    }
    np.savez_compressed(path, meta=json.dumps(meta), **arrays)


def load_mg_setup_sharded(path: str | os.PathLike, a):
    """Rebuild a ``ShardedMGPreconditioner`` around the sharded fine
    operator ``a`` (a ``DiracOperator`` over
    ``PallasWilsonDirac.build_sharded`` on the SAME-extent device mesh):
    q5 and shard-local stencil rows are placed back under their
    NamedShardings; replicated coarse operators and any deeper hierarchy
    load replicated."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from mgpgcr_tpu.solvers.mg_dist import (
        ShardedMGPreconditioner,
        ShardLocalCoarseStencil,
        _geometry,
        _unwrap,
    )

    with np.load(path, allow_pickle=False) as z:
        meta = json.loads(str(z["meta"]))
        if meta["version"] != _FORMAT_VERSION:
            raise ValueError(f"unknown MG checkpoint version {meta['version']}")
        if not meta.get("sharded"):
            raise ValueError(
                "not a sharded MG checkpoint (use load_mg_setup)"
            )
        params = _mg_params_from_dict(meta["params"])
        d, _k = _unwrap(a)
        geom = _geometry(d, params.block)
        dmesh = d.device_mesh

        def put(host_cf, spec):
            sh = NamedSharding(dmesh, spec)
            return cplx.CF(
                jax.device_put(jnp.asarray(host_cf.re), sh),
                jax.device_put(jnp.asarray(host_cf.im), sh),
            )

        q5_host = cplx.CF(z["q5_re"], z["q5_im"])
        q5 = put(q5_host, geom.q_spec())

        if meta["coarse_kind"] == "stencil_sharded":
            blocks = put(
                cplx.CF(z["c_coarse_re"], z["c_coarse_im"]),
                P(geom.axis_t, geom.axis_z),
            )
            coarse = ShardLocalCoarseStencil(blocks, geom)
        else:
            coarse = _coarse_from_arrays(z, "c_", meta)

        coarse_precond = None
        levels = meta.get("levels", [])
        if levels:
            built = []
            if meta["coarse_kind"] == "stencil_sharded":
                # the deeper (replicated) hierarchy's fine operator is the
                # REPLICATED twin of the shard-local stencil — same global
                # blocks, row-major (bt,bz,by,bx) order
                from mgpgcr_tpu.solvers.mg_dist import build_coarse_operator

                gbm = geom.mesh.blocking(geom.block)
                table = jnp.asarray(gbm.neighbor_table(), jnp.int32)
                ne_c = blocks.shape[-1]
                fine_op = build_coarse_operator(
                    blocks.reshape(geom.nb, 9, ne_c, ne_c),
                    table,
                    "stencil",
                    geom.bpd,
                )
            else:
                fine_op = coarse
            for i, lv in enumerate(levels):
                node, c = _load_level(z, f"l{i}_", lv, fine_op, None)
                built.append(node)
                fine_op = c
            for node in reversed(built):
                coarse_precond = dataclasses.replace(
                    node, coarse_precond=coarse_precond
                )
        return ShardedMGPreconditioner(
            a=a,
            q5=q5,
            coarse=coarse,
            geom=geom,
            params=params,
            coarse_precond=coarse_precond,
        )
