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


def _collect_level(mgp: MGPreconditioner, p: str, arrays: dict) -> dict:
    """Serialise one level's arrays under key prefix ``p``; returns meta."""
    is_cf = cplx.is_cf(mgp.q)
    if is_cf:
        arrays[p + "q_re"] = np.asarray(mgp.q.re)
        arrays[p + "q_im"] = np.asarray(mgp.q.im)
    else:
        arrays[p + "q"] = np.asarray(mgp.q)

    coarse = mgp.coarse
    extra = {}
    if isinstance(coarse, DenseOperator):
        coarse_kind = "dense"
        cdata = coarse.a
    elif isinstance(coarse, BlockSparseOperator):
        coarse_kind = "bsr"
        cdata = coarse.blocks
        arrays[p + "coarse_cols"] = np.asarray(coarse.block_cols)
    elif isinstance(coarse, StencilBlockOperator):
        coarse_kind = "stencil"
        cdata = coarse.blocks
        extra["coarse_dims"] = list(coarse.dims)
        extra["coarse_backend"] = coarse.backend
    else:
        raise TypeError(f"unsupported coarse operator {type(coarse)!r}")
    if cplx.is_cf(cdata):
        arrays[p + "coarse_re"] = np.asarray(cdata.re)
        arrays[p + "coarse_im"] = np.asarray(cdata.im)
    else:
        arrays[p + "coarse"] = np.asarray(cdata)

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
        cdata = cplx.CF(
            jnp.asarray(z[p + "coarse_re"]), jnp.asarray(z[p + "coarse_im"])
        )
    else:
        q = jnp.asarray(z[p + "q"])
        cdata = jnp.asarray(z[p + "coarse"])
    if meta["coarse_kind"] == "dense":
        coarse = DenseOperator(cdata)
    elif meta["coarse_kind"] == "stencil":
        coarse = StencilBlockOperator(
            cdata, tuple(meta["coarse_dims"]), meta["coarse_backend"]
        )
    else:
        coarse = BlockSparseOperator(cdata, jnp.asarray(z[p + "coarse_cols"]))
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
