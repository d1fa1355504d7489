"""Run configuration: dataclasses + JSON/TOML files + CLI overlay.

The reference has no config system — experiments are chosen by editing
``main()`` and recompiling (main.cpp:29-57; SURVEY.md §5). Here a run is a
``RunConfig`` that can be built from a JSON or TOML file and/or CLI flags,
and maps directly onto the solver parameter dataclasses
(solvers/params.py).
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Optional

from mgpgcr_tpu.solvers.params import GCRParams, MGParams


@dataclass(frozen=True)
class ProblemConfig:
    """What system to solve: an ingested matrix or a synthetic lattice."""

    matrix: Optional[str] = None  # parsed.txt / .mtx / .npz path
    lattice: tuple[int, ...] = ()  # synthetic Wilson-Dirac spacetime dims
    k: float = 0.1  # hopping parameter in A = I - kD
    seed: int = 0
    dtype: str = "complex128"  # complex128 | complex64 | cf32 | cf64
    antiperiodic: bool = False  # anti-periodic temporal BC (synthetic only)
    compress: bool = True  # two-row SU(3) link storage on the TPU
    # streaming path (exact reconstruction; the production default —
    # bench.py's same-precision headline config). Auto-disabled for --eo
    # (the parity split wants full 3-row links).
    detect: bool = True  # factorise ingested Wilson matrices back into
    # links + projectors (ops/ingest.py) and route the solve through the
    # streaming stencil kernels; falls back to the generic ingested
    # formats when the matrix does not verify (cf dtypes only)


@dataclass(frozen=True)
class RunConfig:
    problem: ProblemConfig = field(default_factory=ProblemConfig)
    gcr: GCRParams = field(default_factory=lambda: GCRParams(tol=1e-11, max_iter=4000, restart=5))
    mg: Optional[MGParams] = None  # None = unpreconditioned
    eager: bool = False  # host-orchestrated outer loop (gcr_solve_eager):
    # for problem sizes whose whole-solve jit is too large to compile
    eo: bool = False  # even-odd (Schur) reduction: solve S x_e = b'_e on
    # the even sites, back-substitute the odd half (solvers/eo.py);
    # lattice cf problems only. With mg set, the MG hierarchy is built
    # over the Schur operator (setup_eo_mg)
    trace: Optional[str] = None  # residual trace artifact path
    log: Optional[str] = None  # JSON-lines run log path


def _dataclass_from_dict(cls, d: dict):
    if d is None:
        return None
    kwargs = {}
    for f in dataclasses.fields(cls):
        if f.name not in d:
            continue
        v = d[f.name]
        if f.name == "problem":
            v = _dataclass_from_dict(ProblemConfig, v)
        elif f.name == "gcr" or f.name in ("setup_gcr", "coarse_gcr", "smoother_gcr"):
            v = _dataclass_from_dict(GCRParams, v) if v is not None else None
        elif f.name == "mg":
            v = _dataclass_from_dict(MGParams, v) if v is not None else None
        elif f.name == "lattice":
            v = tuple(v)
        kwargs[f.name] = v
    return cls(**kwargs)


def _to_dict(obj):
    if dataclasses.is_dataclass(obj):
        return {
            f.name: _to_dict(getattr(obj, f.name)) for f in dataclasses.fields(obj)
        }
    if isinstance(obj, (list, tuple)):
        return list(obj)
    return obj


def config_to_dict(cfg: RunConfig) -> dict:
    return _to_dict(cfg)


def config_from_dict(d: dict) -> RunConfig:
    return _dataclass_from_dict(RunConfig, d)


def load_config(path: str) -> RunConfig:
    """JSON (.json) or TOML (.toml) run config."""
    if path.endswith(".toml"):
        import tomllib

        with open(path, "rb") as f:
            return config_from_dict(tomllib.load(f))
    with open(path) as f:
        return config_from_dict(json.load(f))


def save_config(path: str, cfg: RunConfig) -> None:
    with open(path, "w") as f:
        json.dump(config_to_dict(cfg), f, indent=2)
