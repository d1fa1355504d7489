"""Residual-trace artifacts.

The reference appends every per-iteration residual to a hardcoded
``../../data/out_data/convergence.txt`` — opened on every solve even with
verbose off (GCR.h:168, quirk Q9). Here the solver returns the history as
an array (SolveResult.res_history) and these helpers persist it: a .npz
with metadata, plus an optional reference-style plain-text column for easy
diffing against reference runs.
"""

from __future__ import annotations

import json
import os

import numpy as np


def save_residual_trace(
    path: str | os.PathLike,
    history,
    *,
    meta: dict | None = None,
    text_compat: bool = False,
) -> None:
    """Save a residual history. ``path`` ending in .txt (or text_compat)
    writes one residual per line like the reference's convergence.txt;
    otherwise a .npz with a JSON metadata blob."""
    h = np.asarray(history, dtype=np.float64)
    h = h[~np.isnan(h)]
    path = str(path)
    if text_compat or path.endswith(".txt"):
        with open(path, "w") as f:
            for v in h:
                f.write(f"{v:.16e}\n")
        return
    np.savez(path, history=h, meta=json.dumps(meta or {}))


def load_residual_trace(path: str | os.PathLike):
    """Returns (history, meta_dict)."""
    path = str(path)
    if path.endswith(".txt"):
        return np.loadtxt(path, ndmin=1), {}
    with np.load(path, allow_pickle=False) as z:
        meta = json.loads(str(z["meta"])) if "meta" in z else {}
        return z["history"], meta
