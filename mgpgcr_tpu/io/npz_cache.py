"""TPU-friendly binary cache: ELL matrix as an .npz archive.

The reference caches parsed matrices as text ("parsed.txt", Parse.cpp:39-59)
so the slow .mtx parse can be skipped. The equivalent here is an npz of the
padded-ELL arrays — loads in milliseconds and feeds the device directly.
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from mgpgcr_tpu.ops.ell import ELLOperator


def save_ell_npz(path: str | os.PathLike, op: ELLOperator) -> None:
    np.savez_compressed(
        path,
        vals=np.asarray(op.vals),
        cols=np.asarray(op.cols),
        n_cols=np.asarray(op.n_cols),
    )


def load_ell_npz(path: str | os.PathLike, dtype=None) -> ELLOperator:
    with np.load(path) as z:
        vals = z["vals"]
        if dtype is not None:
            vals = vals.astype(dtype)
        return ELLOperator(
            jnp.asarray(vals), jnp.asarray(z["cols"]), int(z["n_cols"])
        )
