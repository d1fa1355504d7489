"""Typed solve results.

The reference reports convergence by printf and a hardcoded trace file
(GCR.h:213-216, 270-274, 293-296; quirk Q9). Here every solve returns a
pytree carrying the solution, a converged flag, the iteration count, and the
full relative-residual history as an array (NaN-padded past the final
iteration) — jit-friendly and directly plottable.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class SolveResult:
    x: jnp.ndarray
    converged: jnp.ndarray  # bool scalar
    n_iters: jnp.ndarray  # int32 scalar
    final_relres: jnp.ndarray  # real scalar
    res_history: jnp.ndarray  # (max_iter + 1,) relative residuals, NaN padded

    def history_list(self) -> list[float]:
        """Finite prefix of the residual history (host-side convenience)."""
        import numpy as np

        h = np.asarray(self.res_history)
        return h[~np.isnan(h)].tolist()


jax.tree_util.register_dataclass(
    SolveResult,
    data_fields=["x", "converged", "n_iters", "final_relres", "res_history"],
    meta_fields=[],
)
