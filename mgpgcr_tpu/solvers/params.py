"""Solver configuration dataclasses.

Equivalent of the reference's ``SolverParam.h``: ``GCR_Param``
(SolverParam.h:22-35) and ``MG_Param`` (SolverParam.h:38-59), as frozen
(hashable, jit-static) dataclasses. Preconditioners are not stored here —
they are jittable callables passed to the solver, reproducing the
left/right ``Operator*`` hooks (SolverParam.h:13-14) functionally.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class GCRParams:
    """Flexible-GCR controls.

    restart: wipe stored directions every `restart` iterations (GCR.h:277-283).
    truncation: keep only the last `truncation` directions (ring buffer,
      GCR.h:286-287). Mutually exclusive with restart (asserted, GCR.h:165).
    Stopping: relative residual ||r||/||rhs|| <= tol, or max_iter.
    """

    tol: float = 1e-13
    max_iter: int = 100
    restart: int = 0
    truncation: int = 0
    # every N iterations, replace the recursively-updated residual with the
    # true r = rhs - A x (one extra operator application per N): in f32 the
    # recursion drifts from the true residual by ~1-2 orders near tol.
    # 0 = off (bit-compatible with the reference recursion, GCR.h:233).
    residual_refresh: int = 0
    # route the iteration algebra through the fused Pallas streaming
    # kernels (ops/pallas/gcr_kernels.py): split re/im (CF) fields only;
    # interpreter mode on non-TPU backends. Off for small/coarse solves
    # where kernel launches outweigh the traffic saved.
    fused: bool = False
    # Fused-path body form: "cycles" unrolls one whole restart cycle in
    # the trace (static slots/prefixes, z-basis, the one-pass mega step —
    # fastest, but the HLO contains R copies of everything inside the
    # loop, including a preconditioner's whole V-cycle); "loop" keeps the
    # dynamic single-iteration while_loop body (one V-cycle in the
    # program — compiles where the unrolled form exceeds remote-compile
    # size limits, e.g. whole-solve-jitted MG-GCR at 32^4). "auto":
    # cycles when unpreconditioned, loop when a preconditioner is set.
    unroll: str = "auto"

    def __post_init__(self):
        if self.restart and self.truncation:
            raise ValueError(
                "restart and truncation are mutually exclusive (GCR.h:165)"
            )

    @property
    def storage_size(self) -> int:
        if self.restart:
            return self.restart
        if self.truncation:
            return self.truncation
        return self.max_iter


@dataclass(frozen=True)
class MGParams:
    """Two-level adaptive MG controls (MG_Param, SolverParam.h:38-59).

    The reference's config of record (main.cpp:840-858): block 4^4,
    n_eigen=10 (doubled to 20), eigen GCR restart 10 / 10 iters / tol 1e-8,
    coarse GCR restart 10 / 50 iters / tol 1e-2, smoother off.
    """

    block: int = 4  # subblock_dim: spacetime block extent
    n_nullvecs: int = 10  # n_eigen before chiral doubling
    setup_gcr: GCRParams = field(
        default_factory=lambda: GCRParams(tol=1e-8, max_iter=10, restart=10)
    )
    setup_power_iters: int = 10  # inverse-power iterations for vec 0 (MG.h:101-105)
    coarse_gcr: GCRParams = field(
        default_factory=lambda: GCRParams(tol=1e-2, max_iter=50, restart=10)
    )
    # Default: V-cycle with a short GCR smoother. Measured on the 4^4
    # fixture at k=0.205 (near-critical): 45 outer iterations vs 1238
    # unpreconditioned vs 278 for smoother-less coarse deflation. Set to
    # None for the reference's smoother-off config (additive coarse-grid
    # deflation M = I + P C^-1 P^H is then used, see solvers/mg.py).
    # restart=4 with max_iter=4 is behaviourally identical to the old
    # truncation=4 default (neither wipe nor ring eviction triggers within
    # 4 iterations) but routes CF smooths through the fused cycle-unrolled
    # kernels (and the one-pass step when A is the streaming Pallas op)
    smoother_gcr: GCRParams | None = field(
        default_factory=lambda: GCRParams(
            tol=0.0, max_iter=4, restart=4, fused=True
        )
    )
    n_pre_smooth: int = 1
    n_post_smooth: int = 1
    # Smoother algorithm: "gcr" runs smoother_gcr as an inner solve
    # (adaptive, needs direction stacks + dots); "neumann" applies the
    # truncated hopping expansion x += sum_{i<terms} (kD)^i r — each term
    # is ONE fused Dslash pass ((kD)t = t - A t) with no reductions and
    # no stack traffic, the cheapest smoother the streaming kernel can
    # express. High-mode damping only (the series diverges on near-null
    # modes at k ~ k_c — exactly the components the coarse level owns).
    smoother: str = "gcr"
    smoother_terms: int = 4  # Neumann series length (incl. the i=0 term)
    coarse_format: str = "dense"  # "dense" (MXU matvec), "bsr" (block-ELL
    # batched einsum), or "stencil" (fused Pallas block-stencil SpMV over
    # the block lattice — for large coarse grids; phased assembly only)
    # Galerkin assembly strategy: "phased" activates every block column at
    # once with per-dimension root-of-unity phases and disentangles the
    # 9-point couplings from O(9) batched operator applications —
    # independent of the block count (requires a nearest-neighbour fine
    # operator, the same locality the reference's assembly hardcodes,
    # MG.h:206-278). "columns" sweeps block columns one at a time (no
    # locality assumption; O(n_blocks) applications).
    assembly: str = "phased"
    correction_damping: float = 1.0  # reference hardcodes 0.1 (MG.h:426, quirk Q2)
    # Levels: 2 = classic two-level (all the reference implements — its
    # n_level knob exists but recursive_solve was never written, MG.h:29,
    # 407). >2 recursively coarsens the *block lattice*: the coarse system
    # lives on (Bt,Bz,By,Bx) sites with ne internal dof whose chirality
    # structure survives orthonormalisation, so chiral doubling and
    # blocking apply again verbatim.
    n_level: int = 2
    coarse_block: int = 2  # spacetime block extent at levels >= 2
    # Grid-transfer execution (TPU layout only): "auto" streams restrict/
    # prolong through the Pallas transfer kernels (ops/pallas/transfer.py)
    # on TPU backends and falls back to the XLA reshape forms elsewhere;
    # "xla" / "pallas" force a path. The Pallas kernels fuse the additive
    # base of the correction (x += damping * P xc) into the prolong pass.
    transfer_backend: str = "auto"
    # Storage dtype for the field-shaped transfer basis q_field (None =
    # the solve dtype). The basis dominates transfer traffic (ne field
    # copies per pass); "bfloat16" halves it. Preconditioner-side rounding
    # only — the outer Krylov residual never touches the basis (same
    # rationale as bf16 gauge links for the smoother).
    transfer_dtype: str | None = None

    @property
    def n_coarse_per_block(self) -> int:
        """ne = 2 * n_eigen after chiral doubling (MG.h:146-149)."""
        return 2 * self.n_nullvecs
