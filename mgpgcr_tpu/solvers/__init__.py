from mgpgcr_tpu.solvers.params import GCRParams, MGParams
from mgpgcr_tpu.solvers.result import SolveResult
from mgpgcr_tpu.solvers.gcr import gcr_solve, gcr_solve_eager, GCRSolver
from mgpgcr_tpu.solvers.power import inverse_power_vectors
from mgpgcr_tpu.solvers.mg import MGPreconditioner, setup_mg

__all__ = [
    "GCRParams",
    "MGParams",
    "SolveResult",
    "gcr_solve",
    "gcr_solve_eager",
    "GCRSolver",
    "inverse_power_vectors",
    "MGPreconditioner",
    "setup_mg",
]
