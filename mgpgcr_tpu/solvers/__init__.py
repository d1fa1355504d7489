from mgpgcr_tpu.solvers.params import GCRParams, MGParams
from mgpgcr_tpu.solvers.result import SolveResult
from mgpgcr_tpu.solvers.gcr import gcr_solve, gcr_solve_eager, GCRSolver
from mgpgcr_tpu.solvers.power import inverse_power_vectors
from mgpgcr_tpu.solvers.mg import MGPreconditioner, setup_mg


def __getattr__(name):
    # the distributed entry points import shard_map machinery; keep them
    # lazy so single-device users don't pay the import
    if name in ("setup_mg_sharded", "ShardedMGPreconditioner",
                "mg_gcr_solve_sharded"):
        from mgpgcr_tpu.solvers import mg_dist

        return getattr(mg_dist, name)
    if name == "gcr_solve_sharded":
        from mgpgcr_tpu.solvers import gcr_dist

        return gcr_dist.gcr_solve_sharded
    raise AttributeError(name)


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
    "setup_mg_sharded",
    "ShardedMGPreconditioner",
    "mg_gcr_solve_sharded",
    "gcr_solve_sharded",
]
