"""mgpgcr_tpu — TPU-native sparse linear algebra + multigrid-preconditioned GCR.

A brand-new JAX/XLA/Pallas framework with the capabilities of the reference
C++ project jing2li/MGPreconditionedGCR (an adaptive multigrid-preconditioned
Generalised Conjugate Residual solver for the Wilson--Dirac operator of
Lattice QCD), redesigned TPU-first:

- Fields are ``jnp`` arrays over a 6-D lattice index space (t,z,y,x,spinor,colour)
  (reference: Fields.h); mesh/blocking logic is pure reshape/transpose
  (reference: Mesh.h).
- Linear operators are pytree dataclasses with an ``apply`` method — dense,
  ELL, CSR/COO, block-sparse (the reference's HierarchicalSparse.h), the
  Wilson--Dirac wrapper I - kD (reference: Operator.h), and a matrix-free
  hopping-stencil Wilson--Dirac operator that needs no gathers at all.
- Solvers (GCR, reference: GCR.h; two-level adaptive MG, reference: MG.h) are
  functional, jit-compatible ``lax.while_loop`` programs returning typed
  results, composable as preconditioners exactly like the reference's
  solver-as-Operator idiom.
- Distribution is 4-D lattice domain decomposition over a
  ``jax.sharding.Mesh`` with halo exchange via collectives, not MPI.
"""

from mgpgcr_tpu.mesh import LatticeMesh, BlockMap
from mgpgcr_tpu import cplx, fields
from mgpgcr_tpu import ops
from mgpgcr_tpu.ops import wilson, wilson_tpu
from mgpgcr_tpu.ops.base import LinearOperator
from mgpgcr_tpu.ops.dense import DenseOperator
from mgpgcr_tpu.ops.ell import ELLOperator
from mgpgcr_tpu.ops.csr import CSRMatrix
from mgpgcr_tpu.ops.coo import COOMatrix
from mgpgcr_tpu.ops.bsr import BlockSparseOperator
from mgpgcr_tpu.ops.dirac import DiracOperator
from mgpgcr_tpu.solvers.params import GCRParams, MGParams
from mgpgcr_tpu.solvers.result import SolveResult
from mgpgcr_tpu.solvers.gcr import gcr_solve, gcr_solve_eager, GCRSolver
from mgpgcr_tpu.solvers.mg import MGPreconditioner, setup_mg
from mgpgcr_tpu.solvers.refine import refined_solve, wilson_refined_solve
from mgpgcr_tpu.solvers.eigen import smallest_eigenpairs

__all__ = [
    "cplx",
    "ops",
    "wilson",
    "wilson_tpu",
    "refined_solve",
    "wilson_refined_solve",
    "smallest_eigenpairs",
    "LatticeMesh",
    "BlockMap",
    "fields",
    "LinearOperator",
    "DenseOperator",
    "ELLOperator",
    "CSRMatrix",
    "COOMatrix",
    "BlockSparseOperator",
    "DiracOperator",
    "GCRParams",
    "MGParams",
    "SolveResult",
    "gcr_solve",
    "gcr_solve_eager",
    "GCRSolver",
    "MGPreconditioner",
    "setup_mg",
]

__version__ = "0.1.0"
