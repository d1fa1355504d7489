"""Pallas TPU kernels for the hot compute paths.

The reference's hot kernel is the CSR SpMV inside every GCR iteration
(Operator.h:331-346; cost model SemesterProject.pdf §2.2). Here the
equivalent operator application is the Wilson--Dirac stencil, fused into a
single Pallas kernel (``dslash.py``) so the whole 8-hop update streams each
field/link element through VMEM exactly once per grid block instead of
materialising per-hop intermediates in HBM.
"""

from mgpgcr_tpu.ops.pallas.dslash import PallasWilsonDirac, dslash_apply

__all__ = ["PallasWilsonDirac", "dslash_apply"]
