from mgpgcr_tpu.ops.base import LinearOperator, operator_dataclass
from mgpgcr_tpu.ops.dense import DenseOperator
from mgpgcr_tpu.ops.ell import ELLOperator
from mgpgcr_tpu.ops.csr import CSRMatrix
from mgpgcr_tpu.ops.coo import COOMatrix
from mgpgcr_tpu.ops.bsr import BlockSparseOperator
from mgpgcr_tpu.ops.dirac import DiracOperator


def __getattr__(name):
    # numpy-heavy detection module kept lazy
    if name in (
        "detect_wilson",
        "wilson_operator_from_csr",
        "WilsonDetection",
        "SpinConjugatedOperator",
    ):
        from mgpgcr_tpu.ops import ingest

        return getattr(ingest, name)
    raise AttributeError(name)


__all__ = [
    "LinearOperator",
    "operator_dataclass",
    "DenseOperator",
    "ELLOperator",
    "CSRMatrix",
    "COOMatrix",
    "BlockSparseOperator",
    "DiracOperator",
    "detect_wilson",
    "wilson_operator_from_csr",
    "WilsonDetection",
    "SpinConjugatedOperator",
]
