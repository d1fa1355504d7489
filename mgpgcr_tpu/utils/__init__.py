"""Observability and run utilities.

The reference's only observability is printf + a hardcoded trace file
(GCR.h:213-216, 270-274; quirk Q9). Here: structured JSON-lines run logs,
phase timers, residual-trace artifacts, and jax.profiler hooks.
"""

from mgpgcr_tpu.utils.logging import RunLogger, Timer
from mgpgcr_tpu.utils.trace import save_residual_trace, load_residual_trace
from mgpgcr_tpu.utils.profiling import (
    Roofline,
    annotate,
    chip_bandwidth,
    dslash_roofline,
    gcr_iteration_roofline,
    roofline,
    trace,
)

__all__ = [
    "RunLogger",
    "Timer",
    "save_residual_trace",
    "load_residual_trace",
    "Roofline",
    "annotate",
    "chip_bandwidth",
    "dslash_roofline",
    "gcr_iteration_roofline",
    "roofline",
    "trace",
]
