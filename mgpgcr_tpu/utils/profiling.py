"""Profiling: jax.profiler phase annotations + per-kernel roofline counters.

The reference has no profiler at all (its timings are two
``high_resolution_clock`` deltas printed from main.cpp:834-875). Here the
TPU-native story is:

- ``annotate("phase")`` — a ``jax.profiler.TraceAnnotation`` context: the
  label shows up on the TraceViewer timeline of any enclosing
  ``jax.profiler.trace`` capture, and is a harmless no-op otherwise.
- ``trace(logdir)`` — capture a TensorBoard/XProf trace of everything
  inside the block.
- ``roofline(...)`` — an analytic bytes/flops model for a kernel
  invocation; pairs with measured seconds to produce achieved GB/s,
  Gflop/s, Gnnz/s and fraction-of-peak numbers that ``RunLogger`` can
  archive (the numbers BENCH_DETAIL.json reports round-over-round).
"""

from __future__ import annotations

import contextlib
import dataclasses
from typing import Iterator, Optional

import jax

# HBM bandwidth (bytes/s) and peak f32 VPU+MXU flops by device kind
# substring; conservative public numbers.
HBM_BW = {
    "v4": 1.2e12,
    "v5 lite": 8.192e11,
    "v5e": 8.192e11,
    "v5p": 2.765e12,
    "v6": 1.64e12,
    "cpu": 5.0e10,
}


def chip_bandwidth(device=None) -> float:
    dev = device or jax.devices()[0]
    kind = getattr(dev, "device_kind", "cpu").lower()
    for key, bw in HBM_BW.items():
        if key in kind:
            return bw
    return HBM_BW["cpu"]


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Label a host-side phase on the profiler timeline. Safe without an
    active trace; safe on CPU."""
    with jax.profiler.TraceAnnotation(name):
        yield


@contextlib.contextmanager
def trace(logdir: str, create_perfetto_link: bool = False) -> Iterator[None]:
    """Capture a jax.profiler trace (TensorBoard `Profile` tab / XProf)."""
    jax.profiler.start_trace(logdir, create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@dataclasses.dataclass(frozen=True)
class Roofline:
    """Analytic cost of one kernel invocation + achieved rates."""

    name: str
    bytes_moved: int
    flops: int
    nnz: int
    seconds: float
    bandwidth: float  # device HBM bytes/s used for fractions

    @property
    def gbytes_per_s(self) -> float:
        return self.bytes_moved / self.seconds / 1e9

    @property
    def gflops_per_s(self) -> float:
        return self.flops / self.seconds / 1e9

    @property
    def gnnz_per_s(self) -> float:
        return self.nnz / self.seconds / 1e9

    @property
    def vs_hbm_roofline(self) -> float:
        """Fraction of the bandwidth-bound speed of light achieved."""
        sol_seconds = self.bytes_moved / self.bandwidth
        return sol_seconds / self.seconds

    def asdict(self) -> dict:
        return {
            "kernel": self.name,
            "bytes": self.bytes_moved,
            "flops": self.flops,
            "nnz": self.nnz,
            "seconds": round(self.seconds, 9),
            "gbytes_per_s": round(self.gbytes_per_s, 2),
            "gflops_per_s": round(self.gflops_per_s, 2),
            "gnnz_per_s": round(self.gnnz_per_s, 3),
            "vs_hbm_roofline": round(self.vs_hbm_roofline, 4),
        }


def roofline(
    name: str,
    seconds: float,
    bytes_moved: int,
    flops: int = 0,
    nnz: int = 0,
    device=None,
) -> Roofline:
    return Roofline(
        name, int(bytes_moved), int(flops), int(nnz), seconds, chip_bandwidth(device)
    )


def dslash_roofline(
    mesh,
    seconds: float,
    field_itemsize: int = 4,
    link_itemsize: int = 4,
    device=None,
) -> Roofline:
    """Roofline for one Wilson-Dirac hopping application on ``mesh``.

    Minimal HBM traffic per site (complex elements): 4x9 links at
    ``link_itemsize`` per real part, 12 field reads + 12 writes at
    ``field_itemsize``. Flops: 8 directions x (half-spinor project 12 +
    SU(3) 2x3x3 cmul-adds 132 + reconstruct 12) ~= 1320 real flops/site.
    nnz: the fixture-equivalent 39 nnz/row x 12 rows.
    """
    v = mesh.n_sites
    bytes_moved = v * (
        4 * 9 * 2 * link_itemsize + (12 + 12) * 2 * field_itemsize
    )
    return roofline(
        "wilson_dslash",
        seconds,
        bytes_moved,
        flops=1320 * v,
        nnz=39 * 12 * v,
        device=device,
    )


def gcr_iteration_roofline(
    mesh,
    seconds: float,
    restart: int,
    field_itemsize: int = 4,
    device=None,
) -> Roofline:
    """Roofline for one fused-GCR iteration's FIELD ALGEBRA (excluding the
    operator apply): K1 streams x,r,p,Ap (2 reads + 2 writes + 2 reads);
    K2 streams the S-slot Ap stack + Az; K3 streams the stacks again plus
    z, Az, r. Per complex element of the field (size n = 12 V), with S
    slots: ~ (6 + (S+1) + (2S+3)) = 3S + 10 element moves."""
    v = mesh.n_sites
    n = 12 * v
    moves = (3 * restart + 10) * n
    return roofline(
        "gcr_iteration_algebra",
        seconds,
        moves * 2 * field_itemsize,
        flops=(8 * restart + 16) * n,
        device=device,
    )
