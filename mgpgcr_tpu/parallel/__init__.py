"""Multi-device distribution: 4-D lattice domain decomposition over a
``jax.sharding.Mesh``.

The reference is a single-process OpenMP program (SURVEY.md §2: the only
parallelism is two ``omp parallel for`` sites, MG.h:206-207 and
HierarchicalSparse.h:121-157). This package is its scale-out replacement,
built the TPU way: shard the spacetime axes of lattice fields over a device
mesh, exchange one-site halos with ``ppermute`` rides on ICI, and let global
reductions (the GCR dot products) become ``psum``s. No MPI, no NCCL — the
same jitted solver code runs on 1 chip or N chips; only the shardings change.
"""

from mgpgcr_tpu.parallel.mesh import (
    balanced_factors,
    make_lattice_device_mesh,
    field_partition_spec,
    links_partition_spec,
    shard_field,
    shard_links,
)
from mgpgcr_tpu.parallel.halo import periodic_shift
from mgpgcr_tpu.parallel.wilson import ShardedWilsonDirac
from mgpgcr_tpu.parallel.dist import (
    DistConfig,
    config_from_env,
    init_distributed,
    is_coordinator,
    process_summary,
)

__all__ = [
    "balanced_factors",
    "make_lattice_device_mesh",
    "field_partition_spec",
    "links_partition_spec",
    "shard_field",
    "shard_links",
    "periodic_shift",
    "ShardedWilsonDirac",
    "DistConfig",
    "config_from_env",
    "init_distributed",
    "is_coordinator",
    "process_summary",
]
