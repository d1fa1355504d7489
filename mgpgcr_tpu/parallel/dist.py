"""Multi-host (multi-process) runtime wiring via ``jax.distributed``.

The reference is strictly single-process (SURVEY.md §5: OpenMP pragmas at
MG.h:206-207 are its entire parallel runtime). Scaling past one host on TPU
is done the JAX way instead: every host runs the SAME program, calls
``jax.distributed.initialize`` so the processes rendezvous into one global
runtime, and then builds device meshes over ``jax.devices()`` (the *global*
device list). All sharded code in this package — ``ShardedWilsonDirac``,
``shard_map`` halo exchange, ``psum`` reductions — is written against named
mesh axes, so it runs unchanged on one process or many; only the mesh
construction sees more devices.

Launch contract (the runbook, docs/MULTIHOST.md, walks through each):

- TPU pods / GKE: ``jax.distributed.initialize()`` with no arguments —
  coordinator and process ids come from the TPU metadata/cluster env.
- Manual / CPU validation: set the three standard pieces explicitly,
  either by flags or the ``MGPGCR_COORDINATOR`` / ``MGPGCR_NUM_PROCESSES``
  / ``MGPGCR_PROCESS_ID`` environment variables (mirrored to the flags of
  ``benchmarks/scaling.py --launch N``, which self-spawns N local processes
  and is how SCALING_r*.json artifacts are produced in this repo without
  pod hardware).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional

import jax

_ENV_COORD = "MGPGCR_COORDINATOR"
_ENV_NPROC = "MGPGCR_NUM_PROCESSES"
_ENV_PID = "MGPGCR_PROCESS_ID"
_ENV_LOCAL_DEVICES = "MGPGCR_LOCAL_DEVICE_IDS"

_initialized = False


@dataclasses.dataclass(frozen=True)
class DistConfig:
    """Resolved multi-process topology of the current run."""

    coordinator: Optional[str]
    num_processes: int
    process_id: int

    @property
    def is_multiprocess(self) -> bool:
        return self.num_processes > 1


def config_from_env() -> Optional[DistConfig]:
    """Read an explicit multi-process topology from MGPGCR_* env vars.
    Returns None when unset (single process, or auto-detectable cluster)."""
    coord = os.environ.get(_ENV_COORD)
    nproc = os.environ.get(_ENV_NPROC)
    pid = os.environ.get(_ENV_PID)
    if coord is None and nproc is None and pid is None:
        return None
    if not (coord and nproc is not None and pid is not None):
        raise ValueError(
            f"partial multi-process env: need all of {_ENV_COORD}, "
            f"{_ENV_NPROC}, {_ENV_PID} (got coord={coord!r}, "
            f"nproc={nproc!r}, pid={pid!r})"
        )
    return DistConfig(coord, int(nproc), int(pid))


def init_distributed(
    coordinator: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids=None,
) -> DistConfig:
    """Initialize the global JAX runtime across processes. Idempotent.

    Resolution order: explicit args > MGPGCR_* env vars > JAX cluster
    auto-detection (TPU metadata, Slurm, OpenMPI). On a single process with
    nothing configured, this is a no-op returning a 1-process config.
    """
    global _initialized
    env = config_from_env()
    if coordinator is None and env is not None:
        coordinator = env.coordinator
        num_processes = num_processes or env.num_processes
        process_id = env.process_id if process_id is None else process_id
    if local_device_ids is None and os.environ.get(_ENV_LOCAL_DEVICES):
        local_device_ids = [
            int(s) for s in os.environ[_ENV_LOCAL_DEVICES].split(",")
        ]

    if coordinator is None and num_processes is None:
        # No explicit topology. Try cluster auto-detection only when some
        # recognised cluster env is present; plain single-process runs
        # must not pay a coordinator timeout.
        if any(
            k in os.environ
            for k in ("SLURM_JOB_ID", "OMPI_COMM_WORLD_SIZE", "TPU_WORKER_HOSTNAMES")
        ):
            if not _initialized:
                try:
                    jax.distributed.initialize()
                except (ValueError, RuntimeError):
                    # A cluster-ish env var was present but JAX could not
                    # resolve a coordinator from it (e.g. a single-chip TPU
                    # tunnel exports TPU_WORKER_HOSTNAMES). Single process.
                    return DistConfig(None, 1, 0)
                _initialized = True
            return DistConfig(None, jax.process_count(), jax.process_index())
        return DistConfig(None, 1, 0)

    if not _initialized:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
            local_device_ids=local_device_ids,
        )
        _initialized = True
    return DistConfig(coordinator, jax.process_count(), jax.process_index())


def is_coordinator() -> bool:
    """True on the process that should write artifacts / print results."""
    return jax.process_index() == 0


def process_summary() -> dict:
    """Topology facts for logging: process rank/count, local vs global
    device counts, device kinds."""
    return {
        "process_id": jax.process_index(),
        "num_processes": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
        "device_kind": jax.devices()[0].device_kind,
    }
