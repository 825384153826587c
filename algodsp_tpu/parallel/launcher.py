"""Multi-host launcher.

The reference has no distributed execution; this is the mandated
TPU-native equivalent (SURVEY.md §2.9/§5.8): initialize
`jax.distributed` across hosts, build the global mesh with the time
axis kept ICI-local (halo/carry ppermutes stay on-chip interconnect)
and the channel axis free to span DCN (it never communicates).

Typical pod-slice usage, one process per host:

    from algodsp_tpu.parallel.launcher import initialize, pod_mesh
    initialize()                       # env-driven (TPU pods auto-detect)
    mesh = pod_mesh(time_parallelism=8)
"""

from __future__ import annotations

import jax

from algodsp_tpu.parallel.mesh import make_mesh


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Initialize jax.distributed. On TPU pods all arguments auto-detect
    from the environment; pass them explicitly for CPU/GPU clusters."""
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)


def pod_mesh(time_parallelism: int = 1):
    """Global mesh over every device in the job.

    The time axis is laid out within contiguous device blocks (ICI);
    the channel axis takes the remainder and may span hosts (DCN) —
    it performs no communication in this framework.
    """
    n = len(jax.devices())
    if n % time_parallelism:
        raise ValueError(
            f"time_parallelism {time_parallelism} does not divide {n} devices")
    return make_mesh({"channel": n // time_parallelism,
                      "time": time_parallelism})
