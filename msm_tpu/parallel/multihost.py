"""Multi-host orchestration — `jax.distributed` glue for pod-slice runs.

The reference is single-process/single-device (SURVEY §2.5: no communication
backend beyond host<->GPU copies). The TPU framework scales across hosts by
initializing the JAX distributed runtime and building one global mesh; the
sharded MSM (``parallel/sharded.py``) then runs unchanged — stages 1-4 stay
local to each chip's point shard and the window-sum merge rides ICI within a
host and DCN across hosts (the all-gathered payload is ~KBs, so DCN latency
is immaterial).

Usage (same script on every host, e.g. under GKE/TPU-VM):

    from msm_tpu.parallel.multihost import init_multihost, global_mesh
    init_multihost()                    # env-driven (TPU pods auto-detect)
    mesh = global_mesh()                # 1-D mesh over ALL chips, all hosts
    res = msm_tpu.run_tpu_msm_sharded(points, scalars, mesh=mesh)
"""

from __future__ import annotations

import jax

from msm_tpu.parallel.sharded import default_mesh


def init_multihost(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Initialize the JAX distributed runtime. On TPU pods all arguments are
    auto-detected from the environment; pass them explicitly elsewhere."""
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)


def global_mesh(axis: str = "data"):
    """1-D mesh over every chip of every host (jax.devices() is global after
    init_multihost)."""
    return default_mesh(jax.devices(), axis=axis)


def local_device_count() -> int:
    return jax.local_device_count()
