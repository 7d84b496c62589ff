"""Multi-chip / multi-host sharded MSM (mesh + point-add collectives)."""

from msm_tpu.parallel.sharded import (
    compute_msm_sharded,
    default_mesh,
    sharded_window_sums,
)
from msm_tpu.parallel.sharded_plan import ShardedMsmPlan, plan_sharded

__all__ = [
    "ShardedMsmPlan",
    "compute_msm_sharded",
    "default_mesh",
    "plan_sharded",
    "sharded_window_sums",
]
