"""Multi-chip / multi-host sharded MSM (mesh + point-add collectives)."""

from msm_tpu.parallel.sharded import (
    compute_msm_sharded,
    default_mesh,
    sharded_window_sums,
)

__all__ = ["compute_msm_sharded", "default_mesh", "sharded_window_sums"]
