"""Launch-geometry heuristics: input size -> scan/reduction blocking.

The TPU analogue of the reference's static dispatch tables mapping input size
to (workgroup_size, x/y/z workgroup counts) per stage
(``src/cuzk/msm.rs:100-122`` decompose, ``:191-213`` SMVP, ``:266-271`` BPR).
Here the tunables are:

- ``num_rows``  — lane width R of the blocked prefix scan (more lanes = fatter
  VPU batches and a shorter sequential chain; the scan runs n/R steps)
- ``bpr_threads`` — lane width T of the blocked bucket reduction (block size
  Bl = (num_buckets-1)/T must be a power of two)
- ``subtask_batch`` — how many subtasks process concurrently (bounds peak
  HBM working set, like the reference's 4-subtasks-per-SMVP-dispatch chunking
  at msm.rs:213)
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class MsmGeometry:
    num_rows: int
    bpr_threads: int
    subtask_batch: int


def pick_geometry(n: int, chunk_size: int) -> MsmGeometry:
    """n must be a power of two (the host pads, like msm.rs:48-61)."""
    assert n & (n - 1) == 0 and n > 0
    # scan lanes: as wide as possible; keep >= 8 sequential steps so the
    # row-offset tree scan (over R lanes) stays cheap relative to row scans
    num_rows = max(1, min(n // 8, 1 << 16))
    # bucket-reduction lanes: body = 2^(c-1) buckets split into power-of-two
    # blocks of >= 16
    body = 1 << (chunk_size - 1)
    bpr_threads = max(1, min(body // 16, 1 << 11))
    # measured on v5e (vmapped fused kernels): 4 concurrent subtasks win up
    # to 2^18 (2^18/c14: bs4=372ms vs bs1=476ms); at 2^20 the working set
    # (row_prefix ~1 GB/subtask) makes bs=1 fastest (1131 vs 1463ms)
    if n <= (1 << 18):
        subtask_batch = 4
    else:
        subtask_batch = 1
    return MsmGeometry(num_rows, bpr_threads, subtask_batch)
