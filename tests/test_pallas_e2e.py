"""Composed-pipeline interpret-mode e2e test.

Every Pallas kernel is parity-tested in isolation (test_pallas_*.py), but the
PRODUCTION composition — fused convert/pack -> packed sorted gather -> fused
scan kernel -> fused row-offsets prefix -> MXU histogram ends -> telescoped
reduction with the fused point-total, all under ``lax.map`` subtask batching
(a historical miscompile surface, see models/common.subtask_batch) — only
ever ran on real TPU hardware before. ``set_pallas_mode("interpret")`` forces
every kernel call site on with ``interpret=True`` so the exact production
program runs on the CPU backend against the oracle.

Reference analogue: the e2e suite tests/test_webgpu_msm_cuzk_*.rs runs the
full shader pipeline, not isolated kernels.
"""

import numpy as np
import pytest

from msm_tpu.models.cuzk import compute_msm_jpoint
from msm_tpu.models.geometry import MsmGeometry
from msm_tpu.ops.curve import set_pallas_mode
from msm_tpu.oracle import best_msm
from msm_tpu.oracle.pyecc import Curve
from msm_tpu.params import BN254, MsmConfig

CV = Curve(BN254)


@pytest.fixture
def interpret_mode():
    set_pallas_mode("interpret")
    yield
    set_pallas_mode("auto")


@pytest.mark.slow  # full tier: every kernel here is covered by default-tier
# parity tests (incl. the dedicated MXU-hist test) + the AOT lowering gate
# + the shard_map interpret co-test running the same fused kernel body
@pytest.mark.parametrize("karatsuba", [False, True])
def test_cuzk_fused_pipeline_interpret_e2e(interpret_mode, karatsuba):
    """n=8192 with num_rows=256 engages EVERY fused kernel: convert/pack
    (fused_scan_available: n % R == 0, R % 256 == 0), the scan + row-offsets
    kernels, the MXU histogram (needs n % 8192 == 0), and the telescoped
    point-total (chunk 8 -> B-1 = 128 lanes). The karatsuba param runs the
    same composition with the difference-Karatsuba phase-1 (r5)."""
    n = 8192
    rng = np.random.default_rng(42)
    base = [CV.to_affine(p) for p in CV.sample_points(64, seed=13)]
    pts = [base[i % len(base)] for i in range(n)]
    ks = [
        int.from_bytes(rng.bytes(32), "little") % BN254.order
        for _ in range(n)
    ]
    cfg = MsmConfig(curve=BN254, chunk_size=8, karatsuba=karatsuba)
    geom = MsmGeometry(num_rows=256, bpr_threads=64, subtask_batch=4)
    got = compute_msm_jpoint(pts, ks, config=cfg, geometry=geom)
    want = best_msm(pts, ks)
    assert CV.eq(got, want)
