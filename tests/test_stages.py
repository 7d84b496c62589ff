"""Tier-1 pure-CPU cuZK pipeline tests — mirrors reference tests/cuzk.rs:11-95:
run the entire pipeline on CPU models, cross-check all bucket-reduction
variants against each other, and assert equality with the Pippenger oracle.
"""

import numpy as np
import pytest

from msm_tpu.oracle import stages as S
from msm_tpu.oracle.pyecc import Curve, IDENTITY
from msm_tpu.params import BN254, MsmConfig

CV = Curve(BN254)


def _fixture(n, seed=0):
    pts = CV.sample_points(n, seed=seed)
    ks = CV.sample_scalars(n, seed=seed + 100)
    return pts, ks


def test_decompose_signed_invariant():
    cfg = MsmConfig(curve=BN254, chunk_size=16)
    ks = CV.sample_scalars(8, seed=5) + [0, 1, BN254.order - 1]
    digits = S.decompose_scalars_signed(ks, cfg.num_subtasks, cfg.chunk_size)
    half = cfg.index_shift
    assert digits.min() >= -half and digits.max() < half
    # sum_j digit[j] * 2^(c*j) == scalar
    for i, k in enumerate(ks):
        total = sum(
            int(digits[j, i]) << (cfg.chunk_size * j)
            for j in range(cfg.num_subtasks)
        )
        assert total == k


@pytest.mark.parametrize("chunk_size", [4, 16])
def test_decompose_all_window_values(chunk_size):
    # adversarial scalars hitting max windows (all-ones patterns)
    cfg = MsmConfig(curve=BN254, chunk_size=chunk_size)
    ks = [(1 << 254) - 1, int("aaaa" * 16, 16) % BN254.order, (1 << 253) + 1]
    digits = S.decompose_scalars_signed(ks, cfg.num_subtasks, cfg.chunk_size)
    for i, k in enumerate(ks):
        total = sum(
            int(digits[j, i]) << (cfg.chunk_size * j)
            for j in range(cfg.num_subtasks)
        )
        assert total == k


def test_transpose_groups_stably():
    cfg = MsmConfig(curve=BN254, chunk_size=4)
    ks = CV.sample_scalars(13, seed=3)
    digits = S.decompose_scalars_signed(ks, cfg.num_subtasks, cfg.chunk_size)
    col_ptr, val_idxs = S.cpu_transpose(digits, cfg.num_buckets)
    keys = np.abs(digits)
    for t in range(cfg.num_subtasks):
        # col_ptr is a valid monotone histogram prefix covering n
        assert col_ptr[t, 0] == 0 and col_ptr[t, -1] == 13
        assert (np.diff(col_ptr[t]) >= 0).all()
        # grouped-by-bucket, stable within bucket == stable argsort of keys
        expect = np.argsort(keys[t], kind="stable")
        assert (val_idxs[t] == expect).all()


def test_bucket_reduction_variants_agree():
    # random bucket points incl. identities (mirrors tests/cuzk.rs:52-76)
    pts = CV.sample_points(9, seed=8)
    buckets = [IDENTITY, pts[0], IDENTITY, pts[1], pts[2], pts[3], IDENTITY, pts[4], pts[5]]
    r_serial = S.serial_bucket_reduction(buckets, CV)
    r_running = S.running_sum_bucket_reduction(buckets, CV)
    r_par = S.parallel_bucket_reduction(buckets, CV, num_threads=4)
    gs, ms = S.parallel_bucket_reduction_1(buckets, CV, num_threads=2)
    r_two = S.parallel_bucket_reduction_2(gs, ms, len(buckets) - 1, CV)
    assert CV.eq(r_serial, r_running)
    assert CV.eq(r_serial, r_par)
    assert CV.eq(r_serial, r_two)


@pytest.mark.parametrize("variant", ["serial", "running_sum", "parallel", "two_phase"])
def test_cuzk_cpu_pipeline_small_windows(variant):
    # chunk_size=4 keeps bucket counts tiny; n=19 exercises irregular sizes
    cfg = MsmConfig(curve=BN254, chunk_size=4)
    pts, ks = _fixture(19, seed=1)
    got = S.cuzk_cpu_msm(pts, ks, cfg, bpr_variant=variant, num_threads=4)
    want = CV.msm(pts, ks)
    assert CV.eq(got, want)


def test_cuzk_cpu_pipeline_production_windows():
    # chunk_size=16 (production geometry) with the sparse 'serial' reduction
    cfg = MsmConfig(curve=BN254, chunk_size=16)
    pts, ks = _fixture(9, seed=2)
    got = S.cuzk_cpu_msm(pts, ks, cfg, bpr_variant="serial")
    want = CV.msm(pts, ks)
    assert CV.eq(got, want)


def test_cuzk_cpu_pipeline_edge_scalars():
    cfg = MsmConfig(curve=BN254, chunk_size=4)
    pts = CV.sample_points(4, seed=4)
    ks = [0, 1, BN254.order - 1, (1 << 200) + 12345]
    got = S.cuzk_cpu_msm(pts, ks, cfg)
    want = CV.msm(pts, ks)
    assert CV.eq(got, want)
