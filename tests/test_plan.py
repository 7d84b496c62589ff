"""Serving plan API tests (models/plan.py): prepare points once, run many
scalar sets — results must match the per-call pipeline and the CPU oracle
exactly, across the sliced/chunked size branches and the batched mode.

Reference anchor: the per-call model being beaten, src/cuzk/msm.rs:75-417
(every reference MSM re-serializes + re-converts the point set)."""

import numpy as np
import pytest

import msm_tpu
from msm_tpu.models import common
from msm_tpu.oracle import best_msm
from msm_tpu.oracle.pyecc import Curve
from msm_tpu.params import BN254, MsmConfig

CV = Curve(BN254)
CFG8 = MsmConfig(curve=BN254, chunk_size=8)


def _fixture(n, seed=0):
    pts = [CV.to_affine(p) for p in CV.sample_points(n, seed=seed)]
    ks1 = CV.sample_scalars(n, seed=seed + 50)
    ks2 = CV.sample_scalars(n, seed=seed + 51)
    return pts, ks1, ks2


def test_plan_two_scalar_sets():
    pts, ks1, ks2 = _fixture(35, seed=3)
    plan = msm_tpu.plan(pts, config=CFG8)
    assert CV.eq(plan.jpoint(ks1), best_msm(pts, ks1))
    assert CV.eq(plan.jpoint(ks2), best_msm(pts, ks2))


def test_plan_affine_call_and_identity():
    pts, ks1, _ = _fixture(17, seed=4)
    plan = msm_tpu.plan(pts, config=CFG8)
    want = best_msm(pts, ks1)
    got = plan(ks1)
    assert got == (None if want.is_identity() else CV.to_affine(want))
    # all-zero scalars -> identity -> None
    assert plan([0] * len(pts)) is None


def test_plan_edge_scalars():
    pts, _, _ = _fixture(16, seed=5)
    ks = [0, 1, BN254.order - 1, BN254.order + 5] + [7] * 12
    plan = msm_tpu.plan(pts, config=CFG8)
    ks_red = [k % BN254.order for k in ks]
    assert CV.eq(plan.jpoint(ks), best_msm(pts, ks_red))


def test_plan_prepacked_scalar_words():
    """The fast serving input: pre-packed u16 scalar words skip the
    python-int serialization; must agree with the list-of-ints path."""
    pts, ks1, _ = _fixture(32, seed=6)
    plan = msm_tpu.plan(pts, config=CFG8)
    words = common.pad_scalars_words(ks1, CFG8, len(pts))
    assert CV.eq(plan.jpoint(words), best_msm(pts, ks1))


def test_plan_matches_per_call_pipeline():
    from msm_tpu.models.cuzk import compute_msm_jpoint

    pts, ks1, _ = _fixture(33, seed=7)  # non-pow2: exercises padding
    plan = msm_tpu.plan(pts, config=CFG8)
    assert CV.eq(plan.jpoint(ks1), compute_msm_jpoint(pts, ks1, config=CFG8))


def test_plan_run_batch():
    pts, ks1, ks2 = _fixture(32, seed=8)
    ks3 = [0] * 32
    plan = msm_tpu.plan(pts, config=CFG8)
    got = plan.run_batch([ks1, ks2, ks3])
    for g, ks in zip(got, [ks1, ks2, ks3]):
        assert CV.eq(g, best_msm(pts, ks))
    assert plan.run_batch([]) == []


def test_plan_sliced(monkeypatch):
    """n > SLICE: per-slice tables under one lax.map (production trigger
    n > 2^20; shrunk so 1024 points run as 4 slices)."""
    from msm_tpu.models import cuzk as cuzk_mod

    monkeypatch.setattr(cuzk_mod, "SLICE", 256)
    pts, ks1, ks2 = _fixture(1024, seed=9)
    plan = msm_tpu.plan(pts, config=CFG8)
    assert len(plan._tables) == 1
    assert plan._slice_n == 256
    assert CV.eq(plan.jpoint(ks1), best_msm(pts, ks1))
    got = plan.run_batch([ks1, ks2])
    assert CV.eq(got[0], best_msm(pts, ks1))
    assert CV.eq(got[1], best_msm(pts, ks2))


def test_plan_chunked(monkeypatch):
    """n > CHUNK_MAX: host-level chunks with exact-int window-sum merge
    (production trigger n > 2^22; shrunk so 1024 points run 2 chunks x 2
    slices)."""
    from msm_tpu.models import cuzk as cuzk_mod

    monkeypatch.setattr(cuzk_mod, "SLICE", 256)
    monkeypatch.setattr(cuzk_mod, "CHUNK_MAX", 512)
    pts, ks1, ks2 = _fixture(1024, seed=10)
    plan = msm_tpu.plan(pts, config=CFG8)
    assert len(plan._tables) == 2
    assert CV.eq(plan.jpoint(ks1), best_msm(pts, ks1))
    got = plan.run_batch([ks1, ks2])
    assert CV.eq(got[0], best_msm(pts, ks1))
    assert CV.eq(got[1], best_msm(pts, ks2))


def test_plan_validate_rejects_off_curve():
    pts, ks1, _ = _fixture(16, seed=11)
    bad = list(pts)
    bad[3] = (bad[3][0], (bad[3][1] + 1) % BN254.modulus)
    with pytest.raises(ValueError, match="not on the curve"):
        msm_tpu.plan(bad, config=CFG8, validate=True)


def test_plan_wrong_scalar_count():
    pts, ks1, _ = _fixture(16, seed=12)
    plan = msm_tpu.plan(pts, config=CFG8)
    with pytest.raises(AssertionError):
        plan.jpoint(ks1[:-1])


@pytest.mark.slow
def test_plan_glv_config():
    """GLV plan: the triple-table (or doubled XLA fallback) must prepare
    per slice and agree with the oracle."""
    pts, ks1, _ = _fixture(64, seed=13)
    cfg = MsmConfig(curve=BN254, chunk_size=8, glv=True)
    plan = msm_tpu.plan(pts, config=cfg)
    assert CV.eq(plan.jpoint(ks1), best_msm(pts, ks1))
