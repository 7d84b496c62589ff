"""Multi-chip serving plan tests (parallel/sharded_plan.py) on the
8-virtual-device CPU mesh: the SHARDED cached point table must serve many
scalar sets bit-exactly vs the CPU oracle, the single-device plan, and
across the sliced/chunked size branches.

Reference anchor: the per-call, single-device model being beaten
(src/cuzk/msm.rs:75-417 re-converts points every call on one
wgpu::Device, src/cuzk/gpu.rs:11-23)."""

import jax
import numpy as np
import pytest

import msm_tpu
from msm_tpu.oracle import best_msm
from msm_tpu.oracle.pyecc import Curve
from msm_tpu.params import BN254, MsmConfig
from msm_tpu.parallel import default_mesh

CV = Curve(BN254)
# chunk_size=8 keeps the compiled programs small (the sharded-table cache
# and the merge logic under test are window-size independent; production
# window sizes run on hardware in test_hw_e2e.py)
CFG8 = MsmConfig(curve=BN254, chunk_size=8)


def _fixture(n, seed=0):
    pts = [CV.to_affine(p) for p in CV.sample_points(n, seed=seed)]
    ks1 = CV.sample_scalars(n, seed=seed + 50)
    ks2 = CV.sample_scalars(n, seed=seed + 51)
    return pts, ks1, ks2


def test_sharded_plan_two_scalar_sets():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    mesh = default_mesh(jax.devices()[:8])
    n = 257  # non-pow2: padding spread across shards
    pts, ks1, ks2 = _fixture(n, seed=21)
    splan = msm_tpu.plan_sharded(pts, mesh=mesh, config=CFG8)
    assert len(splan._tables) == 1
    assert CV.eq(splan.jpoint(ks1), best_msm(pts, ks1))
    assert CV.eq(splan.jpoint(ks2), best_msm(pts, ks2))
    # affine __call__ convention matches the single-device plan
    want = best_msm(pts, ks1)
    assert splan(ks1) == (
        None if want.is_identity() else CV.to_affine(want)
    )


def test_sharded_plan_matches_single_device_plan():
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    mesh = default_mesh(jax.devices()[:4])
    pts, ks1, _ = _fixture(100, seed=22)
    splan = msm_tpu.plan_sharded(pts, mesh=mesh, config=CFG8)
    plan = msm_tpu.plan(pts, config=CFG8)
    assert CV.eq(splan.jpoint(ks1), plan.jpoint(ks1))


def test_sharded_plan_run_batch():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    mesh = default_mesh(jax.devices()[:8])
    pts, ks1, ks2 = _fixture(128, seed=23)
    ks3 = [0] * 128
    splan = msm_tpu.plan_sharded(pts, mesh=mesh, config=CFG8)
    got = splan.run_batch([ks1, ks2, ks3])
    for g, ks in zip(got, [ks1, ks2, ks3]):
        assert CV.eq(g, best_msm(pts, ks))
    assert splan.run_batch([]) == []


def test_sharded_plan_sliced_and_chunked(monkeypatch):
    """Size-scaling composition: shards larger than SLICE slice inside the
    per-shard body (stacked per-slice tables), point sets beyond
    CHUNK_MAX * D split into host-level chunks with the exact-int
    window-sum merge (production triggers 2^20 / 2^22, shrunk)."""
    if len(jax.devices()) < 2:
        pytest.skip("needs 2 devices")
    from msm_tpu.models import cuzk as cuzk_mod

    mesh = default_mesh(jax.devices()[:2])
    monkeypatch.setattr(cuzk_mod, "SLICE", 64)
    monkeypatch.setattr(cuzk_mod, "CHUNK_MAX", 128)
    pts, ks1, ks2 = _fixture(512, seed=24)
    splan = msm_tpu.plan_sharded(pts, mesh=mesh, config=CFG8)
    # 512 points / (128*2 per chunk) = 2 chunks; 128/shard = 2 slices each
    assert len(splan._tables) == 2
    assert CV.eq(splan.jpoint(ks1), best_msm(pts, ks1))
    got = splan.run_batch([ks1, ks2])
    assert CV.eq(got[0], best_msm(pts, ks1))
    assert CV.eq(got[1], best_msm(pts, ks2))


def test_sharded_plan_rejects_non_pow2_mesh():
    if len(jax.devices()) < 3:
        pytest.skip("needs 3 devices")
    mesh = default_mesh(jax.devices()[:3])
    pts, _, _ = _fixture(16, seed=25)
    with pytest.raises(ValueError, match="power of two"):
        msm_tpu.plan_sharded(pts, mesh=mesh, config=CFG8)
