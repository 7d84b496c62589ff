"""Batched-MSM API + second/third curve end-to-end generality.

The reference proves two-curve generality through its naive path's Pallas
(Pasta) instantiation (``src/naive/wgsl/pallas/``); here every curve config
runs the full cuZK pipeline. BLS12-377 exercises a wider modulus (30 limbs),
the Pasta/Pallas curve exercises an odd limb count (21).
"""

import pytest

from msm_tpu.models.batched import compute_msm_batched
from msm_tpu.models.cuzk import compute_msm_jpoint
from msm_tpu.oracle.pyecc import Curve
from msm_tpu.params import (
    BLS12_377,
    BLS12_381,
    BN254,
    GRUMPKIN,
    PALLAS,
    VESTA,
    SECP256K1,
    MsmConfig,
)


def _sample(cv, n, seed):
    pts = [cv.to_affine(p) for p in cv.sample_points(n, seed=seed)]
    ks = cv.sample_scalars(n, seed=seed + 1)
    return pts, ks


def test_batched_msm_matches_oracle():
    cv = Curve(BN254)
    cfg = MsmConfig(curve=BN254, chunk_size=8)
    instances = [_sample(cv, 40 + 8 * i, seed=10 + i) for i in range(3)]
    got = compute_msm_batched(instances, cfg)
    for (pts, ks), g in zip(instances, got):
        want = cv.msm([cv.from_affine(*p) for p in pts], ks)
        assert cv.eq(g, want)


@pytest.mark.parametrize(
    "curve", [BLS12_377, PALLAS, BLS12_381, SECP256K1, GRUMPKIN, VESTA],
    ids=lambda c: c.name,
)
def test_cuzk_msm_other_curves(curve):
    cv = Curve(curve)
    cfg = MsmConfig(curve=curve, chunk_size=8)
    pts, ks = _sample(cv, 50, seed=3)
    got = compute_msm_jpoint(pts, ks, cfg)
    want = cv.msm([cv.from_affine(*p) for p in pts], ks)
    assert cv.eq(got, want)


@pytest.mark.slow  # compile-heavy order-width property: full tier
def test_full_width_order_digits_and_e2e():
    """secp256k1's 256-bit order genuinely overflows sixteen signed chunk-16
    windows (the top digit of a near-order scalar exceeds the 2^15+1 bucket
    range); the (order_bits + 1)-bit window rule yields 17 subtasks and
    keeps every digit in range. E2e asserts the extremal scalars still sum
    correctly."""
    import jax.numpy as jnp
    import numpy as np

    from msm_tpu.ops.decompose import decompose_signed

    cfg = MsmConfig(curve=SECP256K1)
    assert cfg.num_subtasks == 17
    r = SECP256K1.order
    ks = [r - 1, r - 2, r >> 1, (1 << 255) % r, 1]
    from msm_tpu.models.common import ints_to_u16_array

    s_u16 = ints_to_u16_array([k % (1 << 256) for k in ks])
    keys, _ = decompose_signed(
        jnp.asarray(s_u16), cfg.chunk_size, cfg.num_subtasks
    )
    assert int(jnp.max(keys)) <= 1 << (cfg.chunk_size - 1)

    cv = Curve(SECP256K1)
    pts = [cv.to_affine(p) for p in cv.sample_points(len(ks), seed=6)]
    got = compute_msm_jpoint(pts, ks, cfg)
    want = cv.msm_naive([cv.from_affine(*p) for p in pts], ks)
    assert cv.eq(got, want)


# w=13 is the production word size and stays default; the off-default
# sweep value is full-tier (fuzz_e2e sweeps 12..16 continuously)
@pytest.mark.parametrize(
    "word_size", [pytest.param(12, marks=pytest.mark.slow), 13]
)
def test_cuzk_msm_word_size_generic(word_size):
    """Limb-geometry genericity: the whole pipeline parameterizes over
    word_size like the reference's ShaderManager (13-16 swept in its
    serialization tests, utils.rs:399-431; >=14 is rejected here by the
    int32 overflow budget)."""
    cv = Curve(BN254)
    cfg = MsmConfig(curve=BN254, word_size=word_size)
    pts, ks = _sample(cv, 30, seed=21)
    got = compute_msm_jpoint(pts, ks, cfg)
    want = cv.msm([cv.from_affine(*p) for p in pts], ks)
    assert cv.eq(got, want)


def test_word_size_14_rejected():
    """w>=14 overflows int32 column accumulation and must be refused."""
    from msm_tpu.ops.field import FieldCtx

    with pytest.raises(ValueError):
        FieldCtx(MsmConfig(curve=BN254, word_size=14))
