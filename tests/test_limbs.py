"""Serialization round-trip tests — mirrors reference ``utils.rs:395-451``
(limb round-trips swept over word sizes 13..16, adversarial values)."""

import random

import numpy as np
import pytest

from msm_tpu.params import BN254, MsmConfig
from msm_tpu.utils import limbs as L


@pytest.mark.parametrize("word_size", [13, 14, 15, 16])
def test_limb_roundtrip(word_size):
    cfg = MsmConfig(curve=BN254, word_size=word_size)
    rng = random.Random(0)
    vals = [0, 1, cfg.mask, BN254.modulus - 1, cfg.r, (1 << 253)] + [
        rng.randrange(BN254.modulus) for _ in range(20)
    ]
    for v in vals:
        limbs = L.int_to_limbs(v, word_size, cfg.num_words)
        assert limbs.dtype == np.uint32
        assert (limbs <= cfg.mask).all()
        assert L.limbs_to_int(limbs, word_size) == v


def test_limb_overflow_raises():
    with pytest.raises(ValueError):
        L.int_to_limbs(1 << 260, 13, 20)


def test_known_limb_vector():
    # hardcoded expected-limb check in the spirit of utils.rs:439-451
    v = (1 << 13) + 5  # limbs LE: [5, 1, 0, ...]
    limbs = L.int_to_limbs(v, 13, 20)
    assert limbs[0] == 5 and limbs[1] == 1 and not limbs[2:].any()


def test_u16_words_roundtrip():
    rng = random.Random(1)
    for _ in range(10):
        v = rng.randrange(1 << 256)
        assert L.u16_words_to_int(L.int_to_u16_words(v)) == v


def test_bytes_roundtrip():
    rng = random.Random(2)
    ks = [rng.randrange(1 << 256) for _ in range(5)]
    assert L.bytes_to_scalars(L.scalars_to_bytes(ks)) == ks
    pts = [(rng.randrange(1 << 254), rng.randrange(1 << 254)) for _ in range(5)]
    assert L.bytes_to_points(L.points_to_bytes(pts)) == pts


def test_batch_limbs():
    xs = [0, 1, BN254.modulus - 1]
    arr = L.ints_to_limbs(xs, 13, 20)
    assert arr.shape == (3, 20)
    assert L.limbs_to_ints(arr, 13) == xs
