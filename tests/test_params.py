"""Parameter-derivation tests.

Mirrors the reference's inline unit tests for parameter math
(``src/cuzk/utils.rs:395-451``, ``src/naive/utils/bigint.rs:36-94``):
every derived constant is validated against plain python-int math.
"""

import pytest

from msm_tpu.params import (
    BLS12_377,
    BN254,
    PALLAS,
    DEFAULT_CONFIG,
    MsmConfig,
    calc_num_words,
    calc_rinv_and_n0,
    egcd,
    gen_mu,
)


def test_default_geometry_matches_reference():
    # WORD_SIZE=13, num_words=20 (msm.rs:24-34); 16 subtasks (msm.rs:79-82)
    cfg = DEFAULT_CONFIG
    assert cfg.word_size == 13
    assert cfg.num_words == 20
    assert cfg.chunk_size == 16
    assert cfg.num_subtasks == 16
    assert cfg.index_shift == 1 << 15
    assert cfg.num_buckets == (1 << 15) + 1


@pytest.mark.parametrize("word_size", [13, 14, 15, 16])
def test_num_words_sweep(word_size):
    # mirrors the word-size sweep in utils.rs:399,431
    assert calc_num_words(word_size, 254) == -(-254 // word_size)


def test_egcd():
    g, x, y = egcd(240, 46)
    assert g == 2 and 240 * x + 46 * y == 2


@pytest.mark.parametrize("curve", [BN254, BLS12_377, PALLAS])
@pytest.mark.parametrize("word_size", [13, 14, 15, 16])
def test_montgomery_params(curve, word_size):
    cfg = MsmConfig(curve=curve, word_size=word_size)
    p = curve.modulus
    r = cfg.r
    # R * Rinv == 1 (mod p)
    assert (r * cfg.rinv) % p == 1
    # n0: p * n0 == -1 (mod 2^w)
    assert (p * cfg.n0) % (1 << word_size) == (1 << word_size) - 1
    # R2 really is R^2
    assert cfg.r2 == (r * r) % p
    # limb capacity
    assert cfg.num_words * word_size >= curve.modulus_bits


def test_mu():
    p = BN254.modulus
    mu = gen_mu(p, p.bit_length())
    x = 1 << p.bit_length()  # first power of two above p (p is not a pow2)
    assert mu == (x * x) // p


def test_scalar_windows_cover_order():
    for curve in (BN254, BLS12_377, PALLAS):
        cfg = MsmConfig(curve=curve)
        assert cfg.num_subtasks * cfg.chunk_size >= curve.order_bits
        # top window of any valid scalar leaves carry headroom (< 2^(c-1))
        top_bits = curve.order_bits - (cfg.num_subtasks - 1) * cfg.chunk_size
        assert top_bits < cfg.chunk_size
