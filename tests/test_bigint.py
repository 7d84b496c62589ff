"""Property tests for the JAX limb bigint core vs python ints
(mirrors the reference's bigint round-trip + op tests, utils.rs:395-451)."""

import random

import jax.numpy as jnp
import numpy as np
import pytest

from msm_tpu.ops import bigint
from msm_tpu.params import BN254, MsmConfig
from msm_tpu.utils import limbs as L

CFG = MsmConfig(curve=BN254)
W, NW = CFG.word_size, CFG.num_words


def _to_j(xs):
    return jnp.asarray(L.ints_to_limbs(xs, W, NW).astype(np.int32))


def _from_j(arr):
    return L.limbs_to_ints(np.asarray(arr), W)


def _rand_vals(n, bits=254, seed=0):
    rng = random.Random(seed)
    edge = [0, 1, CFG.mask, (1 << bits) - 1, BN254.modulus - 1, BN254.modulus]
    return edge + [rng.randrange(1 << bits) for _ in range(n)]


def test_add():
    a = _rand_vals(16, seed=1)
    b = _rand_vals(16, seed=2)
    s, carry = bigint.add(_to_j(a), _to_j(b), W)
    got = _from_j(s)
    for ai, bi, gi, ci in zip(a, b, got, np.asarray(carry).tolist()):
        assert gi + (ci << (W * NW)) == ai + bi


def test_sub_and_gte():
    a = _rand_vals(16, seed=3)
    b = _rand_vals(16, seed=4)
    d, borrow = bigint.sub(_to_j(a), _to_j(b), W)
    g = bigint.gte(_to_j(a), _to_j(b), W)
    got = _from_j(d)
    for ai, bi, gi, bo, ge in zip(a, b, got, np.asarray(borrow).tolist(), np.asarray(g).tolist()):
        assert ge == (ai >= bi)
        if ai >= bi:
            assert bo == 0 and gi == ai - bi
        else:
            assert bo == 1 and gi == ai - bi + (1 << (W * NW))


def test_mul():
    a = _rand_vals(12, seed=5)
    b = _rand_vals(12, seed=6)
    m = bigint.mul(_to_j(a), _to_j(b), W)
    got = _from_j(m)
    for ai, bi, gi in zip(a, b, got):
        assert gi == ai * bi


def test_mul_max_values_no_overflow():
    # adversarial: all-limbs-at-mask inputs (the overflow budget's worst case)
    maxv = (1 << (W * NW)) - 1
    m = bigint.mul(_to_j([maxv]), _to_j([maxv]), W)
    assert _from_j(m)[0] == maxv * maxv


def test_carry_propagate_cascade():
    # raw columns at the documented worst case: NW * mask^2 (the overflow
    # budget of check_overflow_budget) cascading carries through every limb
    colmax = NW * CFG.mask**2
    assert colmax + (colmax >> W) < (1 << 31)  # budget incl. incoming carry
    x = jnp.full((1, NW), colmax, dtype=jnp.int32)
    limbs, carry = bigint.carry_propagate(x, W)
    v = L.limbs_to_int(np.asarray(limbs)[0], W) + (int(carry[0]) << (W * NW))
    want = sum(colmax << (W * i) for i in range(NW))
    assert v == want
    assert (np.asarray(limbs) <= CFG.mask).all()


def test_overflow_budget_check():
    with pytest.raises(ValueError):
        bigint.check_overflow_budget(14, 19)
    bigint.check_overflow_budget(13, 20)


def test_w14_lazy_budget_cannot_close():
    """The VERDICT r3 item-10 arithmetic, asserted exactly (see the
    check_overflow_budget docstring): a full 19-term column at w=14
    overflows both signed AND unsigned 32-bit accumulation, and closing
    it with grouped sweeps costs more row-ops than the L=20 -> 19 mul
    saving buys — so w=13/L=20 is the lazy-path production frontier."""
    prod = (2**14 - 1) ** 2
    col = 19 * prod
    assert col > 2**31  # signed budget: over by 2.37x
    assert col > 2**32  # even unsigned lanes cannot hold it
    # grouped accumulation: at most 7 products per signed column
    per_col = (2**31 - 2**19) // prod
    assert per_col == 7
    groups = -(-19 // per_col)
    assert groups == 3  # 2 extra sweeps per product phase, 4 per mont-mul
    extra_sweep_ops = 4 * 3 * (2 * 19)  # 4 sweeps x ~3 ops x 2L columns
    muls_saved = 2 * (20**2 - 19**2)
    assert extra_sweep_ops > muls_saved  # 456 > 78: a strict loss


def test_shr_bits():
    rng = random.Random(7)
    vals = [rng.randrange(1 << 500) for _ in range(8)]
    arr = jnp.asarray(L.ints_to_limbs(vals, W, 40).astype(np.int32))
    for shift in [0, 6, 13, 253, 255, 300]:
        out = bigint.shr_bits(arr, shift, W, 21)
        got = _from_j(out)
        for v, g in zip(vals, got):
            assert g == (v >> shift) % (1 << (W * 21))


def test_batched_shapes():
    a = jnp.zeros((3, 5, NW), jnp.int32).at[..., 0].set(7)
    b = jnp.zeros((3, 5, NW), jnp.int32).at[..., 0].set(8)
    s, _ = bigint.add(a, b, W)
    assert s.shape == (3, 5, NW)
    assert (np.asarray(s)[..., 0] == 15).all()
