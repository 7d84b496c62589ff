"""Field-op tests vs python-int oracle — mirrors reference tests/field.rs:110-166
(test_webgpu_field_add/sub/mul/barret_mul) plus Montgomery-form round trips
and adversarial values (p-1, 0, R, powers of two).

The field layer uses the lazy/balanced representation (ops/field.py): add /
sub / mont_mul return non-canonical limbs that are only congruent mod p, so
every comparison goes through ``canonical()`` — itself under test here.
"""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from msm_tpu.ops.field import FieldCtx
from msm_tpu.params import BLS12_377, BN254, MsmConfig
from msm_tpu.utils import limbs as L

CFG = MsmConfig(curve=BN254)
F = FieldCtx(CFG)
P = BN254.modulus
W, NW = CFG.word_size, CFG.num_words


def _to_j(xs, nw=NW):
    return jnp.asarray(L.ints_to_limbs(xs, W, nw).astype(np.int32))


def _canon(arr):
    """Canonicalize a balanced device value and lift to ints."""
    return L.limbs_to_ints(np.asarray(F.canonical(arr)), W)


def _vals(n, seed):
    rng = random.Random(seed)
    edge = [0, 1, 2, P - 1, P - 2, CFG.r % P, CFG.r2, (1 << 253) % P, CFG.mask]
    return edge + [rng.randrange(P) for _ in range(n)]


A = _vals(24, seed=10)
B = _vals(24, seed=11)
JA, JB = _to_j(A), _to_j(B)


def test_canonical_of_canonical():
    assert _canon(JA) == [a % P for a in A]


def test_add():
    assert _canon(jax.jit(F.add)(JA, JB)) == [(a + b) % P for a, b in zip(A, B)]


def test_sub():
    assert _canon(jax.jit(F.sub)(JA, JB)) == [(a - b) % P for a, b in zip(A, B)]


def test_neg():
    assert _canon(jax.jit(F.neg)(JA)) == [(-a) % P for a in A]


def test_mont_mul():
    # mont_mul(a, b) == a*b*Rinv mod p
    got = _canon(jax.jit(F.mont_mul)(JA, JB))
    assert got == [a * b * CFG.rinv % P for a, b in zip(A, B)]


def test_mont_mul_on_lazy_inputs():
    # chains through balanced intermediates: (a+b)*(a-b) and (-a)*b
    got = _canon(F.mont_mul(F.add(JA, JB), F.sub(JA, JB)))
    assert got == [(a + b) * (a - b) * CFG.rinv % P for a, b in zip(A, B)]
    got2 = _canon(F.mont_mul(F.neg(JA), JB))
    assert got2 == [-a * b * CFG.rinv % P for a, b in zip(A, B)]


def test_deep_lazy_chain_bounds():
    # the worst chains the curve formulas produce: ~8p operands into mont_mul
    t = F.add(F.add(JA, JA), F.add(JA, JA))  # 4a, |v| < 4p
    u = F.sub(F.add(JB, JB), F.neg(F.add(JB, JB)))  # 4b
    got = _canon(F.mont_mul(t, u))
    assert got == [16 * a * b * CFG.rinv % P for a, b in zip(A, B)]


def test_mont_roundtrip():
    am = F.to_mont(JA)
    assert _canon(am) == [a * CFG.r % P for a in A]
    assert _canon(F.from_mont(am)) == [a % P for a in A]


def test_mont_mul_consistency_in_form():
    am, bm = F.to_mont(JA), F.to_mont(JB)
    want = [(a * b % P) * CFG.r % P for a, b in zip(A, B)]
    assert _canon(F.mont_mul(am, bm)) == want


def test_barrett_mul():
    got = L.limbs_to_ints(np.asarray(jax.jit(F.barrett_mul)(JA, JB)), W)
    assert got == [a * b % P for a, b in zip(A, B)]


def test_barrett_adversarial_max():
    big = [P - 1, P - 1, 1, 0]
    got = L.limbs_to_ints(
        np.asarray(F.barrett_mul(_to_j(big), _to_j(list(reversed(big))))), W
    )
    assert got == [x * y % P for x, y in zip(big, reversed(big))]


def test_mont_pow_and_inv():
    vals = [3, P - 5, 12345678901234567890 % P]
    jv = _to_j(vals)
    got = L.limbs_to_ints(np.asarray(F.inv_standard(jv)), W)
    assert got == [pow(v, -1, P) for v in vals]


def test_sqr():
    assert _canon(F.mont_sqr(JA)) == [a * a * CFG.rinv % P for a in A]


def test_is_zero_and_eq():
    z = F.sub(JA, JA)  # 0 in balanced form
    assert np.asarray(F.is_zero(z)).all()
    assert np.asarray(F.eq(F.add(JA, JB), F.add(JB, JA))).all()
    got = np.asarray(F.eq(JA, JB)).tolist()
    assert got == [(a % P) == (b % P) for a, b in zip(A, B)]


@pytest.mark.parametrize("curve", [BLS12_377])
def test_other_curve(curve):
    cfg = MsmConfig(curve=curve)
    f = FieldCtx(cfg)
    p = curve.modulus
    rng = random.Random(12)
    a = [rng.randrange(p) for _ in range(6)] + [0, p - 1]
    b = [rng.randrange(p) for _ in range(6)] + [p - 1, p - 1]
    ja = jnp.asarray(L.ints_to_limbs(a, cfg.word_size, cfg.num_words).astype(np.int32))
    jb = jnp.asarray(L.ints_to_limbs(b, cfg.word_size, cfg.num_words).astype(np.int32))

    def canon(arr):
        return L.limbs_to_ints(np.asarray(f.canonical(arr)), cfg.word_size)

    assert canon(f.mont_mul(ja, jb)) == [x * y * cfg.rinv % p for x, y in zip(a, b)]
    assert canon(f.add(ja, jb)) == [(x + y) % p for x, y in zip(a, b)]
    assert canon(f.sub(ja, jb)) == [(x - y) % p for x, y in zip(a, b)]
    assert canon(f.mont_mul(f.add(ja, jb), f.sub(ja, jb))) == [
        (x + y) * (x - y) * cfg.rinv % p for x, y in zip(a, b)
    ]


def test_batched_2d():
    a2 = jnp.stack([JA[:8], JB[:8]])  # [2, 8, NW]
    out = F.add(a2, a2)
    assert out.shape == (2, 8, NW)
    assert _canon(out[0]) == [(a + a) % P for a in A[:8]]
