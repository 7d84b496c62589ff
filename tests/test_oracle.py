"""Oracle self-consistency tests.

The pyecc Jacobian group ops are cross-checked against group axioms and
against affine math; the Pippenger oracle is differential-tested against the
naive sum-of-scalar-muls oracle (the role of `cpu_msm` cross-checks in
reference ``tests/cuzk.rs:90-94``).
"""

import pytest

from msm_tpu.oracle.pyecc import Curve, IDENTITY, JPoint
from msm_tpu.params import BLS12_377, BN254, PALLAS


@pytest.fixture(scope="module", params=["bn254", "bls12_377", "pallas"])
def cv(request):
    return Curve({"bn254": BN254, "bls12_377": BLS12_377, "pallas": PALLAS}[request.param])


def test_generator_on_curve(cv):
    assert cv.on_curve(cv.g)


def test_group_axioms(cv):
    g = cv.g
    g2 = cv.double(g)
    g3 = cv.add(g2, g)
    g4a = cv.double(g2)
    g4b = cv.add(g3, g)
    assert cv.on_curve(g3) and cv.on_curve(g4a)
    assert cv.eq(g4a, g4b)
    # identity
    assert cv.eq(cv.add(g, IDENTITY), g)
    assert cv.eq(cv.add(IDENTITY, g), g)
    # inverse: P + (-P) = 0
    assert cv.add(g, cv.neg(g)).is_identity()
    # commutativity on distinct points
    assert cv.eq(cv.add(g2, g3), cv.add(g3, g2))
    # doubling through add path: add(P, P) must equal double(P)
    assert cv.eq(cv.add(g3, g3), cv.double(g3))


def test_scalar_mul(cv):
    g = cv.g
    assert cv.scalar_mul(g, 0).is_identity()
    assert cv.eq(cv.scalar_mul(g, 1), g)
    assert cv.eq(cv.scalar_mul(g, 5), cv.add(cv.double(cv.double(g)), g))
    # order annihilates
    assert cv.scalar_mul(g, cv.order).is_identity()


def test_msm_pippenger_vs_naive(cv):
    n = 17
    pts = cv.sample_points(n, seed=3)
    ks = cv.sample_scalars(n, seed=4)
    assert cv.eq(cv.msm(pts, ks), cv.msm_naive(pts, ks))


def test_msm_edge_scalars():
    cv = Curve(BN254)
    pts = cv.sample_points(4, seed=7)
    ks = [0, 1, cv.order - 1, (1 << 255) % cv.order]
    assert cv.eq(cv.msm(pts, ks), cv.msm_naive(pts, ks))


def test_msm_empty_and_zero():
    cv = Curve(BN254)
    assert cv.msm([], []).is_identity()
    pts = cv.sample_points(3, seed=9)
    assert cv.msm(pts, [0, 0, 0]).is_identity()
