"""Pallas fused point-add kernel parity tests (interpret mode on CPU).

The TPU analogue of the reference's kernel-level GPU unit tests
(``src/cuzk/wgsl/test/test_point.wgsl`` driven by ``tests/point.rs:125-187``):
the fused kernel must agree with the XLA CurveCtx path value-for-value
(mod p — the two paths use different but equally-bounded balanced limb
encodings).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from msm_tpu.ops.curve import PointBatch, get_curve_ctx
from msm_tpu.ops.pallas_curve import make_point_add
from msm_tpu.params import BN254, MsmConfig

CFG = MsmConfig(curve=BN254)


def _rand_limbs(rng, shape, signed=False):
    lo = -CFG.mask if signed else 0
    return jnp.asarray(
        rng.integers(lo, CFG.mask, size=shape + (CFG.num_words,)),
        dtype=jnp.int32,
    )


@pytest.mark.parametrize(
    "curve_name",
    ["bn254", pytest.param("bls12_377", marks=pytest.mark.slow)],
)
def test_pallas_add_karatsuba_matches_xla(curve_name):
    """Difference-Karatsuba phase-1 (cfg.karatsuba) vs the XLA CurveCtx:
    value parity on random balanced limbs. BLS12-377 is the tightest
    eligible budget (L=30: pre-mid-sweep columns within ~3% of int32)."""
    from msm_tpu.params import CURVES

    cfg = MsmConfig(curve=CURVES[curve_name], karatsuba=True)
    ec = get_curve_ctx(MsmConfig(curve=CURVES[curve_name]))
    rng = np.random.default_rng(17)
    B = 256

    def rl(signed=False):
        lo = -cfg.mask if signed else 0
        return jnp.asarray(
            rng.integers(lo, cfg.mask, size=(B, cfg.num_words)),
            dtype=jnp.int32,
        )

    a = PointBatch(rl(), rl(True), rl())
    b = PointBatch(rl(), rl(True), rl())
    want = ec.add(a, b)
    kern = make_point_add(cfg, tile=128, interpret=True)
    gx, gy, gz = kern(a.x, a.y, a.z, b.x, b.y, b.z)
    for w, g in zip(want, (gx, gy, gz)):
        assert bool(jnp.all(ec.f.eq(w, g)))
    # the kara exit contract matches _phase1's: fully swept + renormed,
    # so chained use keeps the kernel-wide magnitude invariant
    for g in (gx, gy, gz):
        assert int(jnp.abs(g).max()) < 1 << (cfg.word_size + 2)


@pytest.mark.parametrize("signed", [False, True])
def test_pallas_add_matches_xla(signed):
    ec = get_curve_ctx(CFG)
    rng = np.random.default_rng(3 if signed else 4)
    B = 256
    a = PointBatch(
        _rand_limbs(rng, (B,)), _rand_limbs(rng, (B,), signed), _rand_limbs(rng, (B,))
    )
    b = PointBatch(
        _rand_limbs(rng, (B,)), _rand_limbs(rng, (B,), signed), _rand_limbs(rng, (B,))
    )
    want = ec.add(a, b)
    kern = make_point_add(CFG, tile=128, interpret=True)
    gx, gy, gz = kern(a.x, a.y, a.z, b.x, b.y, b.z)
    for w, g in zip(want, (gx, gy, gz)):
        assert bool(jnp.all(ec.f.eq(w, g)))


def test_pallas_add_on_curve_points():
    """Real curve points incl. identity / doubling / inverse operands — the
    complete-formula edge cases (reference test_point_add_identity,
    tests/point.rs:141-155)."""
    from msm_tpu.oracle.pyecc import Curve

    ec = get_curve_ctx(CFG)
    cv = Curve(CFG.curve)
    pts = cv.sample_points(8, seed=9)
    aff = [cv.to_affine(p) for p in pts]
    f = ec.f
    import msm_tpu.utils.limbs as L

    def to_mont_batch(coords):
        arr = jnp.asarray(
            L.ints_to_limbs([c for c in coords], CFG.word_size, CFG.num_words),
            dtype=jnp.int32,
        )
        return f.to_mont(arr)

    xs = to_mont_batch([a[0] for a in aff] * 16)
    ys = to_mont_batch([a[1] for a in aff] * 16)
    p = ec.from_affine_mont(xs, ys)
    ident = ec.identity((128,))
    q = PointBatch(  # mix: identity, same point (doubling), negated (P + -P)
        jnp.where(jnp.arange(128)[:, None] % 3 == 0, ident.x, p.x),
        jnp.where(
            jnp.arange(128)[:, None] % 3 == 0,
            ident.y,
            jnp.where(jnp.arange(128)[:, None] % 3 == 1, p.y, f.neg(p.y)),
        ),
        jnp.where(jnp.arange(128)[:, None] % 3 == 0, ident.z, p.z),
    )
    want = ec.add(p, q)
    kern = make_point_add(CFG, tile=128, interpret=True)
    gx, gy, gz = kern(p.x, p.y, p.z, q.x, q.y, q.z)
    got = PointBatch(gx, gy, gz)
    assert bool(jnp.all(ec.eq(want, got)))
