"""Twisted-Edwards dormant-capability tests (Baby Jubjub, EIP-2494).

The reference ships this library unused (twisted_ec.template.wgsl); here
it is live and verified against group laws and a pure-int model.
"""

import jax.numpy as jnp

from msm_tpu.ops.twisted_ec import BABY_JUBJUB, get_twisted_ctx

# EIP-2494 base point (generator of the prime-order subgroup * cofactor 8)
BX = 5299619240641551281634865583518297030282874472190772894086521144482721001553
BY = 16950150798460657717958625567821834550301663161624707787222815936182638968203


def _affine(ctx, p):
    f = ctx.f
    import numpy as np

    from msm_tpu.utils.limbs import limbs_to_int

    zinv = f.inv_standard(f.canonical(f.from_mont(p.z)))
    q = ctx.spec.modulus
    x = limbs_to_int(
        np.asarray(f.canonical(f.from_mont(p.x)))[0], ctx.cfg.word_size
    )
    z = limbs_to_int(
        np.asarray(f.canonical(f.from_mont(p.z)))[0], ctx.cfg.word_size
    )
    y = limbs_to_int(
        np.asarray(f.canonical(f.from_mont(p.y)))[0], ctx.cfg.word_size
    )
    zi = pow(z, -1, q)
    return x * zi % q, y * zi % q


def _on_curve(spec, x, y):
    q = spec.modulus
    return (spec.a * x * x + y * y) % q == (1 + spec.d * x * x * y * y) % q


def test_base_point_on_curve():
    assert _on_curve(BABY_JUBJUB, BX, BY)


def test_group_laws():
    ctx = get_twisted_ctx(BABY_JUBJUB)
    b = ctx.from_affine(BX, BY, batch_shape=(1,))
    ident = ctx.identity((1,))
    # P + 0 == P
    assert bool(jnp.all(ctx.eq(ctx.add(b, ident), b)))
    # P + P == double(P)  (completeness of add-2008-hwcd)
    assert bool(jnp.all(ctx.eq(ctx.add(b, b), ctx.double(b))))
    # P + (-P) == 0
    assert bool(jnp.all(ctx.eq(ctx.add(b, ctx.neg(b)), ident)))
    # (P+P)+P == P+(P+P)
    d2 = ctx.double(b)
    assert bool(jnp.all(ctx.eq(ctx.add(d2, b), ctx.add(b, d2))))


def test_double_matches_int_model():
    ctx = get_twisted_ctx(BABY_JUBJUB)
    q, a, d = BABY_JUBJUB.modulus, BABY_JUBJUB.a, BABY_JUBJUB.d
    b = ctx.from_affine(BX, BY, batch_shape=(1,))
    x2, y2 = _affine(ctx, ctx.double(b))
    # affine doubling: x3 = 2xy / (a x^2 + y^2), y3 = (y^2 - a x^2)/(2 - a x^2 - y^2)
    axx = a * BX * BX % q
    yy = BY * BY % q
    x3 = 2 * BX * BY % q * pow((axx + yy) % q, -1, q) % q
    y3 = (yy - axx) % q * pow((2 - axx - yy) % q, -1, q) % q
    assert (x2, y2) == (x3, y3)
    assert _on_curve(BABY_JUBJUB, x2, y2)
