"""Twisted-Edwards group ops (extended coordinates) — dormant capability.

Parity with the reference's unused twisted-Edwards WGSL library
(``src/cuzk/wgsl/curve/twisted_ec.template.wgsl:1-61`` — vestigial from the
BLS12-377 ZPrize ancestor, never referenced by ``ShaderManager``). Ported as
a live, tested module: complete extended-coordinate addition (add-2008-hwcd)
and doubling (dbl-2008-hwcd) for curves a*x^2 + y^2 = 1 + d*x^2*y^2,
batched over Montgomery limb tensors like the Weierstrass path.

Unlike short-Weierstrass complete formulas, twisted-Edwards addition with
a square `a`/non-square `d` is complete by construction — the historical
reason ZPrize MSM entries preferred these curves.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from msm_tpu.ops.field import FieldCtx
from msm_tpu.params import CurveSpec, MsmConfig
from msm_tpu.utils.limbs import int_to_limbs


@dataclass(frozen=True)
class TwistedEdwardsSpec:
    """a*x^2 + y^2 = 1 + d*x^2*y^2 over GF(modulus)."""

    name: str
    modulus: int
    a: int
    d: int


#: Baby Jubjub — the standard twisted-Edwards curve over BN254's scalar
#: field (EIP-2494 parameters).
BABY_JUBJUB = TwistedEdwardsSpec(
    name="baby_jubjub",
    modulus=21888242871839275222246405745257275088548364400416034343698204186575808495617,
    a=168700,
    d=168696,
)


class ExtPoint(NamedTuple):
    """Extended coordinates (X : Y : T : Z), T = X*Y/Z; each [..., L]."""

    x: jax.Array
    y: jax.Array
    t: jax.Array
    z: jax.Array


class TwistedEdwardsCtx:
    """Batched extended-coordinate group ops for one TE curve."""

    def __init__(self, spec: TwistedEdwardsSpec, word_size: int = 13):
        self.spec = spec
        # reuse the field stack via a wrapper CurveSpec (only the modulus
        # matters for field arithmetic; Weierstrass fields are unused)
        cfg = MsmConfig(
            curve=CurveSpec(
                name=f"_field_{spec.name}",
                modulus=spec.modulus,
                order=spec.modulus,
                a=0,
                b=0,
                gx=0,
                gy=0,
            ),
            word_size=word_size,
        )
        self.cfg = cfg
        self.f = FieldCtx(cfg)

        def mont_const(v: int) -> np.ndarray:
            return int_to_limbs(
                (v % spec.modulus) * cfg.r % spec.modulus,
                cfg.word_size,
                cfg.num_words,
            ).astype(np.int32)

        self.a_m = mont_const(spec.a)
        self.d_m = mont_const(spec.d)

    def identity(self, batch_shape: tuple = ()) -> ExtPoint:
        f = self.f
        zero = jnp.broadcast_to(f.zero_limbs, batch_shape + (f.L,))
        one = jnp.broadcast_to(f.r_limbs, batch_shape + (f.L,))
        return ExtPoint(zero, one, zero, one)

    def from_affine(self, x: int, y: int, batch_shape: tuple = ()) -> ExtPoint:
        """Affine ints -> extended Montgomery point (broadcast)."""
        f, p = self.f, self.spec.modulus

        def lift(v):
            m = int_to_limbs(
                v * self.cfg.r % p, self.cfg.word_size, f.L
            ).astype(np.int32)
            return jnp.broadcast_to(jnp.asarray(m), batch_shape + (f.L,))

        t = x * y % p
        return ExtPoint(lift(x), lift(y), lift(t), lift(1))

    def add(self, p: ExtPoint, q: ExtPoint) -> ExtPoint:
        """add-2008-hwcd (complete for a square, d non-square) — the
        reference's ``add_points`` (twisted_ec.template.wgsl:24-61)."""
        f = self.f
        A = f.mont_mul(p.x, q.x)
        B = f.mont_mul(p.y, q.y)
        C = f.mont_mul(f.mont_mul(p.t, q.t), self.d_m)
        D = f.mont_mul(p.z, q.z)
        E = f.mont_mul(f.add(p.x, p.y), f.add(q.x, q.y))
        E = f.sub(E, f.add(A, B))
        F = f.sub(D, C)
        G = f.add(D, C)
        H = f.sub(B, f.mont_mul(A, self.a_m))
        return ExtPoint(
            f.mont_mul(E, F), f.mont_mul(G, H), f.mont_mul(E, H), f.mont_mul(F, G)
        )

    def double(self, p: ExtPoint) -> ExtPoint:
        """dbl-2008-hwcd — the reference's ``double_point``
        (twisted_ec.template.wgsl:1-22)."""
        f = self.f
        A = f.mont_mul(p.x, p.x)
        B = f.mont_mul(p.y, p.y)
        C = f.double(f.mont_mul(p.z, p.z))
        D = f.mont_mul(A, self.a_m)
        E = f.mont_mul(f.add(p.x, p.y), f.add(p.x, p.y))
        E = f.sub(E, f.add(A, B))
        G = f.add(D, B)
        F = f.sub(G, C)
        H = f.sub(D, B)
        return ExtPoint(
            f.mont_mul(E, F), f.mont_mul(G, H), f.mont_mul(E, H), f.mont_mul(F, G)
        )

    def neg(self, p: ExtPoint) -> ExtPoint:
        f = self.f
        return ExtPoint(f.neg(p.x), p.y, f.neg(p.t), p.z)

    def eq(self, p: ExtPoint, q: ExtPoint) -> jax.Array:
        """Projective equality x1z2 == x2z1 and y1z2 == y2z1."""
        f = self.f
        xe = f.eq(f.mont_mul(p.x, q.z), f.mont_mul(q.x, p.z))
        ye = f.eq(f.mont_mul(p.y, q.z), f.mont_mul(q.y, p.z))
        return xe & ye


@functools.lru_cache(maxsize=None)
def get_twisted_ctx(spec: TwistedEdwardsSpec = BABY_JUBJUB) -> TwistedEdwardsCtx:
    return TwistedEdwardsCtx(spec)
