"""Parity tests for the benchmarkable Montgomery-multiplier variants.

The reference ships several alternate multipliers swept over word sizes
13..16 (``src/cuzk/utils.rs:399-431``; ``mont_pro_cios.template.wgsl:30-101``,
``mont_pro_modified.template.wgsl:23-62``). The TPU analogue is
``mont_mul_eager`` — a uint32 eager-carry classic CIOS that supports the full
sweepable range (the production lazy multiplier is budget-limited to w=13).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from msm_tpu.ops.field import mont_mul_eager
from msm_tpu.params import BN254, MsmConfig
from msm_tpu.utils.limbs import int_to_limbs, limbs_to_int


def _rand_field(rng, p):
    return int.from_bytes(rng.bytes(40), "little") % p


@pytest.mark.parametrize("w", [13, 14, 15, 16])
def test_mont_mul_eager_parity(w):
    cfg = MsmConfig(curve=BN254, word_size=w)
    p = BN254.modulus
    L = cfg.num_words
    R = 1 << (w * L)
    rinv = pow(R, -1, p)
    rng = np.random.default_rng(1000 + w)
    vals_a = [0, 1, p - 1, R % p] + [_rand_field(rng, p) for _ in range(28)]
    vals_b = [p - 1, 0, p - 1, R % p] + [_rand_field(rng, p) for _ in range(28)]
    a = jnp.asarray(
        np.stack([int_to_limbs(v, w, L) for v in vals_a]), jnp.int32
    )
    b = jnp.asarray(
        np.stack([int_to_limbs(v, w, L) for v in vals_b]), jnp.int32
    )
    out = np.asarray(mont_mul_eager(cfg, a, b))
    for i, (va, vb) in enumerate(zip(vals_a, vals_b)):
        want = va * vb * rinv % p
        got = limbs_to_int(out[i], w)
        assert got == want, (w, i, va, vb)
        # canonical-form contract: every limb in range, value < p
        assert got < p
        assert (out[i] >= 0).all() and (out[i] < (1 << w)).all()
