"""Pallas TPU kernel: batched Montgomery exponentiation (Fermat inversion).

The pair-compression path (``ops/pallas_compress.py``) needs one modular
inverse per lane chain: inv(m_last) with m_last a [L, R] batch of Montgomery
residues. The XLA ``FieldCtx.mont_pow`` route (254-step ``lax.scan`` whose
every step is itself a 20-step CIOS scan) measures ~60-126 ms per 2^20 MSM
on v5e — each of its ~7600 sequential HLO steps round-trips an 80 KB array
through HBM. This kernel runs the whole square-and-multiply chain in VMEM:
grid = one step per exponent bit (MSB first), the accumulator lives in a
VMEM scratch across steps, and the conditional multiply executes under
``pl.when`` (no wasted work on zero bits). ~380 fused CIOS multiplies, one
kernel dispatch: ~1 ms.

The exponent is STATIC (p-2 for Fermat inversion), shipped as a [NB, 1]
int32 bit array input so the kernel body compiles once per (cfg, R, e).

No reference analogue (the reference never inverts on the GPU); the CPU-side
equivalent is halo2curves' ``invert``. Montgomery-domain contract matches
``FieldCtx.mont_pow``: pow_mont(aR, e) = a^e * R.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from msm_tpu.ops.pallas_curve import _make_field_ops
from msm_tpu.params import MsmConfig
from msm_tpu.utils.limbs import int_to_limbs


@functools.lru_cache(maxsize=None)
def make_mont_pow(
    cfg: MsmConfig, R: int, e: int, interpret: bool = False
):
    """Build pow(base, e) for [L, R] Montgomery limb batches (limbs-first).

    R is the lane width (one VMEM-resident tile; callers keep R <= ~2048 so
    3 scratch/operand tiles fit VMEM comfortably). e must be >= 1.
    """
    assert e >= 1
    L = cfg.num_words
    bits_np = np.array(
        [[[int(c)]] for c in bin(e)[2:]], dtype=np.int32
    )  # [NB, 1, 1], MSB first (leading dim blocked; (1, 1) trailing block
    # equals the array's trailing dims, satisfying the Mosaic tiling rule)
    NB = bits_np.shape[0]
    q_np = int_to_limbs(cfg.curve.modulus, cfg.word_size, L).astype(
        np.int32
    )[:, None]
    rm_np = int_to_limbs(cfg.r, cfg.word_size, L).astype(np.int32)[:, None]

    def kernel(q, rm, bit, base, out, acc, mont_acc):
        i = pl.program_id(0)
        _, _, f_mul, _, _ = _make_field_ops(cfg, q[:], mont_acc)

        @pl.when(i == 0)
        def _():
            acc[:] = rm[:] + jnp.zeros_like(acc)

        sq = f_mul(acc[:], acc[:])
        b = bit[0, 0, 0]

        @pl.when(b != 0)
        def _():
            acc[:] = f_mul(sq, base[:])

        @pl.when(b == 0)
        def _():
            acc[:] = sq

        @pl.when(i == NB - 1)
        def _():
            out[:] = acc[:]

    def mont_pow(base: jax.Array) -> jax.Array:
        assert base.shape == (L, R), (base.shape, (L, R))
        cspec = pl.BlockSpec(
            (L, 1), lambda i: (0, 0), memory_space=pltpu.VMEM
        )
        bspec = pl.BlockSpec(
            (1, 1, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        )
        fspec = pl.BlockSpec(
            (L, R), lambda i: (0, 0), memory_space=pltpu.VMEM
        )
        return pl.pallas_call(
            kernel,
            grid=(NB,),
            in_specs=[cspec, cspec, bspec, fspec],
            out_specs=fspec,
            out_shape=jax.ShapeDtypeStruct((L, R), jnp.int32),
            scratch_shapes=[
                pltpu.VMEM((L, R), jnp.int32),
                pltpu.VMEM((2 * L + 1, R), jnp.int32),
            ],
            interpret=interpret,
        )(
            jnp.asarray(q_np),
            jnp.asarray(rm_np),
            jnp.asarray(bits_np),
            base,
        )

    return mont_pow
