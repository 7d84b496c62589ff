"""Pallas TPU kernel: fused blocked prefix-scan of point additions.

This is the SMVP-side workhorse (cuZK stage 3 — the reference's per-bucket
CSC walk, ``smvp.template.wgsl:31-117``, re-expressed as a prefix scan over
bucket-sorted points). It fuses the ENTIRE C-step row scan into one Pallas
program:

- the running accumulator lives in VMEM scratch across all C grid steps of
  a row tile (the XLA ``lax.scan`` version re-reads/re-writes it through HBM
  and pays per-step kernel-call transposes);
- the scanned operand is an **affine** point (the sorted input points all
  have z = 1 in Montgomery form), so each step uses the RCB16 *mixed*
  addition (Algorithm 8, a=0): 13 Montgomery muls incl. the two b3-muls vs
  15 for the projective Algorithm 7 — and two fewer input transposes. Alg 8
  is complete for any P1 (incl. identity) as long as P2 is finite, which
  sorted real points always are (padding uses the generator, msm.rs:63-69).

Grid: (R/tile, C) with C innermost; the accumulator scratch re-initializes
to the identity at c==0 (new row tile). Outputs are the inclusive prefixes
[C, R, L] — exactly ``ops/scan.blocked_prefix_scan``'s row_prefix — whose
last step also serves as the row totals.
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

DEFAULT_TILE = 256


def _rcb16_madd(cfg: MsmConfig):
    """RCB16 Algorithm 8 (a=0): projective P1 + affine P2 on limbs-first
    [L, T] arrays. Returns (x3, y3, z3)."""

    def madd(q_col, b3m_col, acc_ref, x1, y1, z1, x2, y2):
        f_add, f_sub, f_mul = _make_field_ops(cfg, q_col, acc_ref)

        def mul_b3(t):
            return f_mul(t, b3m_col + jnp.zeros_like(t))

        t0 = f_mul(x1, x2)
        t1 = f_mul(y1, y2)
        t3 = f_mul(f_add(x2, y2), f_add(x1, y1))
        t3 = f_sub(t3, f_add(t0, t1))  # x1y2 + x2y1
        t4 = f_add(f_mul(y2, z1), y1)  # y1 + y2z1
        y3 = f_add(f_mul(x2, z1), x1)  # x1 + x2z1
        t0_3 = f_add(f_add(t0, t0), t0)  # 3x1x2
        t2 = mul_b3(z1)
        z3 = f_add(t1, t2)
        t1 = f_sub(t1, t2)
        y3 = mul_b3(y3)
        x3 = f_sub(f_mul(t3, t1), f_mul(t4, y3))
        y3 = f_add(f_mul(y3, t0_3), f_mul(t1, z3))
        z3 = f_add(f_mul(z3, t4), f_mul(t0_3, t3))
        return x3, y3, z3

    return madd


@functools.lru_cache(maxsize=None)
def make_scan_rows(
    cfg: MsmConfig,
    C: int,
    R: int,
    tile: int = DEFAULT_TILE,
    interpret: bool = False,
):
    """Build the fused row scan.

    Takes affine sorted points as two [C, R, L] arrays (step-major: element
    (c, r) is the c-th point of lane r); returns the inclusive point-prefix
    per lane as three [C, R, L] arrays (Montgomery projective limbs).
    """
    L = cfg.num_words
    b3 = (3 * cfg.curve.b * cfg.r) % cfg.curve.modulus
    b3m_np = int_to_limbs(b3, cfg.word_size, L).astype(np.int32)[:, None]
    q_np = int_to_limbs(cfg.curve.modulus, cfg.word_size, L).astype(np.int32)[
        :, None
    ]
    # identity = (0 : 1 : 0) in Montgomery form -> y = R mod p
    rm_np = int_to_limbs(cfg.r, cfg.word_size, L).astype(np.int32)[:, None]
    madd = _rcb16_madd(cfg)

    def kernel(q, b3m, rm, px, py, ox, oy, oz, accx, accy, accz, mont_acc):
        c = pl.program_id(1)

        @pl.when(c == 0)
        def _():
            accx[:] = jnp.zeros_like(accx)
            accy[:] = rm[:] + jnp.zeros_like(accy)
            accz[:] = jnp.zeros_like(accz)

        x2 = px[0].T  # [L, tile]
        y2 = py[0].T
        x3, y3, z3 = madd(
            q[:], b3m[:], mont_acc, accx[:], accy[:], accz[:], x2, y2
        )
        accx[:] = x3
        accy[:] = y3
        accz[:] = z3
        ox[0] = x3.T
        oy[0] = y3.T
        oz[0] = z3.T

    def scan_rows(px, py):
        assert px.shape == (C, R, L), (px.shape, (C, R, L))
        assert R % tile == 0, (R, tile)
        grid = (R // tile, C)
        spec = pl.BlockSpec(
            (1, tile, L), lambda r, c: (c, r, 0), memory_space=pltpu.VMEM
        )
        cspec = pl.BlockSpec(
            (L, 1), lambda r, c: (0, 0), memory_space=pltpu.VMEM
        )
        out_shape = jax.ShapeDtypeStruct((C, R, L), jnp.int32)
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[cspec, cspec, cspec, spec, spec],
            out_specs=(spec, spec, spec),
            out_shape=(out_shape, out_shape, out_shape),
            scratch_shapes=[
                pltpu.VMEM((L, tile), jnp.int32),
                pltpu.VMEM((L, tile), jnp.int32),
                pltpu.VMEM((L, tile), jnp.int32),
                pltpu.VMEM((2 * L + 1, tile), jnp.int32),
            ],
            interpret=interpret,
        )(jnp.asarray(q_np), jnp.asarray(b3m_np), jnp.asarray(rm_np), px, py)

    return scan_rows
