"""Pallas TPU kernel: fused two-phase bucket reduction (cuZK stage 4, BPR).

The reference's ``bpr.template.wgsl`` runs 256 threads per subtask, each
descending 128 buckets to accumulate a running sum m and a sum-of-sums g
(stage_1), then adds ``m * s`` corrections (stage_2). The XLA version in
``ops/scan.bucket_reduce_blocked`` maps this to a lax.scan over Bl steps of
T-lane point adds — 2 generic Pallas add calls per step plus HBM round-trips
of both accumulators. This kernel fuses phase 1: the (m, g) pair lives in
VMEM scratch across all Bl grid steps; each step does two projective adds
(RCB16 complete) back to back without leaving VMEM.

Grid: (T/tile, Bl); the bucket operand arrives DESCENDING via the index map
(block b reads input step Bl-1-b), matching the running-sum identity
W = sum_t g_t + Bl * sum_t t*m_t handled by the caller.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from msm_tpu.ops.pallas_curve import _rcb16_add, aux_b3_limbs
from msm_tpu.params import MsmConfig
from msm_tpu.utils.limbs import int_to_limbs

DEFAULT_TILE = 512


@functools.lru_cache(maxsize=None)
def make_bpr_phase1(
    cfg: MsmConfig,
    Bl: int,
    T: int,
    tile: int = DEFAULT_TILE,
    interpret: bool = False,
):
    """Build the fused phase-1 reduction.

    Input: buckets arranged [Bl, T, L] x3 (steps-major, ASCENDING in-block —
    the kernel iterates them descending). Output: (m, g) as six [T, L]
    arrays: m = per-lane block sum, g = per-lane sum of running sums.
    """
    tile = min(tile, T)
    L = cfg.num_words
    aux_np = aux_b3_limbs(cfg)
    q_np = int_to_limbs(cfg.curve.modulus, cfg.word_size, L).astype(np.int32)[
        :, None
    ]
    rm_np = int_to_limbs(cfg.r, cfg.word_size, L).astype(np.int32)[:, None]
    add_points = _rcb16_add(cfg)

    def kernel(q, b3m, rm, bx, by, bz, omx, omy, omz, ogx, ogy, ogz,
               mx, my, mz, gx, gy, gz, mont_acc):
        b = pl.program_id(1)

        @pl.when(b == 0)
        def _():
            for ref in (mx, mz, gx, gz):
                ref[:] = jnp.zeros_like(ref)
            my[:] = rm[:] + jnp.zeros_like(my)
            gy[:] = rm[:] + jnp.zeros_like(gy)

        sx, sy, sz = bx[0].T, by[0].T, bz[0].T  # [L, tile]
        nmx, nmy, nmz = add_points(
            q[:], b3m[:], mont_acc, mx[:], my[:], mz[:], sx, sy, sz
        )
        mx[:], my[:], mz[:] = nmx, nmy, nmz
        ngx, ngy, ngz = add_points(
            q[:], b3m[:], mont_acc, gx[:], gy[:], gz[:], nmx, nmy, nmz
        )
        gx[:], gy[:], gz[:] = ngx, ngy, ngz
        omx[0], omy[0], omz[0] = nmx.T, nmy.T, nmz.T
        ogx[0], ogy[0], ogz[0] = ngx.T, ngy.T, ngz.T

    def bpr_phase1(bx, by, bz):
        assert bx.shape == (Bl, T, L), (bx.shape, (Bl, T, L))
        # lanes beyond the last full tile would silently never run (the
        # grid floor-divides) — reject ragged thread counts outright
        assert T % tile == 0, (T, tile)
        grid = (T // tile, Bl)
        # descending over the block: grid step b reads input step Bl-1-b
        inspec = pl.BlockSpec(
            (1, tile, L), lambda t, b: (Bl - 1 - b, t, 0),
            memory_space=pltpu.VMEM,
        )
        outspec = pl.BlockSpec(
            (1, tile, L), lambda t, b: (0, t, 0), memory_space=pltpu.VMEM
        )
        cspec = pl.BlockSpec((L, 1), lambda t, b: (0, 0), memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((1, T, L), jnp.int32)
        scr = pltpu.VMEM((L, tile), jnp.int32)
        outs = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[cspec, cspec, cspec] + [inspec] * 3,
            out_specs=(outspec,) * 6,
            out_shape=(out_shape,) * 6,
            scratch_shapes=[scr] * 6 + [
                pltpu.VMEM((2 * L + 1, tile), jnp.int32)
            ],
            interpret=interpret,
        )(jnp.asarray(q_np), jnp.asarray(aux_np), jnp.asarray(rm_np), bx, by, bz)
        m = tuple(o[0] for o in outs[:3])
        g = tuple(o[0] for o in outs[3:])
        return m, g

    return bpr_phase1
