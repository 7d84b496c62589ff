"""Pallas TPU kernel: fused exclusive prefix point-sums over scan-row totals.

Role: the row-offsets stage of the blocked SMVP scan (cuZK stage-3 epilogue).
The XLA version (``ops/scan.exclusive_prefix_points``) runs a 4-step
``lax.scan`` + a 12-level Hillis–Steele ladder — ~25 separate point-add
dispatches per subtask, each a full HBM round-trip of the [R] accumulator
(~30-40 ms per 2^20 MSM on v5e, almost all dispatch/copy overhead). Here the
whole computation runs in ONE kernel with everything resident in VMEM:

- lane b owns the contiguous row chunk [b*C2, (b+1)*C2);
- pass 1: serial fori over the C2 in-chunk steps accumulating per-lane totals;
- a masked-roll Hillis–Steele ladder (log2(B2) levels) turns lane totals into
  exclusive cross-lane offsets (``pltpu.roll`` + identity fill — the in-VMEM
  analogue of ``ops/scan._shift_in_identity``);
- pass 2: re-runs the serial accumulation seeded with each lane's offset,
  emitting the exclusive prefix for every row.

Work: 2R + B2*log2(B2) complete adds (RCB16 Algorithm 7) vs the XLA path's
~2R + 3*LANES*log adds — same order, but 1 dispatch instead of ~25 and zero
HBM round-trips. Reference analogue: none (the reference's transpose produces
CSC col_ptr by serial prefix sum, ``transpose.template.wgsl:58-61``).
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

DEFAULT_LANES = 1024


@functools.lru_cache(maxsize=None)
def make_row_offsets(
    cfg: MsmConfig,
    R: int,
    lanes: int = DEFAULT_LANES,
    interpret: bool = False,
):
    """Build the fused exclusive-prefix: three [L, R] limbs-first coordinate
    arrays (Montgomery projective, balanced limbs) -> three [R, L] arrays
    where out[r] = sum_{r' < r} in[r'] (point addition; out[0] = identity)."""
    B2 = min(lanes, R)
    assert R % B2 == 0 and B2 % 128 == 0, (R, B2)
    C2 = R // B2
    L = cfg.num_words
    nlev = (B2 - 1).bit_length()
    aux_np = aux_b3_limbs(cfg)
    q_np = int_to_limbs(cfg.curve.modulus, cfg.word_size, L).astype(np.int32)[
        :, None
    ]
    rm_np = int_to_limbs(cfg.r, cfg.word_size, L).astype(np.int32)[:, None]
    add_points = _rcb16_add(cfg)

    def kernel(q, b3m, rm, ix, iy, iz, ox, oy, oz, ax, ay, az, mont_acc):
        ident_y = rm[:] + jnp.zeros((L, B2), jnp.int32)
        zero = jnp.zeros((L, B2), jnp.int32)
        lane = jax.lax.broadcasted_iota(jnp.int32, (L, B2), 1)

        def add(p, s):
            return add_points(q[:], b3m[:], mont_acc, *p, *s)

        # pass 1: per-lane totals of the C2 chunk steps
        ax[:], ay[:], az[:] = zero, ident_y, zero

        def tot_body(c, _):
            s = (
                ix[:, pl.ds(c, 1), :][:, 0, :],
                iy[:, pl.ds(c, 1), :][:, 0, :],
                iz[:, pl.ds(c, 1), :][:, 0, :],
            )
            ax[:], ay[:], az[:] = add((ax[:], ay[:], az[:]), s)
            return 0

        jax.lax.fori_loop(0, C2, tot_body, 0)

        # Hillis-Steele: inclusive cross-lane prefix of the totals
        def shift_ident(p, k):
            m = lane < k
            return (
                jnp.where(m, 0, pltpu.roll(p[0], k, 1)),
                jnp.where(m, ident_y, pltpu.roll(p[1], k, 1)),
                jnp.where(m, 0, pltpu.roll(p[2], k, 1)),
            )

        def lev_body(j, _):
            k = jnp.int32(1) << j
            cur = (ax[:], ay[:], az[:])
            ax[:], ay[:], az[:] = add(cur, shift_ident(cur, k))
            return 0

        jax.lax.fori_loop(0, nlev, lev_body, 0)
        # exclusive: shift the inclusive prefix right one lane (no add)
        ex, ey, ez = shift_ident((ax[:], ay[:], az[:]), jnp.int32(1))
        ax[:], ay[:], az[:] = ex, ey, ez

        # pass 2: re-accumulate, seeded with the lane offset, writing the
        # exclusive prefix for every row
        def out_body(c, _):
            ox[:, pl.ds(c, 1), :] = ax[:][:, None, :]
            oy[:, pl.ds(c, 1), :] = ay[:][:, None, :]
            oz[:, pl.ds(c, 1), :] = az[:][:, None, :]
            s = (
                ix[:, pl.ds(c, 1), :][:, 0, :],
                iy[:, pl.ds(c, 1), :][:, 0, :],
                iz[:, pl.ds(c, 1), :][:, 0, :],
            )
            ax[:], ay[:], az[:] = add((ax[:], ay[:], az[:]), s)
            return 0

        jax.lax.fori_loop(0, C2, out_body, 0)

    def row_offsets(tx, ty, tz):
        assert tx.shape == (L, R), (tx.shape, (L, R))
        # lane b owns rows [b*C2, (b+1)*C2): view (l, c, b) = in[l, b*C2 + c]
        # (minor dim B2 keeps the VMEM tiling unpadded)
        def prep(a):
            return a.reshape(L, B2, C2).swapaxes(1, 2)

        spec = pl.BlockSpec(
            (L, C2, B2), lambda: (0, 0, 0), memory_space=pltpu.VMEM
        )
        cspec = pl.BlockSpec((L, 1), lambda: (0, 0), memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((L, C2, B2), jnp.int32)
        outs = pl.pallas_call(
            kernel,
            grid=(),
            in_specs=[cspec, cspec, cspec] + [spec] * 3,
            out_specs=(spec,) * 3,
            out_shape=(out_shape,) * 3,
            scratch_shapes=[pltpu.VMEM((L, B2), jnp.int32)] * 3
            + [pltpu.VMEM((2 * L + 1, B2), jnp.int32)],
            interpret=interpret,
        )(
            jnp.asarray(q_np),
            jnp.asarray(aux_np),
            jnp.asarray(rm_np),
            prep(tx),
            prep(ty),
            prep(tz),
        )
        # back to [R, L] batch-last layout for gather_points consumers
        return tuple(
            o.swapaxes(1, 2).reshape(L, R).T for o in outs
        )

    return row_offsets


@functools.lru_cache(maxsize=None)
def make_point_total(
    cfg: MsmConfig,
    N: int,
    lanes: int = DEFAULT_LANES,
    interpret: bool = False,
):
    """Build a fused point-sum reduction: three [N, L] coordinate arrays
    (Montgomery projective, balanced) -> three [L, 128] arrays whose every
    lane holds sum_i in[i].

    Used by the telescoped bucket reduction (see scan.window_sum_from_pe):
    a serial VMEM pass over N/lanes chunk steps + a circular-roll all-reduce
    ladder — one dispatch for what the Hillis tree does in ~2*log2(N)."""
    B2 = min(lanes, N)
    assert N % B2 == 0 and B2 % 128 == 0, (N, B2)
    C2 = N // B2
    L = cfg.num_words
    nlev = (B2 - 1).bit_length()
    aux_np = aux_b3_limbs(cfg)
    q_np = int_to_limbs(cfg.curve.modulus, cfg.word_size, L).astype(np.int32)[
        :, None
    ]
    rm_np = int_to_limbs(cfg.r, cfg.word_size, L).astype(np.int32)[:, None]
    add_points = _rcb16_add(cfg)

    def kernel(q, b3m, rm, ix, iy, iz, ox, oy, oz, ax, ay, az, mont_acc):
        c = pl.program_id(0)

        def add(p, s):
            return add_points(q[:], b3m[:], mont_acc, *p, *s)

        @pl.when(c == 0)
        def _():
            zero = jnp.zeros((L, B2), jnp.int32)
            ax[:], ay[:], az[:] = zero, rm[:] + zero, zero

        ax[:], ay[:], az[:] = add(
            (ax[:], ay[:], az[:]), (ix[0], iy[0], iz[0])
        )

        @pl.when(c == C2 - 1)
        def _():
            # circular all-reduce: after log2(B2) rotate-add levels every
            # lane holds the full sum (rotation is exact, no masking)
            def lev_body(j, _):
                k = jnp.int32(1) << j
                cur = (ax[:], ay[:], az[:])
                rot = tuple(pltpu.roll(t, k, 1) for t in cur)
                ax[:], ay[:], az[:] = add(cur, rot)
                return 0

            jax.lax.fori_loop(0, nlev, lev_body, 0)
            ox[:] = ax[:, :128]
            oy[:] = ay[:, :128]
            oz[:] = az[:, :128]

    def point_total(px, py, pz):
        assert px.shape == (N, L), (px.shape, (N, L))

        def prep(a):  # [N, L] -> [C2, L, B2] (sum is order-free)
            return a.reshape(C2, B2, L).swapaxes(1, 2)

        # grid streams one [1, L, B2] chunk per step (whole-array blocks
        # overflow the 16 MB VMEM stack at N=32768 under vmap)
        spec = pl.BlockSpec(
            (1, L, B2), lambda c: (c, 0, 0), memory_space=pltpu.VMEM
        )
        ospec = pl.BlockSpec(
            (L, 128), lambda c: (0, 0), memory_space=pltpu.VMEM
        )
        cspec = pl.BlockSpec((L, 1), lambda c: (0, 0), memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((L, 128), jnp.int32)
        return pl.pallas_call(
            kernel,
            grid=(C2,),
            in_specs=[cspec, cspec, cspec] + [spec] * 3,
            out_specs=(ospec,) * 3,
            out_shape=(out_shape,) * 3,
            scratch_shapes=[pltpu.VMEM((L, B2), jnp.int32)] * 3
            + [pltpu.VMEM((2 * L + 1, B2), jnp.int32)],
            interpret=interpret,
        )(
            jnp.asarray(q_np),
            jnp.asarray(aux_np),
            jnp.asarray(rm_np),
            prep(px),
            prep(py),
            prep(pz),
        )

    return point_total


@functools.lru_cache(maxsize=None)
def make_horner_ladder(
    cfg: MsmConfig, S: int, chunk: int, interpret: bool = False
):
    """Fused device Horner over [S] Montgomery window sums:

        result = sum_s 2^(chunk*s) * W_s

    computed as a masked doubling ladder (lane s doubles in rounds
    k < chunk*s; chunk*(S-1) rounds on one 128-lane tile) followed by an
    inclusive cross-lane Hillis-Steele point prefix whose last lane is the
    total. ~(chunk*(S-1) + 7) complete adds on a single tile: ~1 ms, one
    dispatch — the XLA route costs ~290 ms (271 point ops, each of whose
    mont-muls lowers to a 20-step while loop), and the python-int host
    Horner ~15-30 ms behind the relay fetch (reference finishes on the
    host at msm.rs:409-416 without a tunnel in the way).

    Input/output: three [L, S] / [L, 128] limbs-first coordinate arrays
    (the wrapper pads lanes S..127 with the identity, which is neutral in
    the prefix); the caller reads lane 127 of the output."""
    B = 128
    assert S <= B, S
    L = cfg.num_words
    nlev = 7  # log2(128)
    aux_np = aux_b3_limbs(cfg)
    q_np = int_to_limbs(cfg.curve.modulus, cfg.word_size, L).astype(np.int32)[
        :, None
    ]
    rm_np = int_to_limbs(cfg.r, cfg.word_size, L).astype(np.int32)[:, None]
    add_points = _rcb16_add(cfg)

    def kernel(q, b3m, rm, wx, wy, wz, ox, oy, oz, ax, ay, az, mont_acc):
        ident_y = rm[:] + jnp.zeros((L, B), jnp.int32)
        lane = jax.lax.broadcasted_iota(jnp.int32, (L, B), 1)

        def add(p, s):
            return add_points(q[:], b3m[:], mont_acc, *p, *s)

        ax[:], ay[:], az[:] = wx[:], wy[:], wz[:]

        def dbl_body(k, _):
            cur = (ax[:], ay[:], az[:])
            d = add(cur, cur)  # complete doubling (RCB16 Alg 7 handles P=Q)
            m = k < (chunk * lane)
            ax[:] = jnp.where(m, d[0], cur[0])
            ay[:] = jnp.where(m, d[1], cur[1])
            az[:] = jnp.where(m, d[2], cur[2])
            return 0

        jax.lax.fori_loop(0, chunk * (S - 1), dbl_body, 0)

        def shift_ident(p, k):
            m = lane < k
            return (
                jnp.where(m, 0, pltpu.roll(p[0], k, 1)),
                jnp.where(m, ident_y, pltpu.roll(p[1], k, 1)),
                jnp.where(m, 0, pltpu.roll(p[2], k, 1)),
            )

        def lev_body(j, _):
            k = jnp.int32(1) << j
            cur = (ax[:], ay[:], az[:])
            ax[:], ay[:], az[:] = add(cur, shift_ident(cur, k))
            return 0

        jax.lax.fori_loop(0, nlev, lev_body, 0)
        ox[:] = ax[:]
        oy[:] = ay[:]
        oz[:] = az[:]

    def horner(wx, wy, wz):
        assert wx.shape == (L, S), (wx.shape, (L, S))
        if S < B:  # identity-pad the lane tile
            zp = jnp.zeros((L, B - S), jnp.int32)
            yp = jnp.broadcast_to(
                jnp.asarray(rm_np), (L, B - S)
            ).astype(jnp.int32)
            wx = jnp.concatenate([wx, zp], axis=1)
            wy = jnp.concatenate([wy, yp], axis=1)
            wz = jnp.concatenate([wz, zp], axis=1)
        spec = pl.BlockSpec((L, B), lambda: (0, 0), memory_space=pltpu.VMEM)
        cspec = pl.BlockSpec((L, 1), lambda: (0, 0), memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((L, B), jnp.int32)
        outs = pl.pallas_call(
            kernel,
            grid=(),
            in_specs=[cspec, cspec, cspec] + [spec] * 3,
            out_specs=(spec,) * 3,
            out_shape=(out_shape,) * 3,
            scratch_shapes=[pltpu.VMEM((L, B), jnp.int32)] * 3
            + [pltpu.VMEM((2 * L + 1, B), jnp.int32)],
            interpret=interpret,
        )(
            jnp.asarray(q_np), jnp.asarray(aux_np), jnp.asarray(rm_np),
            wx, wy, wz,
        )
        return tuple(o[:, B - 1] for o in outs)  # [L] each: the total

    return horner
