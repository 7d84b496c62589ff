"""Pallas TPU kernels: batched-affine pair compression of the sorted stream.

Halves the fused scan's madd count by first adding ADJACENT SORTED PAIRS
with affine (z = 1) arithmetic at ~3.5 Montgomery muls per source point —
vs 11.5 for running them through the madd scan — using Montgomery batch
inversion along each lane's sequential chain for the shared 1/d:

    pair sum (x3, y3):  lam = num / d
                        x3  = lam^2 - x1 - x2
                        y3  = lam * (x1 - x3) - y1'
    d   = x2 - x1            (generic add)
        | 2 * y1'            (doubling: same point, same sign)
        | R (mont 1)         (P + (-P): flagged infinity, skipped downstream)
    num = y2' - y1'  |  3 * x1^2  |  don't-care

The compression is BUCKET-STRUCTURE-AGNOSTIC: every fixed pair (2i, 2i+1)
is summed whether or not a bucket boundary falls between them — the
compressed stream's prefix sums are still exact prefixes of the source
stream, and ``ops/scan.bucket_boundary_prefix`` corrects odd-aligned bucket
boundaries with a single-element add at extraction time (O(num_buckets)).

Production passes (``compressed_prefix_scan``): the batch inversion is
restructured in the FORWARD direction so pair emission fuses with the
point scan —

1. ``make_pair_suffix`` (reverse grid): suffix products
   s_j = d_j * ... * d_{Cp-1} per lane (1 mul per pair).
2. ``ops/pallas_inv.make_mont_pow``: t_0 = inv(s_0) via the in-VMEM
   Fermat chain kernel — ONE inversion per lane, which is why compression
   wants narrow-R geometry (R ~ 1024: ~380 muls of inversion amortized
   over the lane's ~(n/R)*10 muls of chain work).
3. ``make_emit_scan`` (forward grid): inv(d_j) = t_j * s_{j+1},
   t_{j+1} = t_j * d_j; emit the pair sum in-register and RCB16-mixed-add
   it straight into the running prefix (19 muls per pair incl. the madd).

The legacy test-surface pair (``make_pair_forward``/``make_pair_backward``
behind ``compress_pairs``) materializes the pair VALUES instead, which is
what the oracle can check point-by-point.

No reference analogue: the reference adds every source point individually
in SMVP (``smvp.template.wgsl:70-79``). The technique is the standard
batched-affine trick of CPU/GPU MSM provers, re-shaped for TPU: the
sequential chain rides the Pallas grid, the wide batch rides the lanes.

Safety notes:
- d is never 0: canonical-x equality <=> value equality (the dense wire
  format guarantees canonical coordinates), curve points have y != 0
  (prime-order group, no 2-torsion), and the infinity case substitutes R.
- Forward and backward recompute d from identical inputs with identical
  ops, so the chain values match bitwise.
- Emitted pair sums are swept balanced limbs (NOT dense-packed), consumed
  in-register by the fused madd — no canonicalization of compressed points
  is ever needed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from msm_tpu.ops.pallas_curve import _make_field_ops, _sweep_cols
from msm_tpu.ops.pallas_scan import _unpack_dense, coord_words
from msm_tpu.params import MsmConfig
from msm_tpu.utils.limbs import int_to_limbs

DEFAULT_TILE = 2048  # capped at R per kernel; r3: bigger tiles amortize
# per-grid-step fixed costs (see pallas_scan DEFAULT_TILE note)


def _ripple_eq_p(a: jax.Array, b: jax.Array, q64, w: int, mask: int):
    """[1, T] int32 0/1: value(a) + value(b) == p for CANONICAL limb rows
    a, b ([L, T]). Ripple the sum once (carries in {0, 1}) and compare
    against the static modulus limbs.

    Predicates stay in int32 lanes throughout this module: Mosaic on the
    hardware stack rejects ``arith.trunci i8 -> i1`` (boolean selects
    store as i8, re-masking truncates), so bool-valued ``jnp.where`` is
    forbidden in-kernel — comparisons may only form i1 masks at the
    final int32-select site (the ``!= 0`` idiom the scan kernel uses)."""
    L = a.shape[0]
    carry = jnp.zeros_like(a[0:1])
    ok = None
    for j in range(L):
        v = a[j : j + 1] + b[j : j + 1] + carry
        e = ((v & mask) == int(q64[j])).astype(jnp.int32)
        ok = e if ok is None else (ok & e)
        carry = v >> w
    return ok & (carry == 0).astype(jnp.int32)


def _pair_predicates(cfg: MsmConfig, x1, y1, s1, x2, y2, s2):
    """(same_x, doubling, inf) int32 0/1 rows for canonical coords +
    0/1 sign rows.

    e1 == e2  <=> x1==x2 and (s1==s2 ? y1==y2 : y1+y2==p)
    e1 == -e2 <=> x1==x2 and (s1!=s2 ? y1==y2 : y1+y2==p)
    """
    w, mask = cfg.word_size, cfg.mask
    q64 = int_to_limbs(cfg.curve.modulus, w, cfg.num_words).astype(np.int64)
    same_x = jnp.all(x1 == x2, axis=0, keepdims=True).astype(jnp.int32)
    same_y = jnp.all(y1 == y2, axis=0, keepdims=True).astype(jnp.int32)
    ysum_p = _ripple_eq_p(y1, y2, q64, w, mask)
    same_s = (s1 == s2).astype(jnp.int32)
    not_s = 1 - same_s
    dbl = same_x & (same_s * same_y + not_s * ysum_p)
    inf = same_x & (same_s * ysum_p + not_s * same_y)
    return same_x, dbl, inf


def _signed_y(y, s, qb):
    """Canonical y [L, T], sign row s [1, T] (0/1) -> y' = s ? p - y : y
    (balanced; negative limbs allowed)."""
    return jnp.where(s != 0, qb - y, y)


def _row_width(cfg: MsmConfig) -> int:
    """Dense int32 words per gather row: 2D (x, y), or 3D under GLV
    (x, beta*x, y — pallas_convert triple mode)."""
    return (3 if cfg.glv else 2) * coord_words(cfg)


def _load_pair_point(cfg: MsmConfig, gblock, srow):
    """One dense row block [W, T] + combined flag row [1, T] (bit 0 =
    bucket sign, bit 1 = GLV phi) -> (x, y canonical [L, T] limbs, sign
    row [1, T] in {0, 1}). GLV triple rows select x vs beta*x on the D
    dense words BEFORE unpacking; flags stay in int32 lanes (the Mosaic
    select rule — see _ripple_eq_p)."""
    D = coord_words(cfg)
    if cfg.glv:
        xd = jnp.where((srow >> 1) != 0, gblock[D : 2 * D], gblock[:D])
        return (
            _unpack_dense(xd, cfg),
            _unpack_dense(gblock[2 * D :], cfg),
            srow & 1,
        )
    return (
        _unpack_dense(gblock[:D], cfg),
        _unpack_dense(gblock[D:], cfg),
        srow & 1,
    )


@functools.lru_cache(maxsize=None)
def make_pair_forward(
    cfg: MsmConfig, Cp: int, R: int, tile: int = DEFAULT_TILE,
    interpret: bool = False,
):
    """Forward chain: gxy [2*Cp, 2D, R] dense + sg [2*Cp, 1, R] ->
    m [Cp, L, R] (inclusive running products of d per lane)."""
    tile = min(tile, R)
    L, D = cfg.num_words, coord_words(cfg)
    W = _row_width(cfg)
    q_np = int_to_limbs(cfg.curve.modulus, cfg.word_size, L).astype(
        np.int32
    )[:, None]
    rm_np = int_to_limbs(cfg.r, cfg.word_size, L).astype(np.int32)[:, None]

    def kernel(q, rm, g1, g2, s1, s2, om, run, mont_acc):
        c = pl.program_id(1)
        _, _, f_mul, _, _ = _make_field_ops(cfg, q[:], mont_acc)

        @pl.when(c == 0)
        def _():
            run[:] = rm[:] + jnp.zeros_like(run)

        qb = q[:] + jnp.zeros((L, tile), jnp.int32)
        x1, y1, sg1 = _load_pair_point(cfg, g1[0], s1[0])
        x2, y2, sg2 = _load_pair_point(cfg, g2[0], s2[0])
        _, dbl, inf = _pair_predicates(cfg, x1, y1, sg1, x2, y2, sg2)
        y1p = _signed_y(y1, sg1, qb)
        d = _pair_denominator(cfg, rm, x1, y1p, x2, dbl, inf)
        m = f_mul(run[:], d)
        run[:] = m
        om[0] = m

    def forward(gxy, sg):
        assert gxy.shape == (2 * Cp, W, R), gxy.shape
        assert sg.shape == (2 * Cp, 1, R), sg.shape
        assert R % tile == 0
        grid = (R // tile, Cp)
        gspec1 = pl.BlockSpec(
            (1, W, tile), lambda r, c: (2 * c, 0, r),
            memory_space=pltpu.VMEM,
        )
        gspec2 = pl.BlockSpec(
            (1, W, tile), lambda r, c: (2 * c + 1, 0, r),
            memory_space=pltpu.VMEM,
        )
        sspec1 = pl.BlockSpec(
            (1, 1, tile), lambda r, c: (2 * c, 0, r), memory_space=pltpu.VMEM
        )
        sspec2 = pl.BlockSpec(
            (1, 1, tile), lambda r, c: (2 * c + 1, 0, r),
            memory_space=pltpu.VMEM,
        )
        cspec = pl.BlockSpec((L, 1), lambda r, c: (0, 0), memory_space=pltpu.VMEM)
        outspec = pl.BlockSpec(
            (1, L, tile), lambda r, c: (c, 0, r), memory_space=pltpu.VMEM
        )
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[cspec, cspec, gspec1, gspec2, sspec1, sspec2],
            out_specs=outspec,
            out_shape=jax.ShapeDtypeStruct((Cp, L, R), jnp.int32),
            scratch_shapes=[
                pltpu.VMEM((L, tile), jnp.int32),
                pltpu.VMEM((2 * L + 1, tile), jnp.int32),
            ],
            interpret=interpret,
        )(jnp.asarray(q_np), jnp.asarray(rm_np), gxy, gxy, sg, sg)

    return forward


def _pair_denominator(cfg, rm, x1, y1p, x2, dbl, inf):
    """Shared d computation from precomputed predicates/signed-y (MUST be
    bit-identical between the forward and backward passes — both kernels
    feed it the same _pair_predicates/_signed_y outputs)."""
    w, mask = cfg.word_size, cfg.mask
    d_add = _sweep_cols(x2 - x1, w, mask)
    d_dbl = _sweep_cols(y1p + y1p, w, mask)
    d = jnp.where(dbl != 0, d_dbl, d_add)
    rmb = rm[:] + jnp.zeros_like(d)
    return jnp.where(inf != 0, rmb, d)


@functools.lru_cache(maxsize=None)
def make_pair_backward(
    cfg: MsmConfig, Cp: int, R: int, tile: int = DEFAULT_TILE,
    interpret: bool = False,
):
    """Backward emit (reverse grid): recompute d/num, lam = num * m_{c-1} *
    invrun, emit (x3, y3, inf); invrun *= d.

    Inputs: gxy/sg as in forward, m [Cp, L, R] (the forward pass's
    inclusive products — pair j reads m_{j-1} in place via a clamped
    index map, substituting mont-one at j == 0), minv [L, R] =
    inv(m_last). Outputs: cx, cy [Cp, L, R] swept balanced limbs,
    inf [Cp, 1, R] int32.
    """
    tile = min(tile, R)
    L, D = cfg.num_words, coord_words(cfg)
    W = _row_width(cfg)
    w, mask = cfg.word_size, cfg.mask
    q_np = int_to_limbs(cfg.curve.modulus, w, L).astype(np.int32)[:, None]
    rm_np = int_to_limbs(cfg.r, w, L).astype(np.int32)[:, None]

    def kernel(
        q, rm, g1, g2, s1, s2, mprev, minv, ox, oy, oinf, run, mont_acc
    ):
        c = pl.program_id(1)
        f_add, f_sub, f_mul, f_add_raw, _ = _make_field_ops(
            cfg, q[:], mont_acc
        )

        @pl.when(c == 0)  # first grid step = LAST pair (reverse index map)
        def _():
            run[:] = minv[:]

        qb = q[:] + jnp.zeros((L, tile), jnp.int32)
        x1, y1, sg1 = _load_pair_point(cfg, g1[0], s1[0])
        x2, y2, sg2 = _load_pair_point(cfg, g2[0], s2[0])
        _, dbl, inf = _pair_predicates(cfg, x1, y1, sg1, x2, y2, sg2)
        y1p = _signed_y(y1, sg1, qb)
        y2p = _signed_y(y2, sg2, qb)
        d = _pair_denominator(cfg, rm, x1, y1p, x2, dbl, inf)
        x1sq = f_mul(x1, x1)
        num_dbl = f_add(f_add_raw(x1sq, x1sq), x1sq)  # 3*x1^2
        num_add = _sweep_cols(y2p - y1p, w, mask)
        num = jnp.where(dbl != 0, num_dbl, num_add)
        # m_{j-1} for pair j = rev(c); the first pair (j == 0, i.e. the
        # LAST grid step) substitutes mont-one — mprev's index map clamps
        # its read to row 0 there, which this select discards
        rmb = rm[:] + jnp.zeros((L, tile), jnp.int32)
        mp = jnp.where(c == Cp - 1, rmb, mprev[0])
        inv_d = f_mul(mp, run[:])
        lam = f_mul(num, inv_d)
        x3 = f_sub(f_sub(f_mul(lam, lam), x1), x2)
        y3 = f_sub(f_mul(lam, f_sub(x1, x3)), y1p)
        run[:] = f_mul(run[:], d)
        ox[0] = x3
        oy[0] = y3
        oinf[0] = inf

    def backward(gxy, sg, m, minv):
        assert gxy.shape == (2 * Cp, W, R), gxy.shape
        assert m.shape == (Cp, L, R), m.shape
        assert minv.shape == (L, R), minv.shape
        assert R % tile == 0
        grid = (R // tile, Cp)
        rev = lambda c: Cp - 1 - c
        gspec1 = pl.BlockSpec(
            (1, W, tile), lambda r, c: (2 * rev(c), 0, r),
            memory_space=pltpu.VMEM,
        )
        gspec2 = pl.BlockSpec(
            (1, W, tile), lambda r, c: (2 * rev(c) + 1, 0, r),
            memory_space=pltpu.VMEM,
        )
        sspec1 = pl.BlockSpec(
            (1, 1, tile), lambda r, c: (2 * rev(c), 0, r),
            memory_space=pltpu.VMEM,
        )
        sspec2 = pl.BlockSpec(
            (1, 1, tile), lambda r, c: (2 * rev(c) + 1, 0, r),
            memory_space=pltpu.VMEM,
        )
        # pair j = rev(c) reads m_{j-1}; clamped to 0 on the last grid
        # step (j == 0), where the kernel substitutes mont-one instead —
        # reading m in place avoids materializing a shifted 40 MB copy
        mspec = pl.BlockSpec(
            (1, L, tile),
            lambda r, c: (jnp.maximum(rev(c) - 1, 0), 0, r),
            memory_space=pltpu.VMEM,
        )
        vspec = pl.BlockSpec(
            (L, tile), lambda r, c: (0, r), memory_space=pltpu.VMEM
        )
        cspec = pl.BlockSpec((L, 1), lambda r, c: (0, 0), memory_space=pltpu.VMEM)
        ospec = pl.BlockSpec(
            (1, L, tile), lambda r, c: (rev(c), 0, r), memory_space=pltpu.VMEM
        )
        ispec = pl.BlockSpec(
            (1, 1, tile), lambda r, c: (rev(c), 0, r), memory_space=pltpu.VMEM
        )
        shp = jax.ShapeDtypeStruct((Cp, L, R), jnp.int32)
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                cspec, cspec, gspec1, gspec2, sspec1, sspec2, mspec, vspec,
            ],
            out_specs=(ospec, ospec, ispec),
            out_shape=(shp, shp, jax.ShapeDtypeStruct((Cp, 1, R), jnp.int32)),
            scratch_shapes=[
                pltpu.VMEM((L, tile), jnp.int32),
                pltpu.VMEM((2 * L + 1, tile), jnp.int32),
            ],
            interpret=interpret,
        )(
            jnp.asarray(q_np), jnp.asarray(rm_np), gxy, gxy, sg, sg,
            m, minv,
        )

    return backward


@functools.lru_cache(maxsize=None)
def make_pair_suffix(
    cfg: MsmConfig, Cp: int, R: int, tile: int = DEFAULT_TILE,
    interpret: bool = False,
):
    """Suffix chain (reverse grid): gxy [2*Cp, 2D, R] dense + sg
    [2*Cp, 1, R] -> s [Cp, L, R] with s_j = d_j * d_{j+1} * ... *
    d_{Cp-1} (inclusive suffix products of the pair denominators per
    lane). The forward-direction batched inversion identity the fused
    emit+scan kernel consumes is

        inv(d_j) = t_j * s_{j+1},   t_{j+1} = t_j * d_j,
        t_0 = inv(s_0),             s_{Cp}  = 1,

    i.e. ONE inversion per lane and a forward-running t — which lets the
    pair emission run in the SAME direction as the prefix scan and hence
    fuse with it (the classic backward-emission formulation forces a
    separate reverse pass, ~+60 ms per 2^20 MSM in kernel I/O + grid)."""
    tile = min(tile, R)
    L, D = cfg.num_words, coord_words(cfg)
    W = _row_width(cfg)
    q_np = int_to_limbs(cfg.curve.modulus, cfg.word_size, L).astype(
        np.int32
    )[:, None]
    rm_np = int_to_limbs(cfg.r, cfg.word_size, L).astype(np.int32)[:, None]

    def kernel(q, rm, g1, g2, s1, s2, os, run, mont_acc):
        c = pl.program_id(1)
        _, _, f_mul, _, _ = _make_field_ops(cfg, q[:], mont_acc)

        @pl.when(c == 0)  # first grid step = LAST pair (reverse index map)
        def _():
            run[:] = rm[:] + jnp.zeros_like(run)

        qb = q[:] + jnp.zeros((L, tile), jnp.int32)
        x1, y1, sg1 = _load_pair_point(cfg, g1[0], s1[0])
        x2, y2, sg2 = _load_pair_point(cfg, g2[0], s2[0])
        _, dbl, inf = _pair_predicates(cfg, x1, y1, sg1, x2, y2, sg2)
        y1p = _signed_y(y1, sg1, qb)
        d = _pair_denominator(cfg, rm, x1, y1p, x2, dbl, inf)
        s = f_mul(run[:], d)
        run[:] = s
        os[0] = s

    def suffix(gxy, sg):
        assert gxy.shape == (2 * Cp, W, R), gxy.shape
        assert sg.shape == (2 * Cp, 1, R), sg.shape
        assert R % tile == 0
        grid = (R // tile, Cp)
        rev = lambda c: Cp - 1 - c
        gspec1 = pl.BlockSpec(
            (1, W, tile), lambda r, c: (2 * rev(c), 0, r),
            memory_space=pltpu.VMEM,
        )
        gspec2 = pl.BlockSpec(
            (1, W, tile), lambda r, c: (2 * rev(c) + 1, 0, r),
            memory_space=pltpu.VMEM,
        )
        sspec1 = pl.BlockSpec(
            (1, 1, tile), lambda r, c: (2 * rev(c), 0, r),
            memory_space=pltpu.VMEM,
        )
        sspec2 = pl.BlockSpec(
            (1, 1, tile), lambda r, c: (2 * rev(c) + 1, 0, r),
            memory_space=pltpu.VMEM,
        )
        cspec = pl.BlockSpec(
            (L, 1), lambda r, c: (0, 0), memory_space=pltpu.VMEM
        )
        ospec = pl.BlockSpec(
            (1, L, tile), lambda r, c: (rev(c), 0, r),
            memory_space=pltpu.VMEM,
        )
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[cspec, cspec, gspec1, gspec2, sspec1, sspec2],
            out_specs=ospec,
            out_shape=jax.ShapeDtypeStruct((Cp, L, R), jnp.int32),
            scratch_shapes=[
                pltpu.VMEM((L, tile), jnp.int32),
                pltpu.VMEM((2 * L + 1, tile), jnp.int32),
            ],
            interpret=interpret,
        )(jnp.asarray(q_np), jnp.asarray(rm_np), gxy, gxy, sg, sg)

    return suffix


@functools.lru_cache(maxsize=None)
def make_emit_scan(
    cfg: MsmConfig, Cp: int, R: int, tile: int = DEFAULT_TILE,
    interpret: bool = False,
):
    """Fused pair-emission + prefix point-scan (forward grid).

    Per step j: recompute (d, num, predicates) from the gxy pair blocks,
    inv_d = t * s_{j+1} (s from make_pair_suffix, t the running inverse in
    VMEM scratch), emit the affine pair sum (x3, y3) in-register, and
    immediately RCB16-mixed-add it into the running point prefix —
    replacing the separate backward-emit kernel + limbs-mode scan kernel
    (their intermediate cx/cy/inf arrays, ~84 MB/subtask of HBM traffic,
    and one full grid of per-step overhead). Infinity pairs (P + (-P))
    pass the accumulator through, keeping the compressed prefix an exact
    prefix of the source stream.

    Outputs: the inclusive point prefixes [Cp, L, R] x 3 (Montgomery
    projective, balanced limbs) — identical contract to
    pallas_scan.make_scan_rows."""
    tile = min(tile, R)
    L, D = cfg.num_words, coord_words(cfg)
    W = _row_width(cfg)
    w, mask = cfg.word_size, cfg.mask
    q_np = int_to_limbs(cfg.curve.modulus, w, L).astype(np.int32)[:, None]
    rm_np = int_to_limbs(cfg.r, w, L).astype(np.int32)[:, None]
    from msm_tpu.ops.pallas_curve import aux_b3_limbs
    from msm_tpu.ops.pallas_scan import _rcb16_madd

    aux_np = aux_b3_limbs(cfg)
    madd = _rcb16_madd(cfg)

    def kernel(
        q, b3m, rm, g1, g2, s1, s2, snext, t0, ox, oy, oz,
        tinv, accx, accy, accz, mont_acc,
    ):
        c = pl.program_id(1)
        f_add, f_sub, f_mul, f_add_raw, _ = _make_field_ops(
            cfg, q[:], mont_acc
        )

        @pl.when(c == 0)
        def _():
            tinv[:] = t0[:]
            accx[:] = jnp.zeros_like(accx)
            accy[:] = rm[:] + jnp.zeros_like(accy)
            accz[:] = jnp.zeros_like(accz)

        qb = q[:] + jnp.zeros((L, tile), jnp.int32)
        x1, y1, sg1 = _load_pair_point(cfg, g1[0], s1[0])
        x2, y2, sg2 = _load_pair_point(cfg, g2[0], s2[0])
        _, dbl, inf = _pair_predicates(cfg, x1, y1, sg1, x2, y2, sg2)
        y1p = _signed_y(y1, sg1, qb)
        y2p = _signed_y(y2, sg2, qb)
        d = _pair_denominator(cfg, rm, x1, y1p, x2, dbl, inf)
        x1sq = f_mul(x1, x1)
        num_dbl = f_add(f_add_raw(x1sq, x1sq), x1sq)  # 3*x1^2
        num_add = _sweep_cols(y2p - y1p, w, mask)
        num = jnp.where(dbl != 0, num_dbl, num_add)
        rmb = rm[:] + jnp.zeros((L, tile), jnp.int32)
        snx = jnp.where(c == Cp - 1, rmb, snext[0])  # s_{Cp} = mont-one
        inv_d = f_mul(tinv[:], snx)
        lam = f_mul(num, inv_d)
        x3 = f_sub(f_sub(f_mul(lam, lam), x1), x2)
        y3 = f_sub(f_mul(lam, f_sub(x1, x3)), y1p)
        tinv[:] = f_mul(tinv[:], d)
        px, py, pz = madd(
            q[:], b3m[:], mont_acc, accx[:], accy[:], accz[:], x3, y3
        )
        keep = inf != 0  # [1, tile]: infinity pair -> accumulator unchanged
        px = jnp.where(keep, accx[:], px)
        py = jnp.where(keep, accy[:], py)
        pz = jnp.where(keep, accz[:], pz)
        accx[:] = px
        accy[:] = py
        accz[:] = pz
        ox[0] = px
        oy[0] = py
        oz[0] = pz

    def emit_scan(gxy, sg, s, t0):
        assert gxy.shape == (2 * Cp, W, R), gxy.shape
        assert s.shape == (Cp, L, R), s.shape
        assert t0.shape == (L, R), t0.shape
        assert R % tile == 0
        grid = (R // tile, Cp)
        gspec1 = pl.BlockSpec(
            (1, W, tile), lambda r, c: (2 * c, 0, r),
            memory_space=pltpu.VMEM,
        )
        gspec2 = pl.BlockSpec(
            (1, W, tile), lambda r, c: (2 * c + 1, 0, r),
            memory_space=pltpu.VMEM,
        )
        sspec1 = pl.BlockSpec(
            (1, 1, tile), lambda r, c: (2 * c, 0, r), memory_space=pltpu.VMEM
        )
        sspec2 = pl.BlockSpec(
            (1, 1, tile), lambda r, c: (2 * c + 1, 0, r),
            memory_space=pltpu.VMEM,
        )
        # step j reads s_{j+1}; clamped at the last step, where the kernel
        # substitutes mont-one (the empty suffix product)
        snspec = pl.BlockSpec(
            (1, L, tile),
            lambda r, c: (jnp.minimum(c + 1, Cp - 1), 0, r),
            memory_space=pltpu.VMEM,
        )
        vspec = pl.BlockSpec(
            (L, tile), lambda r, c: (0, r), memory_space=pltpu.VMEM
        )
        cspec = pl.BlockSpec(
            (L, 1), lambda r, c: (0, 0), memory_space=pltpu.VMEM
        )
        ospec = pl.BlockSpec(
            (1, L, tile), lambda r, c: (c, 0, r), memory_space=pltpu.VMEM
        )
        shp = jax.ShapeDtypeStruct((Cp, L, R), jnp.int32)
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                cspec, cspec, cspec, gspec1, gspec2, sspec1, sspec2,
                snspec, vspec,
            ],
            out_specs=(ospec, ospec, ospec),
            out_shape=(shp, shp, shp),
            scratch_shapes=[
                pltpu.VMEM((L, tile), jnp.int32),
                pltpu.VMEM((L, tile), jnp.int32),
                pltpu.VMEM((L, tile), jnp.int32),
                pltpu.VMEM((L, tile), jnp.int32),
                pltpu.VMEM((2 * L + 1, tile), jnp.int32),
            ],
            interpret=interpret,
        )(
            jnp.asarray(q_np), jnp.asarray(aux_np), jnp.asarray(rm_np),
            gxy, gxy, sg, sg, s, t0,
        )

    return emit_scan


def compressed_prefix_scan(
    cfg: MsmConfig,
    gxy: jax.Array,
    sg: jax.Array,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Production compressed scan: suffix products -> one Fermat inversion
    per lane (in-VMEM kernel) -> fused emit+scan. Input gxy [C, 2D, R]
    dense canonical + signs [C, 1, R] (C even); output the inclusive point
    prefixes [C/2, L, R] x 3 over the compressed (pair-summed) stream."""
    from msm_tpu.ops.pallas_inv import make_mont_pow

    C, _, R = gxy.shape
    assert C % 2 == 0, C
    Cp = C // 2
    s = make_pair_suffix(cfg, Cp, R, interpret=interpret)(gxy, sg)
    t0 = make_mont_pow(cfg, R, cfg.curve.modulus - 2, interpret=interpret)(
        s[0]
    )
    return make_emit_scan(cfg, Cp, R, interpret=interpret)(gxy, sg, s, t0)


def compress_pairs(
    cfg: MsmConfig,
    gxy: jax.Array,
    sg: jax.Array,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Compress the sorted dense stream gxy [C, 2D, R] + signs [C, 1, R]
    (C even) into (cx, cy, inf): [C/2, L, R] balanced affine pair sums +
    [C/2, 1, R] infinity flags. See module docstring for the 3 passes.

    Kernel-level test surface: the production pipeline runs the fused
    ``compressed_prefix_scan`` instead (same predicate/denominator/emit
    algebra, shared via _pair_predicates/_pair_denominator), but this
    pair-value form is what the oracle can check point-by-point."""
    from msm_tpu.ops.pallas_inv import make_mont_pow

    C, _, R = gxy.shape
    assert C % 2 == 0, C
    Cp = C // 2
    L = cfg.num_words
    m = make_pair_forward(cfg, Cp, R, interpret=interpret)(gxy, sg)
    # Fermat inversion of the final products: the in-VMEM chain kernel
    # (ops/pallas_inv.py) — the XLA mont_pow route costs ~60-126 ms per
    # 2^20 MSM in sequential 80 KB HBM round-trips
    minv = make_mont_pow(
        cfg, R, cfg.curve.modulus - 2, interpret=interpret
    )(m[-1])
    return make_pair_backward(cfg, Cp, R, interpret=interpret)(
        gxy, sg, m, minv
    )
