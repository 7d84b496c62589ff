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
  15 for the projective Algorithm 7. Alg 8 is complete for any P1 (incl.
  identity) as long as P2 is finite, which sorted real points always are
  (padding uses the generator, reference msm.rs:63-69);
- coordinates stream in **dense-packed canonical** form — the canonical
  value bit-packed at radix 2^32 (coord_words: BN254 = 8 int32/coord,
  64 B/point row vs 80 B for the earlier 16-bit pair packing) — cutting
  the random-gather traffic of the sort permutation and the kernel's
  input DMA by 20%, and aligning rows 8-per-(8,128)-tile with no tile
  straddling. Canonicalization + packing happen ONCE per MSM inside the
  convert kernel (or pack_coords on the XLA path); unpacking is at most
  two shifts + mask per limb inside the kernel;
- per-element signs (the signed-bucket negation, an int32 0/1 array gathered
  by the same permutation) are applied to y in-kernel.

Grid: (R/tile, C) with C innermost; the accumulator scratch re-initializes
to the identity at c==0 (new row tile). Outputs: the inclusive prefixes in
the boundary-gather layout [C, R, 3L] (x||y||z limbs contiguous per row, so
the per-bucket prefix extraction gathers ONE row instead of 3x20 R-strided
words) plus the [L, R] lane totals for the row-offsets kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from msm_tpu.ops.pallas_curve import _make_field_ops, _make_mul_b3, aux_b3_limbs
from msm_tpu.params import MsmConfig
from msm_tpu.utils.limbs import int_to_limbs

DEFAULT_TILE = 2048  # r3 hardware sweep: 2048 = 428 ms at 2^20 vs
# 1024 = 448, 4096 = 443 (fewer grid steps amortize per-step fixed costs
# until VMEM block pressure pushes back)


def coord_words(cfg: MsmConfig) -> int:
    """int32 words per DENSE-packed canonical coordinate: the gather wire
    format is the canonical value bit-packed at radix 2^32 (BN254: 8 words
    = 64 B/point row vs 10 words of the earlier 16-bit pair packing —
    gather rows align 8-per-(8,128)-tile with no tile straddling)."""
    return (cfg.curve.modulus_bits + 31) // 32


def pe_pack16(cfg: MsmConfig) -> bool:
    """True when the boundary-prefix rows can be emitted as int16 limb
    PAIRS (two balanced limbs per int32 word), halving the in-kernel
    (3L, tile) -> (tile, 3L) transpose work, the pe HBM write traffic and
    the boundary-gather row width (r5, VERDICT item 2).

    Soundness gate (static): pe rows are fully-swept + top-renormalized
    f_mul2 outputs (never raw accumulator state), so per-limb magnitudes
    are bounded by 2^w + 128 (non-top; the post-sweep carry bound proved
    at pallas_curve._make_field_ops BOUND) and ~2^(s+2) (top limb: REDC
    value <= ~32p over 2^(w(L-1)), s the renorm fold shift). Both must
    clear int16: production w=13 curves pass with >= 4x headroom; w>=15
    never packs.

    DEFAULT OFF (r5 hardware kill): at 2^20 the packed emission measured
    433 ms vs 406 for the plain (3L, tile) transpose — Mosaic's fused
    transpose is cheaper than the 30-way packed-pair concat the pack
    needs (strided sublane slices do not lower), and the halved pe HBM
    traffic does not pay it back. Opt in with MSM_TPU_PE_PACK=1 for
    future Mosaic stacks (note make_scan_rows caches per-process)."""
    import os

    if os.environ.get("MSM_TPU_PE_PACK", "0") != "1":
        return False
    w, L = cfg.word_size, cfg.num_words
    pbits = cfg.curve.modulus.bit_length()
    s = max(0, pbits + 3 - w * (L - 1))
    return ((1 << (s + 2)) + (1 << 8) < (1 << 15)) and (
        (1 << w) + 128 < (1 << 15)
    )


def pe_layout_cpr() -> bool:
    """Experimental A/B knob (MSM_TPU_PE_LAYOUT=cpr): emit the prefix
    array limbs-first [C, P, R] with NO in-kernel transpose and let ONE
    XLA layout copy produce the gather layout instead (scan.py swapaxes
    at the call site). Trades Mosaic transpose compute for an HBM
    round-trip of the pe array. Same per-process caching caveat as
    MSM_TPU_PE_PACK."""
    import os

    return os.environ.get("MSM_TPU_PE_LAYOUT", "") == "cpr"


def pe_row_words(cfg: MsmConfig) -> int:
    """int32 words per boundary-prefix row as emitted by the scan kernel:
    (3L+1)//2 when the int16 pair packing is active, else 3L."""
    L3 = 3 * cfg.num_words
    return (L3 + 1) // 2 if pe_pack16(cfg) else L3


def unpack_pe_rows(rows: jax.Array, cfg: MsmConfig) -> jax.Array:
    """[..., P] kernel-emitted boundary rows -> [..., 3L] balanced limbs.
    Identity when the rows are already unpacked; otherwise splits each
    int32 into its (lo, hi) int16 pair with sign-preserving arithmetic
    shifts."""
    L3 = 3 * cfg.num_words
    if rows.shape[-1] == L3:
        return rows
    lo = (rows << 16) >> 16  # arithmetic: recovers the signed low limb
    hi = rows >> 16
    inter = jnp.stack([lo, hi], axis=-1).reshape(*rows.shape[:-1], -1)
    return inter[..., :L3]


def _pack_plan(w: int, L: int, D: int) -> list[list[tuple[int, int]]]:
    """Static bit plan: plan[k] lists (limb j, shift) whose
    ``limb_j << shift`` (``>> -shift`` when negative) contributes bits to
    dense word k. Limb bit-ranges are disjoint, so contributions OR."""
    plan: list[list[tuple[int, int]]] = [[] for _ in range(D)]
    for j in range(L):
        lo, hi = w * j, w * j + w
        for k in range(lo // 32, min((hi + 31) // 32, D)):
            plan[k].append((j, lo - 32 * k))
    return plan


def pack_coords(x: jax.Array, cfg: MsmConfig) -> jax.Array:
    """[..., L] balanced limbs -> [..., D] dense int32 words (canonical
    value at radix 2^32). Canonicalizes first (FieldCtx.canonical), so the
    packed fields are plain nonneg bit ranges the scan kernel can unpack
    with two shifts per limb."""
    from msm_tpu.ops.field import get_field_ctx

    w, L, D = cfg.word_size, cfg.num_words, coord_words(cfg)
    assert x.shape[-1] == L, (x.shape, L)
    c = get_field_ctx(cfg).canonical(x)
    words = []
    for contrib in _pack_plan(w, L, D):
        v = None
        for j, s in contrib:
            t = c[..., j] << s if s >= 0 else c[..., j] >> (-s)
            v = t if v is None else v | t
        words.append(v if v is not None else jnp.zeros_like(c[..., 0]))
    return jnp.stack(words, axis=-1)


def _unpack_dense(p: jax.Array, cfg: MsmConfig) -> jax.Array:
    """[D, T] dense canonical words -> [L, T] standard w-bit limbs
    (rows-first, in-kernel). Logical-shift semantics are recovered from
    int32 arithmetic shifts by masking the sign-extension bits."""
    w, L, D = cfg.word_size, cfg.num_words, coord_words(cfg)
    mask = (1 << w) - 1
    rows = []
    for j in range(L):
        lo = w * j
        k, s = divmod(lo, 32)
        if k >= D:
            rows.append(jnp.zeros_like(p[0:1]))
            continue
        v = p[k : k + 1]
        if s:
            v = (v >> s) & ((1 << (32 - s)) - 1)  # logical >>
        if s + w > 32 and k + 1 < D:
            v = v | (p[k + 1 : k + 2] << (32 - s))
        rows.append(v & mask)
    return jnp.concatenate(rows, axis=0)


def unpack_coords(p: jax.Array, cfg: MsmConfig) -> jax.Array:
    """[..., D] dense canonical words -> [..., L] standard w-bit limbs
    (XLA last-axis mirror of the in-kernel _unpack_dense; used for the
    odd-boundary single-element correction of the compressed path)."""
    w, L, D = cfg.word_size, cfg.num_words, coord_words(cfg)
    mask = (1 << w) - 1
    cols = []
    for j in range(L):
        k, s = divmod(w * j, 32)
        if k >= D:
            cols.append(jnp.zeros_like(p[..., 0]))
            continue
        v = p[..., k]
        if s:
            v = (v >> s) & ((1 << (32 - s)) - 1)
        if s + w > 32 and k + 1 < D:
            v = v | (p[..., k + 1] << (32 - s))
        cols.append(v & mask)
    return jnp.stack(cols, axis=-1)


def _rcb16_madd(cfg: MsmConfig):
    """RCB16 Algorithm 8 (a=0): projective P1 + affine P2 on limbs-first
    [L, T] arrays. Returns (x3, y3, z3)."""

    def madd(q_col, b3m_col, acc_ref, x1, y1, z1, x2, y2):
        f_add, f_sub, f_mul, f_add_raw, f_mul2 = _make_field_ops(
            cfg, q_col, acc_ref, dirty_mul_out=cfg.small_b3 is not None
        )

        mul_b3 = _make_mul_b3(cfg, b3m_col, f_mul)

        t0 = f_mul(x1, x2)
        t1 = f_mul(y1, y2)
        t3 = f_mul(f_add(x2, y2), f_add(x1, y1))
        t3 = f_sub(t3, f_add_raw(t0, t1))  # x1y2 + x2y1
        t4 = f_add(f_mul(y2, z1), y1)  # y1 + y2z1
        y3 = f_add(f_mul(x2, z1), x1)  # x1 + x2z1
        t0_3 = f_add(f_add_raw(t0, t0), t0)  # 3x1x2
        t2 = mul_b3(z1)
        z3 = f_add(t1, t2)
        t1 = f_sub(t1, t2)
        y3 = mul_b3(y3)
        # merged-REDC tails: one Montgomery reduction per output
        x3 = f_mul2(t3, t1, t4, y3, negate2=True)
        y3 = f_mul2(y3, t0_3, t1, z3)
        z3 = f_mul2(z3, t4, t0_3, t3)
        return x3, y3, z3

    return madd


def _scan_tile() -> int:
    """Lane-tile width for the row scan — env-overridable for hardware
    sweeps (MSM_TPU_SCAN_TILE), default DEFAULT_TILE."""
    import os

    return int(os.environ.get("MSM_TPU_SCAN_TILE", DEFAULT_TILE))


@functools.lru_cache(maxsize=None)
def make_scan_rows(
    cfg: MsmConfig,
    C: int,
    R: int,
    tile: int | None = None,
    interpret: bool = False,
):
    """Build the fused row scan.

    Takes bucket-sorted affine points as one dense-packed [C, W, R] array
    (W = 2D, or 3D triple rows under GLV; element (c, r) is the c-th point
    of lane r) plus int32 flag rows [C, 1, R] (bit 0: negate y; bit 1:
    GLV phi — select the beta*x words). See scan_rows below for outputs
    (Montgomery projective limbs, balanced encoding).
    """
    tile = min(tile or _scan_tile(), R)  # small geometries: one tile
    L = cfg.num_words
    D = coord_words(cfg)
    # GLV triple rows (x, beta*x, y): W = 3D, x selected by the phi flag
    # (bit 1 of the sign row) — see pallas_convert triple mode
    W = (3 if cfg.glv else 2) * D
    aux_np = aux_b3_limbs(cfg)
    q_np = int_to_limbs(cfg.curve.modulus, cfg.word_size, L).astype(np.int32)[
        :, None
    ]
    # identity = (0 : 1 : 0) in Montgomery form -> y = R mod p
    rm_np = int_to_limbs(cfg.r, cfg.word_size, L).astype(np.int32)[:, None]
    madd = _rcb16_madd(cfg)
    P = pe_row_words(cfg)  # 3L, or (3L+1)//2 under int16 pair packing
    cpr = pe_layout_cpr()  # A/B: emit [C, P, R], XLA transposes outside

    def kernel(
        q, b3m, rm, pxy, sg, ope, otx, oty, otz,
        accx, accy, accz, mont_acc,
    ):
        c = pl.program_id(1)

        @pl.when(c == 0)
        def _():
            accx[:] = jnp.zeros_like(accx)
            accy[:] = rm[:] + jnp.zeros_like(accy)
            accz[:] = jnp.zeros_like(accz)

        packed = pxy[0]  # [W, tile] — coords-first, no transpose needed
        if cfg.glv:
            xd = jnp.where(
                (sg[0] >> 1) != 0, packed[D : 2 * D], packed[:D]
            )
            x2 = _unpack_dense(xd, cfg)
            y2 = _unpack_dense(packed[2 * D :], cfg)
        else:
            x2 = _unpack_dense(packed[:D], cfg)
            y2 = _unpack_dense(packed[D:], cfg)
        y2 = jnp.where((sg[0] & 1) != 0, -y2, y2)  # sg[0]: [1, tile]
        x3, y3, z3 = madd(
            q[:], b3m[:], mont_acc, accx[:], accy[:], accz[:], x2, y2
        )
        accx[:] = x3
        accy[:] = y3
        accz[:] = z3
        # boundary-gatherable layout: one row of contiguous limbs per
        # prefix value — prefix_at's per-bucket gather reads ONE row
        # instead of 3x20 R-strided words (37 -> ~5 ms per 2^20 MSM);
        # concat-then-transpose lets Mosaic do one (P, tile) transpose.
        # When pe_pack16 holds, adjacent limbs pack as int16 pairs first
        # (bounds proved at the gate), halving the transpose rows and the
        # pe store traffic.
        cat = jnp.concatenate([x3, y3, z3], axis=0)  # [3L, tile]
        if P != 3 * L:
            # pair-concat form: strided sublane slices (cat[0::2]) do NOT
            # lower in Mosaic (gather shape mismatch) — the 30-way concat
            # of packed row pairs is the expressible formulation, measured
            # +27 ms vs the plain transpose at 2^20 (see pe_pack16)
            pairs = [
                (cat[i : i + 1] & 0xFFFF) | (cat[i + 1 : i + 2] << 16)
                for i in range(0, 3 * L - 1, 2)
            ]
            if 3 * L % 2:
                pairs.append(cat[3 * L - 1 :] & 0xFFFF)
            cat = jnp.concatenate(pairs, axis=0)  # [P, tile]
        ope[0] = cat if cpr else cat.T

        @pl.when(c == C - 1)
        def _():
            # row totals, limbs-first — the row-offsets kernel's layout
            otx[:] = x3
            oty[:] = y3
            otz[:] = z3

    def scan_rows(pxy, signs):
        """pxy: [C, W, R] coords-second-minor (lane dim R matches the
        hardware tiling, so the gathered input needs no XLA layout copy);
        signs: [C, 1, R].

        Returns (pe3 [C, R, P], tx, ty, tz [L, R]): pe3[c, r] is the
        inclusive point-prefix of lane r after step c as x||y||z limb
        rows (gather-friendly: the bucket-boundary extraction reads
        contiguous rows; P = pe_row_words — int16 limb pairs when
        pe_pack16 holds, decoded by unpack_pe_rows); (tx, ty, tz) are the
        lane totals (= step C-1), limbs-first for the row-offsets
        kernel."""
        assert pxy.shape == (C, W, R), (pxy.shape, (C, W, R))
        assert signs.shape == (C, 1, R), signs.shape
        assert R % tile == 0, (R, tile)
        grid = (R // tile, C)
        inspec = pl.BlockSpec(
            (1, W, tile), lambda r, c: (c, 0, r), memory_space=pltpu.VMEM
        )
        sgspec = pl.BlockSpec(
            (1, 1, tile), lambda r, c: (c, 0, r), memory_space=pltpu.VMEM
        )
        pespec = (
            pl.BlockSpec(
                (1, P, tile), lambda r, c: (c, 0, r),
                memory_space=pltpu.VMEM,
            )
            if cpr
            else pl.BlockSpec(
                (1, tile, P), lambda r, c: (c, r, 0),
                memory_space=pltpu.VMEM,
            )
        )
        totspec = pl.BlockSpec(
            (L, tile), lambda r, c: (0, r), memory_space=pltpu.VMEM
        )
        cspec = pl.BlockSpec(
            (L, 1), lambda r, c: (0, 0), memory_space=pltpu.VMEM
        )
        pe_shape = jax.ShapeDtypeStruct(
            (C, P, R) if cpr else (C, R, P), jnp.int32
        )
        tot_shape = jax.ShapeDtypeStruct((L, R), jnp.int32)
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[cspec, cspec, cspec, inspec, sgspec],
            out_specs=(pespec, totspec, totspec, totspec),
            out_shape=(pe_shape, tot_shape, tot_shape, tot_shape),
            scratch_shapes=[
                pltpu.VMEM((L, tile), jnp.int32),
                pltpu.VMEM((L, tile), jnp.int32),
                pltpu.VMEM((L, tile), jnp.int32),
                pltpu.VMEM((2 * L + 1, tile), jnp.int32),
            ],
            interpret=interpret,
        )(
            jnp.asarray(q_np),
            jnp.asarray(aux_np),
            jnp.asarray(rm_np),
            pxy,
            signs,
        )

    return scan_rows
