"""Pallas TPU kernel: fused batched elliptic-curve point addition.

Why this kernel exists: the XLA path in ``ops/field.py`` implements
``mont_mul`` as a 20-step ``lax.scan``; every step round-trips the [B, L+1]
accumulator through HBM, so one complete point add (12 mont_muls) moves
~80x more HBM bytes than the operands themselves — measured ~10-20 ms per
65536-lane add on v5e, pure bandwidth. This kernel fuses the ENTIRE add
(12 Montgomery multiplies + all field add/sub/sweep steps, RCB16 complete
formulas) into one Pallas program: operands are read once, the whole
computation stays in VMEM, results are written once.

Layout: the framework stores limb tensors ``[batch, L]`` (limb axis last,
matching the reference's ``BigInt{limbs:[u32;20]}`` vectorized —
``structs.template.wgsl:1-17``). Batch must ride the 128-wide lane axis for
VPU efficiency, so the kernel transposes each tile to limbs-first
``[L, tile]`` on load and back on store; the transpose cost is amortized
over the ~25k vector ops of the fused add.

Montgomery multiply: **fixed-position CIOS on a VMEM scratch accumulator**
(41 rows x tile lanes). Unlike the shifting-window formulation in
``ops/field.py``, nothing is ever concatenated or rolled — phase 1
accumulates all 400 limb products in place (20 static-slice += ops), one
parallel sweep rebalances, then 20 REDC steps add ``m_i * q`` in place with
a single-row carry push. Low rows end ≡ 0 mod 2^w, rows L..2L are the
result. This is the int32-lane re-derivation of the reference's
carry-omission analysis (``mont_pro_product.template.wgsl:18-23``): phase-1
columns stay < 20*2^26 < 2^31, and post-sweep REDC columns stay
< 2^17.4 + 20*2^26 + 2^18 < 2^31.

The result is a *balanced* representation congruent to the FieldCtx result
mod p (not bit-identical — a different but equally-bounded limb encoding);
exit paths canonicalize exactly as on the XLA path.

Reference kernels replaced: ``point_add`` (``ec.template.wgsl:36-86``) and
``montgomery_product`` (``mont_pro_product.template.wgsl:11-35``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from msm_tpu.params import MsmConfig
from msm_tpu.utils.limbs import int_to_limbs

#: lane-tile width (batch elements per kernel instance). After the
#: multi-limb CIOS refactor the kernel body fits VMEM up to tile 1024;
#: 512 measures fastest for the generic add (~0.75 ms / 65536-lane add).
DEFAULT_TILE = 512


def _sweep_cols(x: jax.Array, w: int, mask: int) -> jax.Array:
    """Balanced carry sweep along axis 0 (limbs-first): move each limb's
    overflow one limb up; the top limb keeps its own overflow (exact).
    Mirrors ``bigint.sweep`` for the [K, T] layout."""
    hi = x >> w
    lo = x & mask
    shifted = jnp.concatenate([jnp.zeros_like(hi[:1]), hi[:-1]], axis=0)
    out = lo + shifted
    top = out[-1:] + (hi[-1:] << w)
    return jnp.concatenate([out[:-1], top], axis=0)


def karatsuba_ok(cfg: MsmConfig) -> bool:
    """Static eligibility of the difference-Karatsuba phase-1
    (cfg.karatsuba): num_words must split evenly and both int32 column
    budgets must clear (see the bound derivation at the _make_field_ops
    gate). BN254-class w=13/L=20 passes with ~35% margin; BLS12-377/381
    (L=30) with ~3%; odd-L (Pasta w=13) and w>=14 configs do not."""
    w, L = cfg.word_size, cfg.num_words
    if L % 2:
        return False
    h = L // 2
    B = (1 << w) + 128  # swept mul-operand limb (= BOUND)
    Dnt = (1 << w) + 4  # swept difference limb (non-top)
    Dt = 2 * B + 4  # swept difference TOP limb (keeps its overflow)
    return (2 * h * B * B + (1 << 19) < (1 << 31)) and (
        (h - 2) * Dnt * Dnt + 2 * Dt * Dnt + (1 << 19) < (1 << 31)
    )


def _make_field_ops(
    cfg: MsmConfig, q_col: jax.Array, acc_ref, dirty_mul_out: bool = False
):
    """Limbs-first field ops on [L, T] int32 values.

    ``q_col``: modulus limbs [L, 1] (traced input — Pallas kernels cannot
    capture array constants). ``acc_ref``: [2L+1, T] VMEM scratch reused by
    every Montgomery multiply in the kernel.

    ``dirty_mul_out``: skip mont_mul's second output sweep, leaving limbs
    bounded by ~2^(w+4.6) instead of ~2^w. Safe ONLY when every mul result
    passes through f_add/f_sub (which re-normalize) before feeding another
    multiply — true of the RCB16 add/madd dataflow whenever mul_b3 takes
    the small-b3 path (every shipped curve); NOT safe for kernels that
    store mul results raw (the convert kernel 16-bit-packs them).
    """
    w, L, mask = cfg.word_size, cfg.num_words, cfg.mask
    n0 = np.int32(cfg.n0)

    def sweep(x):
        return _sweep_cols(x, w, mask)

    # --- top-limb renormalization -------------------------------------
    # The sweep keeps the top limb's overflow in place ("exact"), so a
    # REDC output can carry a +/-k*2^(w(L-1)+s) representation offset —
    # value-correct mod p, but magnitude ~R. Magnitude-R values are a
    # FIXED POINT of mont_mul (R*R/R = R) and the RCB16 add chains then
    # amplify them ~8x per point-op until int32 limbs overflow (~7 ops).
    # Observed in the wild: a secp256k1 window-sum doubling ladder fed a
    # y-coordinate represented as Y - R (fuzz_e2e seed 0 trial 1, r4).
    # Fix: fold the top limb's excess k = t >> s back in as k * C where
    # C = 2^(w(L-1)+s) mod p — exact congruence, and every mul output
    # returns to magnitude <= ~32p, restoring the kernel-wide invariant
    # for every curve and every add/sub dataflow.
    pbits = cfg.curve.modulus.bit_length()
    s = max(0, pbits + 3 - w * (L - 1))
    assert s < w, (s, w, L, pbits)  # R = 2^(wL) >= 64p guarantees this
    _c_fold = [
        int(v)
        for v in int_to_limbs(
            (1 << (w * (L - 1) + s)) % cfg.curve.modulus, w, L
        )
    ]

    def renorm(x, final_sweep: bool):
        """Input must be swept (limbs ~2^w) so k stays small. At steady
        state |k| <= ~4, so the un-swept fold (dirty exit) leaves limbs
        within the dirty tolerance the downstream f_add/f_sub absorb."""
        t = x[L - 1 :]
        k = t >> s  # arithmetic shift: sign-correct fold count
        c_col = jnp.concatenate(
            [jnp.full((1, 1), v, jnp.int32) for v in _c_fold], axis=0
        )
        out = jnp.concatenate([x[: L - 1], t - (k << s)], axis=0) + k * c_col
        return sweep(out) if final_sweep else out

    def add(a, b):
        return sweep(a + b)

    def sub(a, b):
        return sweep(a - b)

    def add_raw(a, b):
        """No-sweep add: only for values feeding another add/sub (bounds
        grow by one bit; never feed a mul without an intervening sweep)."""
        return a + b

    # phase-1 step width: amortizes the scratch load/add/store over S1
    # a-limbs per pass.
    S1 = next(s for s in (4, 3, 2, 1) if L % s == 0)
    # --- difference-Karatsuba eligibility (cfg.karatsuba, r5) ----------
    # a*b = c00 + X^h*(c00 + c11 - cdd) + X^2h*c11 with cdd = (a0-a1)(b0-b1):
    # 3 half convolutions (3*h*(h+Sh-1) mul rows vs schoolbook L*(L+S1-1))
    # at the price of extra window-accumulate adds and ONE mid-sweep of the
    # overlap rows [h, 3h) — required to keep the int32 columns in budget:
    #  * pre-mid-sweep peak (c00 + c11 overlap at column 2h-1): 2h products
    #    of swept operands (<= BOUND each) + merged-pair residue;
    #  * post-mid-sweep cdd accumulation: h products of the SWEPT
    #    differences — non-top diff limbs <= 2^w + 4, the top diff limb
    #    keeps its overflow (<= 2*BOUND + 4), two such terms per column.
    _kara = cfg.karatsuba
    if _kara:
        assert karatsuba_ok(cfg), (
            w, L, "karatsuba ineligible: odd num_words or int32 column "
            "budget (pre-mid-sweep 2h*B^2 / difference-conv) overflows",
        )
    # Column budget, proved against what the kernel actually relies on:
    # a middle schoolbook column accumulates up to L products across ALL
    # passes before the single sweep, and swept operand limbs are bounded
    # by 2^w + c, c <= 128 (worst chain: f_add(f_add_raw(t0,t0), t0) of
    # dirty ~2^(w+4.6) mul outputs sweeps to 2^w + 2^6.2; packed kernel
    # inputs are < 2^w + 2^5; top limbs stay in range because |value| is
    # bounded ~10p and R >= 64p).
    BOUND = (1 << w) + 128
    assert L * BOUND * BOUND < (1 << 31), (w, L)
    # REDC columns: post-sweep residue + up to L exact m*q products + the
    # pushed carries (< 2^18)
    assert (
        L * ((1 << w) - 1) ** 2 + (1 << 18) + (1 << (w + 5)) < (1 << 31)
    ), (w, L)

    def _phase1(a, b, accumulate: bool, negate: bool = False):
        """Schoolbook a*b columns into acc_ref rows [0, 2L). With
        ``accumulate`` the products add on top of the (already swept)
        existing columns — the merged-REDC path; ``negate`` subtracts
        them instead (signed columns; sweeps and REDC are sign-clean on
        int32 two's complement)."""
        T = a.shape[-1]
        zrow = jnp.zeros((1, T), dtype=jnp.int32)

        def at_offset(v, j, width):
            # v [L, T] placed at row offset j within a width-row window
            return jnp.concatenate(
                [zrow] * j + [v] + [zrow] * (width - L - j), axis=0
            ) if (j or width != L) else v

        W1 = L + S1 - 1
        b_ext = [at_offset(b, j, W1) for j in range(S1)]
        sgn = -1 if negate else 1
        first = a[0:1] * b_ext[0]
        for j in range(1, S1):
            first = first + a[j : j + 1] * b_ext[j]
        if accumulate:
            acc_ref[0:W1] += sgn * first
        else:
            acc_ref[0:W1] = first
            acc_ref[W1 : 2 * L + 1] = jnp.zeros_like(
                acc_ref[W1 : 2 * L + 1]
            )
        for i in range(S1, L, S1):
            s = a[i : i + 1] * b_ext[0]
            for j in range(1, S1):
                s = s + a[i + j : i + j + 1] * b_ext[j]
            acc_ref[i : i + W1] += sgn * s
        # one parallel sweep: columns -> < 2^13 + 2^18
        acc_ref[:] = sweep(acc_ref[:])

    def _phase1_kara(a, b, accumulate: bool, negate: bool = False):
        """Difference-Karatsuba a*b columns into acc_ref rows [0, 2L):
        a*b = c00*(1 + X^h) + c11*(X^h + X^2h) - cdd*X^h with
        cdd = (a0-a1)(b0-b1) — 3 half-size schoolbook convolutions
        (3*h*(h+Sh-1) mul rows vs L*(L+S1-1)), each accumulated at its
        window offset(s); the SWEPT differences and the mid-sweep of the
        overlap rows keep every int32 column inside the budget asserted
        at the eligibility gate above. Same exit state as _phase1: one
        final full sweep, columns < 2^w + 2^18."""
        T = a.shape[-1]
        h2 = L // 2
        zrow = jnp.zeros((1, T), dtype=jnp.int32)
        sgn = -1 if negate else 1
        if not accumulate:
            acc_ref[:] = jnp.zeros_like(acc_ref[:])
        a0, a1 = a[:h2], a[h2:]
        b0, b1 = b[:h2], b[h2:]
        da = sweep(a0 - a1)
        db = sweep(b0 - b1)
        Sh = next(s for s in (2, 1) if h2 % s == 0)
        Wh = h2 + Sh - 1

        def conv_passes(x, y):
            y_ext = [
                jnp.concatenate(
                    [zrow] * j + [y] + [zrow] * (Wh - h2 - j), axis=0
                )
                if (j or Wh != h2)
                else y
                for j in range(Sh)
            ]
            for i in range(0, h2, Sh):
                s = x[i : i + 1] * y_ext[0]
                for j in range(1, Sh):
                    s = s + x[i + j : i + j + 1] * y_ext[j]
                yield i, s

        for i, s in conv_passes(a0, b0):  # c00 -> offsets 0 and h
            acc_ref[i : i + Wh] += sgn * s
            acc_ref[h2 + i : h2 + i + Wh] += sgn * s
        for i, s in conv_passes(a1, b1):  # c11 -> offsets h and 2h
            acc_ref[h2 + i : h2 + i + Wh] += sgn * s
            acc_ref[2 * h2 + i : 2 * h2 + i + Wh] += sgn * s
        # mid-sweep of the c00/c11/cdd overlap window before cdd lands
        # (value-preserving; the slice top row keeps its own overflow and
        # is re-swept by the final full sweep)
        acc_ref[h2 : 3 * h2] = sweep(acc_ref[h2 : 3 * h2])
        for i, s in conv_passes(da, db):  # -cdd -> offset h
            acc_ref[h2 + i : h2 + i + Wh] += (-sgn) * s
        acc_ref[:] = sweep(acc_ref[:])

    phase1 = _phase1_kara if _kara else _phase1

    def _redc(T, dirty: bool):
        # phase 2: REDC, RW low rows cleared per pass. Widening amortizes
        # the (L+RW)-row scratch read-modify-write over RW limbs (the m_j*q
        # MAC count per limb is fixed at L; the RMW traffic is ~2(L+RW)/RW
        # row-ops per limb — 21 at RW=2, 12 at RW=4). The m_j chain inside
        # a pass resolves each low row with the carries and cross-terms of
        # the pass's earlier m's before deriving the next m (same recurrence
        # as the 2-wide version, extended).
        zrow = jnp.zeros((1, T), dtype=jnp.int32)
        qb = q_col + jnp.zeros((L, T), jnp.int32)
        RW = next(rw for rw in (4, 3, 2, 1) if L >= rw)
        q_ext = [
            jnp.concatenate([zrow] * j + [qb] + [zrow] * (RW - 1 - j), axis=0)
            for j in range(RW)
        ]  # each [L+RW-1, T]
        i = 0
        while i < L:
            rw = min(RW, L - i)
            ms = []
            r = acc_ref[i : i + 1]
            for j in range(rw):
                mj = ((r & mask) * n0) & mask
                ms.append(mj)
                if j + 1 < rw:
                    c = (r + mj * q_col[0:1]) >> w
                    r = acc_ref[i + j + 1 : i + j + 2] + c
                    for k in range(j + 1):
                        r = r + ms[k] * q_col[j + 1 - k : j + 2 - k]
            if rw == RW:
                s = ms[0] * q_ext[0]
                for j in range(1, rw):
                    s = s + ms[j] * q_ext[j]
                acc_ref[i : i + L + RW - 1] += s
            else:  # tail pass (L % RW != 0): narrower extension
                s = jnp.concatenate(
                    [ms[0] * qb] + [zrow] * (rw - 1), axis=0
                )
                for j in range(1, rw):
                    s = s + jnp.concatenate(
                        [zrow] * j + [ms[j] * qb] + [zrow] * (rw - 1 - j),
                        axis=0,
                    )
                acc_ref[i : i + L + rw - 1] += s
            for j in range(rw):  # push the resolved low rows' carries up
                acc_ref[i + j + 1 : i + j + 2] += (
                    acc_ref[i + j : i + j + 1] >> w
                )
            i += rw
        # result = rows L..2L (the /R shift); fold the top overflow row
        out = acc_ref[L : 2 * L]
        out = jnp.concatenate(
            [out[: L - 1], out[L - 1 :] + (acc_ref[2 * L : 2 * L + 1] << w)],
            axis=0,
        )
        if dirty:
            return renorm(sweep(out), final_sweep=False)
        return renorm(sweep(out), final_sweep=True)

    def mont_mul(a, b):
        """Fixed-position CIOS, S1 a-limbs per accumulation pass;
        |out| < ab/R + p + eps like FieldCtx."""
        phase1(a, b, accumulate=False)
        return _redc(a.shape[-1], dirty_mul_out)

    def mont_mul2(a1, b1, a2, b2, negate2: bool = False):
        """Merged-REDC product pair: REDC(a1*b1 +/- a2*b2) — ONE Montgomery
        reduction for two schoolbook products. The RCB16 tails are exactly
        this shape (x3 = t3*t1 - t4*y3; y3 = t1m*z3 + y3*t0_3;
        z3 = z3*t4 + t0_3*t3), so each of those three outputs saves a full
        REDC pass (~800 of ~1600 row-ops/mul, minus one extra sweep).

        Congruence: REDC(A + B) = REDC(A) + REDC(B) mod p, with |out| <
        (|A|+|B|)/R + p — one bit looser than a single product, absorbed by
        the balanced representation. Column budget: conv1 is swept before
        conv2 accumulates, so peak columns are L*BOUND^2 + 2^18, within the
        phase-1 assert.

        The output is ALWAYS fully swept (never dirty): these merged values
        are the kernel outputs that feed the next step's multiplies
        directly, with no re-normalizing f_add/f_sub in between (the
        normalization the dirty contract relies on)."""
        phase1(a1, b1, accumulate=False)
        phase1(a2, b2, accumulate=True, negate=negate2)
        return _redc(a1.shape[-1], dirty=False)

    return add, sub, mont_mul, add_raw, mont_mul2


def aux_b3_limbs(cfg: MsmConfig):
    """The [L, 1] constant column every add/madd kernel takes alongside the
    modulus: R mod p when the small-b3 fast path is active (used to fold the
    top-limb excess of the plain-integer 3b multiply), else mont(3b) (the
    Montgomery multiplier)."""
    v = cfg.r if cfg.small_b3 is not None else (
        3 * cfg.curve.b * cfg.r
    ) % cfg.curve.modulus
    return int_to_limbs(v, cfg.word_size, cfg.num_words).astype(np.int32)[
        :, None
    ]


def _make_mul_b3(cfg: MsmConfig, aux_col, f_mul):
    """Multiply a Montgomery-form [L, T] value by 3b.

    Small-b3 curves (every shipped one: BN254 3b=9, BLS12-377 3, Pasta 15):
    k * (xR) = (kx)R, so a plain VPU integer multiply + sweep suffices —
    ~10L row-ops instead of a ~2300-op mont_mul. The sweep leaves the 9x
    top-limb excess e in place (there is no limb above), which would let
    two such results overflow an int32 product column when multiplied
    together; fold it back with e*2^(w*L) == e*(R mod p) (aux_col = R mod p
    limbs), restoring a <= 2^(w+1) top limb. Otherwise aux_col = mont(3b)
    and this is a plain mont_mul."""
    w, L, mask = cfg.word_size, cfg.num_words, cfg.mask
    if cfg.small_b3 is None:
        return lambda t: f_mul(t, aux_col + jnp.zeros_like(t))
    k = np.int32(cfg.small_b3)

    def mul_b3(t):
        s = _sweep_cols(t * k, w, mask)
        e = s[L - 1 :] >> w  # top-limb excess, |e| <= 3b
        out = jnp.concatenate([s[: L - 1], s[L - 1 :] - (e << w)], axis=0)
        return _sweep_cols(out + e * aux_col, w, mask)

    return mul_b3


def _rcb16_add(cfg: MsmConfig):
    """Complete projective addition (RCB16 Algorithm 7, a=0) on limbs-first
    [L, T] coordinate arrays — same formula sequence as CurveCtx.add.
    ``q_col``/``aux_col`` arrive as [L, 1] traced inputs (aux_b3_limbs)."""

    def add_points(q_col, aux_col, acc_ref, x1, y1, z1, x2, y2, z2):
        f_add, f_sub, f_mul, f_add_raw, f_mul2 = _make_field_ops(
            cfg, q_col, acc_ref, dirty_mul_out=cfg.small_b3 is not None
        )
        mul_b3 = _make_mul_b3(cfg, aux_col, f_mul)

        t0 = f_mul(x1, x2)
        t1 = f_mul(y1, y2)
        t2 = f_mul(z1, z2)
        t3 = f_mul(f_add(x1, y1), f_add(x2, y2))
        t3 = f_sub(t3, f_add_raw(t0, t1))
        t4 = f_mul(f_add(y1, z1), f_add(y2, z2))
        t4 = f_sub(t4, f_add_raw(t1, t2))
        t5 = f_mul(f_add(x1, z1), f_add(x2, z2))
        t5 = f_sub(t5, f_add_raw(t0, t2))
        t0_3 = f_add(f_add_raw(t0, t0), t0)
        t2b = mul_b3(t2)
        z3 = f_add(t1, t2b)
        t1m = f_sub(t1, t2b)
        y3 = mul_b3(t5)
        # merged-REDC tails: one Montgomery reduction per output
        x3 = f_mul2(t3, t1m, t4, y3, negate2=True)
        y3 = f_mul2(t1m, z3, y3, t0_3)
        z3 = f_mul2(z3, t4, t0_3, t3)
        return x3, y3, z3

    return add_points


@functools.lru_cache(maxsize=None)
def make_point_add(
    cfg: MsmConfig, tile: int = DEFAULT_TILE, interpret: bool = False
):
    """Build the fused point-add: ([B,L]x3, [B,L]x3) -> [B,L]x3, B % tile == 0.

    Returns a jit-compatible function over raw coordinate arrays (PointBatch
    integration lives in ops/curve.py to avoid a circular import).
    """
    L = cfg.num_words
    aux_np = aux_b3_limbs(cfg)
    q_np = int_to_limbs(cfg.curve.modulus, cfg.word_size, L).astype(np.int32)[
        :, None
    ]
    add_points = _rcb16_add(cfg)

    def kernel(q, aux, ax, ay, az, bx, by, bz, ox, oy, oz, acc_ref):
        ins = [r[:].T for r in (ax, ay, az, bx, by, bz)]  # [L, tile]
        x3, y3, z3 = add_points(q[:], aux[:], acc_ref, *ins)
        ox[:] = x3.T
        oy[:] = y3.T
        oz[:] = z3.T

    def point_add(ax, ay, az, bx, by, bz):
        B = ax.shape[0]
        assert B % tile == 0, (B, tile)
        grid = (B // tile,)
        spec = pl.BlockSpec((tile, L), lambda i: (i, 0), memory_space=pltpu.VMEM)
        cspec = pl.BlockSpec((L, 1), lambda i: (0, 0), memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((B, L), jnp.int32)
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[cspec, cspec] + [spec] * 6,
            out_specs=(spec, spec, spec),
            out_shape=(out_shape, out_shape, out_shape),
            scratch_shapes=[pltpu.VMEM((2 * L + 1, tile), jnp.int32)],
            interpret=interpret,
        )(jnp.asarray(q_np), jnp.asarray(aux_np), ax, ay, az, bx, by, bz)

    return point_add
