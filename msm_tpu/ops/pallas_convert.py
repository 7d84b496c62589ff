"""Pallas TPU kernel: fused stage-1 point conversion.

The reference's stage-1 per-point work (``decompose_scalars.template.wgsl:
41-70``): repack 16-bit coordinate words into word_size-bit limbs and convert
to Montgomery form (one field mul by R^2). The XLA version costs ~96 ms at
2^20 (two 20-step mont_mul scans round-tripping HBM); this kernel fuses
word-extraction + the constant multiply + canonicalization + dense 32-bit
re-packing into one pass and emits the scan kernel's dense wire format
[n, 2D] (pallas_scan.coord_words) directly — the unpacked PointBatch never
materializes on the fused path. Canonicalizing here (a ~200-row-op ripple
+ conditional subtract, once per point) is what lets the gather rows drop
from 80 B to 64 B: dense radix-2^32 packing needs standard nonneg limbs.
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

DEFAULT_TILE = 1024


def _extract_limbs(wordsT: jax.Array, w: int, L: int, mask: int) -> jax.Array:
    """[Wu, tile] 16-bit words -> [L, tile] w-bit limbs (static bit math;
    the vectorized extract_word_from_bytes_le, reference :1-25)."""
    Wu = wordsT.shape[0]
    rows = []
    zero = jnp.zeros_like(wordsT[0:1])
    for i in range(L):
        lo_bit = w * i
        a, off = divmod(lo_bit, 16)
        if a >= Wu:
            rows.append(zero)
            continue
        v = wordsT[a : a + 1] >> off
        if off + w > 16 and a + 1 < Wu:
            v = v | (wordsT[a + 1 : a + 2] << (16 - off))
        rows.append(v & mask)
    return jnp.concatenate(rows, axis=0)


def _canonical_rows(x: jax.Array, cfg: MsmConfig) -> jax.Array:
    """[L, tile] nonneg balanced limbs (value < 2p) -> canonical standard
    limbs of (value mod p), rows-first, in-kernel.

    Ripple-carry normalization (value < 2p < 2^(wL), so the final carry is
    0) followed by ONE conditional subtract of p (sufficient: the convert
    product is < ab/R + p + eps with a, b < p and R >= 64p, i.e. < 2p).
    Modulus limbs are baked in as static scalars."""
    w, L = cfg.word_size, cfg.num_words
    mask = (1 << w) - 1
    q = int_to_limbs(cfg.curve.modulus, w, L).astype(np.int64)
    carry = jnp.zeros_like(x[0:1])
    std = []
    for j in range(L):
        v = x[j : j + 1] + carry
        std.append(v & mask)
        carry = v >> w
    # t = value - p with borrow ripple; keep t iff no final borrow
    borrow = jnp.zeros_like(x[0:1])
    sub = []
    for j in range(L):
        t = std[j] - int(q[j]) - borrow
        sub.append(t & mask)
        borrow = (t >> w) & 1
    ge_p = borrow == 0
    rows = [jnp.where(ge_p, sub[j], std[j]) for j in range(L)]
    return jnp.concatenate(rows, axis=0)


def _pack_rows_dense(x: jax.Array, cfg: MsmConfig) -> jax.Array:
    """[L, tile] CANONICAL standard limbs -> [D, tile] dense radix-2^32
    words (pallas_scan wire format; see pallas_scan._pack_plan)."""
    from msm_tpu.ops.pallas_scan import _pack_plan, coord_words

    w, L, D = cfg.word_size, cfg.num_words, coord_words(cfg)
    words = []
    for contrib in _pack_plan(w, L, D):
        v = None
        for j, s in contrib:
            t = x[j : j + 1] << s if s >= 0 else x[j : j + 1] >> (-s)
            v = t if v is None else v | t
        words.append(v if v is not None else jnp.zeros_like(x[0:1]))
    return jnp.concatenate(words, axis=0)


@functools.lru_cache(maxsize=None)
def make_convert_pack(
    cfg: MsmConfig,
    tile: int = DEFAULT_TILE,
    interpret: bool = False,
    x_scale_int: int | None = None,
    dual_x_scale_int: int | None = None,
    triple: bool = False,
):
    """Build the fused converter: (x_u16 [n, Wu], y_u16 [n, Wu]) ->
    dense-packed [n, 2D] canonical Montgomery-form coordinates
    (pallas_scan wire format, coord_words).

    ``x_scale_int`` overrides the to-Montgomery constant for x (default
    R^2, i.e. x -> x*R). The GLV phi-table build passes beta*R^2: the
    endomorphism phi(x, y) = (beta*x, y) and the Montgomery conversion
    become the SAME single multiply (mont_mul(x, beta*R^2) = beta*x*R).

    ``dual_x_scale_int``: emit a SECOND [n, 2D] output whose x is scaled
    by this constant instead — the GLV (table, phi-table) pair from ONE
    pass: word extraction, the y conversion and its canonicalization are
    shared (3 muls + 3 canonicalizations vs 4 + 4 over two passes, and
    the u16 inputs stream from HBM once).

    ``triple``: with dual_x_scale_int, emit ONE [n, 3D] output with rows
    (x*R, beta*x*R, y*R) instead of two [n, 2D] tables. This is the
    production GLV wire format: the v5e sorted-row gather falls off a
    ~3.4x cliff when the table exceeds ~2^20 rows / ~96 MB (measured,
    scripts/gather_probe.py), so GLV must NOT double the row count — the
    96 B triple row keeps n rows and the scan kernels select x vs beta*x
    per element by the phi flag riding the sort payload (zero extra
    multiplies)."""
    from msm_tpu.ops.pallas_scan import coord_words

    L = cfg.num_words
    w, mask = cfg.word_size, cfg.mask
    D = coord_words(cfg)
    assert tile % 8 == 0, tile
    Wu = (max(cfg.curve.modulus_bits, 16) + 15) // 16
    q_np = int_to_limbs(cfg.curve.modulus, w, L).astype(np.int32)[:, None]
    r2_np = int_to_limbs(cfg.r2, w, L).astype(np.int32)[:, None]
    xs_np = r2_np if x_scale_int is None else int_to_limbs(
        x_scale_int % cfg.curve.modulus, w, L
    ).astype(np.int32)[:, None]
    dual = dual_x_scale_int is not None
    assert not (triple and not dual), "triple mode needs dual_x_scale_int"
    x2_np = None if not dual else int_to_limbs(
        dual_x_scale_int % cfg.curve.modulus, w, L
    ).astype(np.int32)[:, None]
    two_outs = dual and not triple

    def kernel(q, r2, xsc, xsc2, xr, yr, *outs_and_scratch):
        if two_outs:
            out, out2, acc_ref = outs_and_scratch
        else:
            out, acc_ref = outs_and_scratch
            out2 = None
        _, _, f_mul, _, _ = _make_field_ops(cfg, q[:], acc_ref)
        r2b = r2[:] + jnp.zeros((L, tile), jnp.int32)
        xscb = xsc[:] + jnp.zeros((L, tile), jnp.int32)
        xl = _extract_limbs(xr[:].T, w, L, mask)
        yl = _extract_limbs(yr[:].T, w, L, mask)
        ypk = _pack_rows_dense(_canonical_rows(f_mul(yl, r2b), cfg), cfg)
        xpk = _pack_rows_dense(_canonical_rows(f_mul(xl, xscb), cfg), cfg)
        if dual:
            x2b = xsc2[:] + jnp.zeros((L, tile), jnp.int32)
            x2pk = _pack_rows_dense(
                _canonical_rows(f_mul(xl, x2b), cfg), cfg
            )
            if triple:
                out[:] = jnp.concatenate([xpk, x2pk, ypk], axis=0).T
            else:
                out[:] = jnp.concatenate([xpk, ypk], axis=0).T
                out2[:] = jnp.concatenate([x2pk, ypk], axis=0).T
        else:
            out[:] = jnp.concatenate([xpk, ypk], axis=0).T  # [tile, 2D]

    def convert_pack(x_u16, y_u16):
        n = x_u16.shape[0]
        assert n % tile == 0, (n, tile)
        assert x_u16.shape[1] == Wu, (x_u16.shape, Wu)
        grid = (n // tile,)
        W = (3 if triple else 2) * D
        inspec = pl.BlockSpec(
            (tile, Wu), lambda i: (i, 0), memory_space=pltpu.VMEM
        )
        outspec = pl.BlockSpec(
            (tile, W), lambda i: (i, 0), memory_space=pltpu.VMEM
        )
        cspec = pl.BlockSpec((L, 1), lambda i: (0, 0), memory_space=pltpu.VMEM)
        oshape = jax.ShapeDtypeStruct((n, W), jnp.int32)
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[cspec, cspec, cspec, cspec, inspec, inspec],
            out_specs=(outspec, outspec) if two_outs else outspec,
            out_shape=(oshape, oshape) if two_outs else oshape,
            scratch_shapes=[pltpu.VMEM((2 * L + 1, tile), jnp.int32)],
            interpret=interpret,
        )(
            jnp.asarray(q_np), jnp.asarray(r2_np), jnp.asarray(xs_np),
            jnp.asarray(x2_np if dual else xs_np),
            x_u16, y_u16,
        )

    return convert_pack
