"""Pallas TPU kernel: fused stage-1 point conversion.

The reference's stage-1 per-point work (``decompose_scalars.template.wgsl:
41-70``): repack 16-bit coordinate words into word_size-bit limbs and convert
to Montgomery form (one field mul by R^2). The XLA version costs ~96 ms at
2^20 (two 20-step mont_mul scans round-tripping HBM); this kernel fuses
word-extraction + the constant multiply + 16-bit re-packing into one pass
and emits the scan kernel's packed wire format [n, 2P] directly — the
unpacked PointBatch never materializes on the fused path.
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


def _pack_rows(x: jax.Array) -> jax.Array:
    """[L, tile] nonneg balanced limbs -> [P, tile] 16-bit packed.
    (reshape-based row pairing — strided sublane slices don't lower)."""
    L, T = x.shape
    if L % 2:
        x = jnp.concatenate([x, jnp.zeros_like(x[0:1])], axis=0)
    xr = x.reshape((L + 1) // 2, 2, T)
    return xr[:, 0, :] | (xr[:, 1, :] << 16)


@functools.lru_cache(maxsize=None)
def make_convert_pack(
    cfg: MsmConfig,
    tile: int = DEFAULT_TILE,
    interpret: bool = False,
    x_scale_int: int | None = None,
):
    """Build the fused converter: (x_u16 [n, Wu], y_u16 [n, Wu]) ->
    packed [n, 2P] Montgomery-form coordinates (pallas_scan wire format).

    ``x_scale_int`` overrides the to-Montgomery constant for x (default
    R^2, i.e. x -> x*R). The GLV phi-table build passes beta*R^2: the
    endomorphism phi(x, y) = (beta*x, y) and the Montgomery conversion
    become the SAME single multiply (mont_mul(x, beta*R^2) = beta*x*R)."""
    L = cfg.num_words
    w, mask = cfg.word_size, cfg.mask
    P = (L + 1) // 2
    assert tile % 8 == 0, tile
    Wu = (max(cfg.curve.modulus_bits, 16) + 15) // 16
    q_np = int_to_limbs(cfg.curve.modulus, w, L).astype(np.int32)[:, None]
    r2_np = int_to_limbs(cfg.r2, w, L).astype(np.int32)[:, None]
    xs_np = r2_np if x_scale_int is None else int_to_limbs(
        x_scale_int % cfg.curve.modulus, w, L
    ).astype(np.int32)[:, None]

    def kernel(q, r2, xsc, xr, yr, out, acc_ref):
        _, _, f_mul, _, _ = _make_field_ops(cfg, q[:], acc_ref)
        r2b = r2[:] + jnp.zeros((L, tile), jnp.int32)
        xscb = xsc[:] + jnp.zeros((L, tile), jnp.int32)
        cols = []
        for ref, scale in ((xr, xscb), (yr, r2b)):
            limbs = _extract_limbs(ref[:].T, w, L, mask)
            cols.append(_pack_rows(f_mul(limbs, scale)))
        out[:] = jnp.concatenate(cols, axis=0).T  # [tile, 2P]

    def convert_pack(x_u16, y_u16):
        n = x_u16.shape[0]
        assert n % tile == 0, (n, tile)
        assert x_u16.shape[1] == Wu, (x_u16.shape, Wu)
        grid = (n // tile,)
        inspec = pl.BlockSpec(
            (tile, Wu), lambda i: (i, 0), memory_space=pltpu.VMEM
        )
        outspec = pl.BlockSpec(
            (tile, 2 * P), lambda i: (i, 0), memory_space=pltpu.VMEM
        )
        cspec = pl.BlockSpec((L, 1), lambda i: (0, 0), memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[cspec, cspec, cspec, inspec, inspec],
            out_specs=outspec,
            out_shape=jax.ShapeDtypeStruct((n, 2 * P), jnp.int32),
            scratch_shapes=[pltpu.VMEM((2 * L + 1, tile), jnp.int32)],
            interpret=interpret,
        )(
            jnp.asarray(q_np), jnp.asarray(r2_np), jnp.asarray(xs_np),
            x_u16, y_u16,
        )

    return convert_pack
