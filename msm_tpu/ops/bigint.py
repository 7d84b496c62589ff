"""Batched big-integer limb arithmetic in JAX (int32 lanes).

TPU-native analogue of the reference's WGSL bigint library
(``src/cuzk/wgsl/bigint/bigint.template.wgsl:1-63``): fixed-width
little-endian limbs, reduced radix (word_size <= 13 bits) so that limb
products and column accumulations fit in 32-bit lanes without per-step
carries — the same headroom trick the reference proves safe for 13-bit limbs
(``mont_pro_product.template.wgsl:18-23``).

Array convention: limbs on the LAST axis (``[..., L]``), any leading batch
axes; dtype int32. All functions are pure jnp — traceable, vmappable,
shard_map-friendly.

Overflow budget (w = word_size, L = num_words, int32 lanes):
  - limb product: (2^w-1)^2 < 2^(2w)          -> needs 2w <= 26
  - schoolbook column: L * 2^(2w) + carry     -> needs L * 2^(2w) < 2^31
  For w=13, L=20: 20 * 2^26 = 2^30.33 < 2^31.  OK.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def check_overflow_budget(word_size: int, num_words: int) -> None:
    """Reject limb geometries whose column sums could overflow int32 lanes
    (the nSafe analysis of mont_pro_product.template.wgsl:18-23, redone for
    int32).

    Why the lazy path cannot be extended to w=14 (VERDICT r3 item 10 — the
    reference sweeps 13..16-bit words, ``src/cuzk/utils.rs:399-431``, and
    L=19 @ w=14 would save ~10% of the CIOS muls):

    - a full L-term product column at w=14, L=19 needs
      19 * (2^14-1)^2 = 5.0997e9 — over the SIGNED budget 2^31 = 2.147e9
      by 2.37x, and over even an unsigned-uint32 budget 2^32 by 1.19x, so
      no representation trick closes it;
    - the signed budget admits floor((2^31 - 2^19) / (2^14-1)^2) = 7
      accumulated products per column, so each of the two product phases
      of a Montgomery mul (a*b and m*q) needs ceil(19/7) = 3 groups, i.e.
      2 extra carry sweeps per phase = 4 extra sweeps per mont-mul at
      ~3 ops x 2L columns each (~456 row-ops) — versus the saving of
      2*(20^2 - 19^2) = 78 muls (~100 row-ops with their adds). Net
      ~ +350 row-ops per mul (~ +25%): the budget cannot close, it can
      only be paid for at a loss. w=13/L=20 stays the production point;
      w=14..16 remain available through the eager per-step-carry variant
      (ops/field.mont_mul_eager), matching the reference's sweep at
      capability level.
    """
    col_max = num_words * ((1 << word_size) - 1) ** 2 + (1 << 19)
    if col_max >= 1 << 31:
        raise ValueError(
            f"word_size={word_size}, num_words={num_words} overflows int32 "
            f"column accumulation; use word_size <= 13"
        )


@functools.partial(jax.jit, static_argnames=("word_size",))
def sweep(x: jax.Array, word_size: int) -> jax.Array:
    """ONE parallel carry-sweep step (no scan): move each limb's overflow one
    limb up, keeping the top limb's overflow in place (exact — no bits drop).

    This is the workhorse of the lazy/balanced representation: after a sweep,
    limbs are in [-1, 2^w + c] for small c (arithmetic shifts make it exact
    for signed limbs too), while the integer VALUE is unchanged. Repeated
    ops re-sweep instead of fully normalizing — the vector-machine analogue
    of the reference's carry-omission trick (mont_pro_product.template.wgsl:
    18-23), taken further: carries are never serially propagated on the hot
    path at all.
    """
    mask = (1 << word_size) - 1
    carry = x >> word_size  # arithmetic shift: exact floor-div for signed
    lo = x & mask  # two's-complement AND: correct nonneg residue
    shifted = jnp.concatenate([jnp.zeros_like(carry[..., :1]), carry[..., :-1]], axis=-1)
    out = lo + shifted
    # top limb keeps its own overflow (value exactness; bounded because the
    # integer value is bounded)
    return out.at[..., -1].add(carry[..., -1] << word_size)


@functools.partial(jax.jit, static_argnames=("word_size",))
def carry_propagate(x: jax.Array, word_size: int) -> tuple[jax.Array, jax.Array]:
    """Normalize raw limb columns to canonical word_size-bit limbs.

    x: int32 [..., K] with nonnegative limb values (possibly > 2^w).
    Returns (limbs [..., K] all < 2^w, carry_out [...]).
    Sequential carry chain via lax.scan over the limb axis (the GPU does the
    same serially per element; here the batch axes provide the parallelism).
    """
    xm = jnp.moveaxis(x, -1, 0)  # [K, ...]

    def step(carry, limb):
        v = limb + carry
        return v >> word_size, v & ((1 << word_size) - 1)

    carry_out, limbs = jax.lax.scan(step, jnp.zeros_like(xm[0]), xm)
    return jnp.moveaxis(limbs, 0, -1), carry_out


@functools.partial(jax.jit, static_argnames=("word_size",))
def add(a: jax.Array, b: jax.Array, word_size: int) -> tuple[jax.Array, jax.Array]:
    """Limbwise add with carry normalization; returns (sum_limbs, carry_out).
    Reference: bigint_add (bigint.template.wgsl:1-14)."""
    return carry_propagate(a + b, word_size)


@functools.partial(jax.jit, static_argnames=("word_size",))
def sub(a: jax.Array, b: jax.Array, word_size: int) -> tuple[jax.Array, jax.Array]:
    """a - b with borrow chain; returns (diff_limbs, borrow_out in {0,1}).
    If a >= b the borrow_out is 0 and diff is exact.
    Reference: bigint_sub (bigint.template.wgsl:16-34)."""
    am = jnp.moveaxis(a, -1, 0)
    bm = jnp.moveaxis(b, -1, 0)
    base = jnp.int32(1 << word_size)

    def step(borrow, ab):
        ai, bi = ab
        d = ai - bi - borrow
        br = (d < 0).astype(jnp.int32)
        return br, d + br * base

    borrow_out, limbs = jax.lax.scan(step, jnp.zeros_like(am[0]), (am, bm))
    return jnp.moveaxis(limbs, 0, -1), borrow_out


@functools.partial(jax.jit, static_argnames=("word_size",))
def gte(a: jax.Array, b: jax.Array, word_size: int) -> jax.Array:
    """a >= b elementwise over the batch; bool [...]. Reference: bigint_gt
    (bigint.template.wgsl:36-46), via the borrow of a-b."""
    _, borrow = sub(a, b, word_size)
    return borrow == 0


def is_zero(a: jax.Array) -> jax.Array:
    return jnp.all(a == 0, axis=-1)


def eq(a: jax.Array, b: jax.Array) -> jax.Array:
    return jnp.all(a == b, axis=-1)


@jax.jit
def mul_raw(a: jax.Array, b: jax.Array) -> jax.Array:
    """Schoolbook product COLUMNS (no carry pass): int32 [..., 2L-1].

    c_k = sum_{i+j=k} a_i * b_j; each column < L * 2^(2w) (see overflow
    budget). Reference: bigint_mul's accumulation loop
    (bigint.template.wgsl:48-58) with the carry pass deferred.

    Runs as a limb-serial lax.scan in Horner form (c = c<<w + a_i*b, MSB
    limb first) so the compiled graph stays O(1) in L — the graph-size
    analogue of the reference's runtime-templated shaders staying small.
    """
    L = a.shape[-1]
    batch = jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1])
    a = jnp.broadcast_to(a, batch + (L,))
    b = jnp.broadcast_to(b, batch + (L,))
    xs = jnp.moveaxis(a, -1, 0)[::-1]  # a limbs, MSB first
    c0 = jnp.zeros(batch + (2 * L - 1,), dtype=jnp.int32)

    def step(c, a_i):
        # c <<= one limb (toward high), then add a_i * b at the bottom
        c = jnp.concatenate(
            [jnp.zeros_like(c[..., :1]), c[..., :-1]], axis=-1
        )
        c = c.at[..., :L].add(a_i[..., None] * b)
        return c, None

    c, _ = jax.lax.scan(step, c0, xs)
    return c


@functools.partial(jax.jit, static_argnames=("word_size",))
def mul(a: jax.Array, b: jax.Array, word_size: int) -> jax.Array:
    """Full schoolbook multiply -> canonical limbs [..., 2L].
    Reference: bigint_mul (bigint.template.wgsl:48-63)."""
    L = a.shape[-1]
    c = mul_raw(a, b)
    c = jnp.concatenate([c, jnp.zeros_like(c[..., :1])], axis=-1)  # 2L cols
    limbs, carry = carry_propagate(c, word_size)
    # product < 2^(2*w*L) so the final carry is always 0
    return limbs


@functools.partial(jax.jit, static_argnames=("nbits", "word_size", "out_words"))
def shr_bits(x: jax.Array, nbits: int, word_size: int, out_words: int) -> jax.Array:
    """Logical right shift of a limb vector by a static bit count, returning
    out_words limbs. Used by Barrett's high-bit extraction
    (barrett.template.wgsl:47-53)."""
    L = x.shape[-1]
    limb_sh, bit_sh = divmod(nbits, word_size)
    mask = (1 << word_size) - 1
    pad = jnp.zeros(x.shape[:-1] + (out_words + 1,), dtype=x.dtype)
    shifted = jnp.concatenate([x[..., limb_sh:], pad], axis=-1)[
        ..., : out_words + 1
    ]
    if bit_sh == 0:
        return shifted[..., :out_words]
    lo = shifted[..., :out_words] >> bit_sh
    hi = (shifted[..., 1 : out_words + 1] << (word_size - bit_sh)) & mask
    return lo | hi
