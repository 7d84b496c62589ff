"""Stage-1 scalar decomposition: vectorized window extraction + signed
recoding (the TPU analogue of ``decompose_scalars.template.wgsl:83-112`` /
CPU model ``test/utils.rs:121-161``).

Scalars arrive as sixteen 16-bit words each (LE, one word per int32 lane —
the same wire format the reference repacks to on the GPU,
``decompose_scalars.template.wgsl:41-53``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("chunk_size", "num_subtasks"))
def extract_windows(
    scalars_u16: jax.Array, chunk_size: int, num_subtasks: int
) -> jax.Array:
    """Unsigned window extraction: [n, 16] u16-words -> int32 [S, n] windows,
    window j = bits [c*j, c*j + c) of the 256-bit scalar.
    (extract_word_from_bytes_le.template.wgsl:1-25, vectorized.)"""
    c = chunk_size
    mask = (1 << c) - 1
    nwords = scalars_u16.shape[-1]
    outs = []
    for j in range(num_subtasks):
        lo_bit = c * j
        a, off = divmod(lo_bit, 16)
        if a >= nwords:  # window lies entirely past the serialized words
            outs.append(jnp.zeros_like(scalars_u16[:, 0]))
            continue
        w = scalars_u16[:, a] >> off
        if off + c > 16 and a + 1 < nwords:
            w = w | (scalars_u16[:, a + 1] << (16 - off))
        outs.append(w & mask)
    return jnp.stack(outs).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("chunk_size",))
def signed_recode(windows: jax.Array, chunk_size: int) -> jax.Array:
    """Unsigned windows [S, n] -> signed digits [S, n] in
    [-2^(c-1), 2^(c-1)-1] (top window in [0, 2^(c-1)) for valid scalars),
    carry-propagated LSB-first: w + carry >= 2^(c-1) -> digit -= 2^c, carry 1
    (decompose_scalars.template.wgsl:89-103)."""
    c = chunk_size
    half = 1 << (c - 1)
    full = 1 << c

    def step(carry, w):
        l = w + carry
        hi = l >= half
        digit = jnp.where(hi, l - full, l)
        return hi.astype(jnp.int32), digit

    carry, digits = jax.lax.scan(step, jnp.zeros_like(windows[0]), windows[:-1])
    top = windows[-1] + carry  # top window absorbs the final carry
    return jnp.concatenate([digits, top[None]], axis=0)


@functools.partial(jax.jit, static_argnames=("chunk_size", "num_subtasks"))
def decompose_signed(
    scalars_u16: jax.Array, chunk_size: int, num_subtasks: int
) -> tuple[jax.Array, jax.Array]:
    """Full stage-1 scalar path: returns (keys [S, n] = |digit| as bucket
    index in [0, 2^(c-1)], signs [S, n] bool = digit < 0)."""
    w = extract_windows(scalars_u16, chunk_size, num_subtasks)
    d = signed_recode(w, chunk_size)
    return jnp.abs(d), d < 0
