"""Pallas TPU kernel: MXU bucket-count histogram.

Role: the bucket-ends stage (ends[b] = #{keys <= b}) that replaces the
reference's atomic histogram inside the sparse transpose
(``transpose.template.wgsl:53-55``). The XLA formulation (one-hot hi/lo
matmul at the jnp level) works but forces a choice between two bad
lowerings: operand-fused one-hots fall off the MXU into an s32 VPU loop
(~26 ms per 4x2^20), while materialized one-hots cost ~45 ms of pure HBM
writes for ~400 MB of intermediates. Here the one-hots are built in VMEM
per 2048-key chunk and immediately consumed by an in-kernel bf16 dot —
the only HBM traffic is the keys in (4 MB/subtask) and the histogram out
(132 KB). f32 MXU accumulation is exact for counts < 2^24.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK = 8192


@functools.lru_cache(maxsize=None)
def make_bucket_hist(
    n: int,
    num_buckets: int,
    chunk: int = CHUNK,
    interpret: bool = False,
):
    """Build the histogram: int32 keys [n] in [0, num_buckets) ->
    counts [H*256] int32 (H = ceil(num_buckets/256) rounded up to a
    multiple of 8 rows; entries >= num_buckets are zero)."""
    assert n % chunk == 0, (n, chunk)
    # f32 MXU accumulation is exact only while every histogram cell stays
    # below 2^24; bucket 0 can absorb ALL of n (padding/zero digits), so n
    # itself must be bounded (callers above this fall back to the int32
    # XLA formulation in ops/scan._counts_leq)
    assert n < (1 << 24), f"n={n} >= 2^24 would overflow f32 MXU counts"
    H = (num_buckets + 255) // 256
    H8 = -(-H // 8) * 8
    C = n // chunk

    def kernel(kref, oref, hacc):
        c = pl.program_id(0)

        @pl.when(c == 0)
        def _():
            hacc[:] = jnp.zeros_like(hacc)

        k = kref[0, 0]  # [chunk] int32
        hi = (k >> 8)[None, :]  # [1, chunk]
        lo = (k & 255)[:, None]  # [chunk, 1]
        rows = jax.lax.broadcasted_iota(jnp.int32, (H8, chunk), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (chunk, 256), 1)
        oh_hi = (hi == rows).astype(jnp.bfloat16)  # [H8, chunk]
        oh_lo = (lo == cols).astype(jnp.bfloat16)  # [chunk, 256]
        hacc[:] += jax.lax.dot_general(
            oh_hi,
            oh_lo,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        @pl.when(c == C - 1)
        def _():
            oref[:] = hacc[:].astype(jnp.int32)

    def bucket_hist(keys):
        assert keys.shape == (n,), keys.shape
        # the singleton middle axis keeps the block's last two dims at
        # (1, chunk) == the array dims, satisfying the TPU block-shape rule
        # even when vmap prepends a batch dimension
        kspec = pl.BlockSpec(
            (1, 1, chunk), lambda c: (c, 0, 0), memory_space=pltpu.VMEM
        )
        ospec = pl.BlockSpec(
            (H8, 256), lambda c: (0, 0), memory_space=pltpu.VMEM
        )
        out = pl.pallas_call(
            kernel,
            grid=(C,),
            in_specs=[kspec],
            out_specs=ospec,
            out_shape=jax.ShapeDtypeStruct((H8, 256), jnp.int32),
            scratch_shapes=[pltpu.VMEM((H8, 256), jnp.float32)],
            interpret=interpret,
        )(keys.reshape(C, 1, chunk))
        return out.reshape(H8 * 256)

    return bucket_hist
