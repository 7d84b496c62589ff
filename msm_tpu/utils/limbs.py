"""Limb / byte serialization between python ints, numpy arrays and the wire.

TPU-native analogue of the reference's bignum/serialization layer
(``src/cuzk/utils.rs:24-196``): field elements cross the host↔device boundary
as ``num_words`` limbs of ``word_size`` bits, each limb stored in one 32-bit
lane (the reference packs 13-bit limbs into u32 storage words the same way).

Array convention throughout the framework: **limb axis last**, batch axes
leading — ``[..., num_words]`` int32/uint32, little-endian limb order
(limb 0 = least significant), exactly like ``BigInt{limbs:[u32;20]}``
(``src/cuzk/wgsl/struct/structs.template.wgsl:1-17``) but vectorized.
"""

from __future__ import annotations

import numpy as np


def int_to_limbs(x: int, word_size: int, num_words: int) -> np.ndarray:
    """Little-endian fixed-width limb decomposition of a nonneg int.

    Reference: ``bigint_to_limbs`` / ``to_words_le`` (utils.rs:24-109).
    """
    if x < 0:
        raise ValueError("negative")
    mask = (1 << word_size) - 1
    out = np.empty(num_words, dtype=np.uint32)
    for i in range(num_words):
        out[i] = x & mask
        x >>= word_size
    if x:
        raise ValueError("value does not fit in num_words limbs")
    return out


def limbs_to_int(limbs: np.ndarray, word_size: int) -> int:
    """Inverse of int_to_limbs (utils.rs:129-147 equivalent). Handles signed
    (balanced-representation) limbs exactly: value = sum limb_i * 2^(w*i)."""
    arr = np.asarray(limbs)
    if arr.dtype == np.uint32 or arr.dtype == np.uint64:
        vals = arr.astype(np.uint64).tolist()
    else:
        vals = arr.astype(np.int64).tolist()
    x = 0
    for i, limb in enumerate(vals):
        x += int(limb) << (i * word_size)
    return x


def ints_to_limbs(xs: list[int], word_size: int, num_words: int) -> np.ndarray:
    """Batch variant: [n] python ints -> uint32[n, num_words]."""
    out = np.empty((len(xs), num_words), dtype=np.uint32)
    for i, x in enumerate(xs):
        out[i] = int_to_limbs(x, word_size, num_words)
    return out


def limbs_to_ints(arr: np.ndarray, word_size: int) -> list[int]:
    arr = np.asarray(arr)
    flat = arr.reshape(-1, arr.shape[-1])
    return [limbs_to_int(row, word_size) for row in flat]


# ---------------------------------------------------------------------------
# Wire formats (the reference's GPU byte formats)
# ---------------------------------------------------------------------------


def int_to_u16_words(x: int, num_u16: int = 16) -> np.ndarray:
    """256-bit int -> sixteen 16-bit words LE, stored one-per-u32 lane.

    This is the reference's scalar/coordinate wire format into stage 1: bytes
    are repacked to 16x16-bit chunks on the GPU
    (``decompose_scalars.template.wgsl:41-53``); we pre-pack on the host.
    """
    out = np.empty(num_u16, dtype=np.uint32)
    for i in range(num_u16):
        out[i] = (x >> (16 * i)) & 0xFFFF
    return out


def ints_to_u16_words(xs: list[int], num_u16: int = 16) -> np.ndarray:
    out = np.empty((len(xs), num_u16), dtype=np.uint32)
    for i, x in enumerate(xs):
        out[i] = int_to_u16_words(x, num_u16)
    return out


def u16_words_to_int(words: np.ndarray) -> int:
    x = 0
    for i, w in enumerate(np.asarray(words, dtype=np.uint64).tolist()):
        x |= int(w) << (16 * i)
    return x


def scalars_to_bytes(scalars: list[int], nbytes: int = 32) -> bytes:
    """LE byte serialization (reference ``scalars_to_bytes``, lib.rs:50-57)."""
    return b"".join(s.to_bytes(nbytes, "little") for s in scalars)


def bytes_to_scalars(data: bytes, nbytes: int = 32) -> list[int]:
    return [
        int.from_bytes(data[i : i + nbytes], "little")
        for i in range(0, len(data), nbytes)
    ]


def points_to_bytes(points_affine: list[tuple[int, int]], nbytes: int = 32) -> bytes:
    """Affine (x, y) pairs, LE bytes (reference ``points_to_bytes``,
    lib.rs:59-65)."""
    return b"".join(
        x.to_bytes(nbytes, "little") + y.to_bytes(nbytes, "little")
        for x, y in points_affine
    )


def bytes_to_points(data: bytes, nbytes: int = 32) -> list[tuple[int, int]]:
    stride = 2 * nbytes
    out = []
    for i in range(0, len(data), stride):
        x = int.from_bytes(data[i : i + nbytes], "little")
        y = int.from_bytes(data[i + nbytes : i + stride], "little")
        out.append((x, y))
    return out
