from msm_tpu.utils.limbs import (
    bytes_to_points,
    bytes_to_scalars,
    int_to_limbs,
    int_to_u16_words,
    ints_to_limbs,
    ints_to_u16_words,
    limbs_to_int,
    limbs_to_ints,
    points_to_bytes,
    scalars_to_bytes,
    u16_words_to_int,
)

__all__ = [
    "bytes_to_points",
    "bytes_to_scalars",
    "int_to_limbs",
    "int_to_u16_words",
    "ints_to_limbs",
    "ints_to_u16_words",
    "limbs_to_int",
    "limbs_to_ints",
    "points_to_bytes",
    "scalars_to_bytes",
    "u16_words_to_int",
]
