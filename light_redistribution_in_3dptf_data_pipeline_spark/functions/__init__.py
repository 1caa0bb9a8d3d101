"""Engine scalar-function surface: reusable Column builders."""

from .columns import (  # noqa: F401
    DEG2RAD,
    normalize_text,
    redact_pii_cols,
    decimal_components,
    decimal_dot,
    nano_components,
    euler_zyx_matrix_cols,
    homogeneous_transform_cols,
    l2_distance,
    ngram_shingles,
    pose_grid_df,
    seconds_between,
    whitespace_tokens,
)
