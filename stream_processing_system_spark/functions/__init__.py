"""Reusable column expressions (the engine's scalar-function layer).

Reference parity: SURVEY.md §2.8 (X1-X8). Every expression here is a
built-in `pyspark.sql.functions` composition — JVM-side, inside
whole-stage codegen, no Python in the hot path.
"""

from stream_processing_system_spark.functions.scalar import (
    cosine_similarity,
    dot_product,
    first_token,
    is_noise_line,
    lenient_int,
    md5_prefix_long,
    tokenize,
    vector_norm,
)

__all__ = [
    "tokenize",
    "first_token",
    "is_noise_line",
    "lenient_int",
    "md5_prefix_long",
    "cosine_similarity",
    "dot_product",
    "vector_norm",
]
