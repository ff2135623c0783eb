"""Scalar-function layer: column-expression builders (JVM-side, no UDFs
unless semantically unavoidable)."""

from openmaptiles_zh_modifier_spark.functions.zh import (
    HAN_REGEX,
    is_han,
    nullif_empty,
    to_simplified,
    to_traditional,
)

__all__ = [
    "HAN_REGEX",
    "is_han",
    "nullif_empty",
    "to_simplified",
    "to_traditional",
]
