"""Portable deterministic hashing helpers.

Every hash that participates in the driver's DuckDB oracle comparison is
derived from md5 (identical bytes in Spark and DuckDB) instead of
xxhash64/hash (engine-specific seeds).  The bigint form takes the first
15 hex digits (60 bits — fits int64 with headroom, no sign issues).

Spark side:   conv(substring(md5(x), 1, 15), 16, 10) :: bigint
DuckDB side:  CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_long(col: Column | str) -> Column:
    """64-bit-safe integer hash of a string column (first 60 bits of md5)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def md5_int32(col: Column | str) -> Column:
    """32-bit integer hash (first 8 hex digits of md5) — used by SimHash."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long")


def md5_long_sql(expr: str) -> str:
    """DuckDB SQL fragment equivalent to :func:`md5_long`."""
    return f"CAST('0x' || substr(md5({expr}), 1, 15) AS BIGINT)"


def md5_int32_sql(expr: str) -> str:
    """DuckDB SQL fragment equivalent to :func:`md5_int32`."""
    return f"CAST('0x' || substr(md5({expr}), 1, 8) AS BIGINT)"
