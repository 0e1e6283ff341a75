"""Cross-engine deterministic hashing building blocks.

The one hash shape shared by fingerprints, sketches and splits: the first
8 md5 hex digits as a 32-bit integer. DuckDB twin (keep in sync with every
oracle that uses it):
``CAST(concat('0x', substr(md5(x), 1, 8)) AS BIGINT)``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_prefix_long(col: Column) -> Column:
    """First 8 md5 hex digits of ``col`` (a string Column) as a long in
    [0, 2^32). Callers cast non-string inputs with ``.cast("string")`` so
    the bytes hashed match ``CAST(x AS VARCHAR)`` on the DuckDB side."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def md5_slice_long(col: Column, start: int) -> Column:
    """8 md5 hex digits of ``col`` starting at 1-based hex position
    ``start``, as a long in [0, 2^32). DuckDB twin:
    ``CAST(concat('0x', substr(md5(x), {start}, 8)) AS BIGINT)``. Two
    independent 32-bit lanes per value come from start=1 and start=9."""
    return F.conv(F.substring(F.md5(col), start, 8), 16, 10).cast("long")
