"""Range join: match point values into [lo, hi) intervals.

Spark plans a raw inequality join (``p.v >= i.lo AND p.v < i.hi``) as a
BroadcastNestedLoopJoin — O(|points|·|intervals|) comparisons and a
driver-sized broadcast, a dead end at scale. This operator grids the value
domain into buckets of ``bucket_width``: every interval explodes to the
buckets it overlaps, every point maps to exactly one bucket, and the match
becomes an EQUI-join on the bucket id followed by the exact containment
filter. A (point, interval) pair can only meet in the point's single
bucket, so no dedup is needed.

Cost model: shuffle ∝ |points| + Σ ceil(len/width) over intervals; pick
``bucket_width`` near the typical interval length so most intervals explode
to ~2 buckets. Degenerate long intervals explode to many rows — split such
"catch-all" intervals out and broadcast-join them separately.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: float,
    how: str = "inner",
) -> DataFrame:
    """Join rows of ``points`` to every interval row with
    ``lo <= point < hi`` (half-open). ``how`` may be ``inner`` or
    ``left`` (unmatched points kept with null interval columns). Interval
    column names must not collide with point column names."""
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner or left, got {how!r}")
    w = float(bucket_width)

    i_exp = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / w).cast("long"),
                F.floor(F.col(hi_col) / w).cast("long"),
            )
        ),
    )
    p = points.withColumn("__bucket", F.floor(F.col(point_col) / w).cast("long"))
    contained = (F.col(point_col) >= F.col(lo_col)) & (
        F.col(point_col) < F.col(hi_col)
    )
    if how == "inner":
        return p.join(i_exp, "__bucket").filter(contained).drop("__bucket")
    # left: equi-join on bucket carries the exact predicate into the join
    # condition so unmatched points survive with nulls
    cond = (p["__bucket"] == i_exp["__bucket"]) & contained
    return (
        p.join(i_exp, cond, "left")
        .drop(i_exp["__bucket"])
        .drop(p["__bucket"])
    )
