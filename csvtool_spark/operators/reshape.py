"""Reshape operators: pivot (long→wide) and unpivot (wide→long).

Scale notes:
- ``pivot_wide`` REQUIRES an explicit pivot-value list. Spark's
  values-discovery overload runs a full distinct scan of the pivot column
  before planning — at 100 TB that is an extra pass over the corpus for
  information the caller usually knows. With explicit values the pivot is a
  single hash aggregate (one shuffle on the group keys, map-side partial
  aggregation intact).
- ``unpivot_long`` is Spark's native ``DataFrame.unpivot`` (Expand): a
  row-local operator — no shuffle, width×rows output streams through
  whole-stage codegen. Null cells are KEPT (melt semantics), so
  unpivot(pivot(x)) preserves empty groups explicitly.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame


def pivot_wide(
    df: DataFrame,
    group_cols: Sequence[str],
    pivot_col: str,
    values: Sequence,
    aggs: Sequence[Column],
) -> DataFrame:
    """groupBy(group_cols).pivot(pivot_col, values).agg(*aggs) with explicit
    values (see module doc). Output columns follow Spark's naming:
    ``{value}_{agg_alias}`` when several aggs, ``{value}`` for one."""
    return df.groupBy(*group_cols).pivot(pivot_col, list(values)).agg(*aggs)


def unpivot_long(
    df: DataFrame,
    ids: Sequence[str],
    value_cols: Sequence[str],
    var_name: str = "key",
    value_name: str = "value",
) -> DataFrame:
    """wide→long melt; value_cols must share a least-common type."""
    return df.unpivot(list(ids), list(value_cols), var_name, value_name)


def rollup_agg(df: DataFrame, group_cols: Sequence[str], aggs: Sequence[Column]) -> DataFrame:
    """Hierarchical subtotals (a,b)→(a)→() in ONE aggregation pass — the
    Expand operator emits one row per grouping level per input row, then a
    single hash aggregate; never one scan per level."""
    return df.rollup(*group_cols).agg(*aggs)


def cube_agg(df: DataFrame, group_cols: Sequence[str], aggs: Sequence[Column]) -> DataFrame:
    """All 2^n grouping-set subtotals in one pass (same Expand mechanics;
    output and shuffle scale ×2^n — prefer rollup for hierarchies)."""
    return df.cube(*group_cols).agg(*aggs)
