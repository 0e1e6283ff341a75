"""Grouped order statistics: exact discrete quantiles and mode.

Beyond-reference extension (the reference's aggregate set stops at
sum/avg/min/max/count/stdev — SURVEY.md §2.4); these are the next
aggregates an analytics engine owes its users, and a training-data
pipeline uses them for per-source length/quality cut-offs.

Semantics (pinned, engine-independent):

- ``group_quantiles``: percentile_disc — the q-quantile of a group with
  ``n`` non-null, non-NaN values is the value at 1-based ascending rank
  ``ceil(q·n)``. No interpolation, so the result is always an actual
  data value and the cross-engine comparison is exact (interpolated
  quantiles would compare summed doubles). ``q·n`` is evaluated in
  IEEE double on BOTH engines, so the rank is identical even where
  ``0.95·20 = 19.000000000000004`` rounds the textbook rank up.
- ``group_mode``: most frequent value per group; ties break to the
  smallest value (deterministic, order-invariant).

Scale shape: quantiles are one shuffle (hash-partition by group) + one
per-partition sort — the canonical exact-rank plan; both window
functions share the single Exchange (plan-tested). At 100 TB with huge
groups, swap in ``approx_percentile`` (t-digest, mergeable, no sort) —
this operator is the exact lane. Mode is a two-level hash aggregation:
``(group, value)`` counts then a max_by fold — no sort anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _require_numeric(df: DataFrame, value_col: str, op: str) -> None:
    """Misuse on a non-numeric column must fail loudly at plan-build
    time: the NaN guard's ``cast('double')`` would otherwise null out
    uncastable values and silently drop their rows in Spark while the
    DuckDB oracle's CAST errors on the same input (round-4 ADVICE)."""
    dt = df.schema[value_col].dataType
    if not isinstance(dt, T.NumericType):
        raise ValueError(
            f"{op}: value_col {value_col!r} must be numeric, got {dt.simpleString()}"
        )


def group_quantiles(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    qs: tuple[float, ...] = (0.25, 0.5, 0.9),
) -> DataFrame:
    """(group..., q, value) — percentile_disc per group for each q.

    Nulls and NaNs are excluded (a NaN sorts last in Spark but errors
    DuckDB casts — the repo's standard NaN-bucketing rule). Groups
    smaller than any rank still emit every q (rank ceil(q·n) ≤ n)."""
    if not qs or any(not (0.0 < q <= 1.0) for q in qs):
        raise ValueError(f"qs must be in (0, 1], got {qs!r}")
    _require_numeric(df, value_col, "group_quantiles")
    v = F.col(value_col)
    base = df.filter(v.isNotNull() & ~F.isnan(v.cast("double")))
    wp = Window.partitionBy(*group_cols)
    ranked = base.select(
        *group_cols,
        v.alias("value"),
        F.row_number().over(wp.orderBy(F.col(value_col))).alias("__rn"),
        F.count(F.lit(1)).over(wp).alias("__n"),
    )
    q_arr = F.array(*[F.lit(float(q)) for q in qs])
    return (
        ranked.select(*group_cols, "value", "__rn", "__n",
                      F.explode(q_arr).alias("q"))
        .filter(F.col("__rn") == F.ceil(F.col("q") * F.col("__n")))
        .select(*group_cols, "q", "value")
    )


def quantiles_oracle_sql(
    value_col: str,
    group_cols: list[str],
    qs: tuple[float, ...],
    table: str,
) -> str:
    """DuckDB twin — the SAME rank formula spelled out (not DuckDB's
    native quantile_disc, whose tie/rank rules are its own): identical
    NaN/null filter, row_number rank, double q·n, ceil."""
    g = ", ".join(group_cols)
    q_list = ", ".join(f"CAST({float(q)!r} AS DOUBLE)" for q in qs)
    return f"""
    WITH b AS (
      SELECT {g}, {value_col} AS value FROM {table}
      WHERE {value_col} IS NOT NULL AND NOT isnan(CAST({value_col} AS DOUBLE))
    ),
    r AS (
      SELECT {g}, value,
             row_number() OVER (PARTITION BY {g} ORDER BY value) AS rn,
             count(*) OVER (PARTITION BY {g}) AS n
      FROM b
    )
    SELECT {g}, qv.q, value
    FROM r, (SELECT unnest([{q_list}]) AS q) qv
    WHERE rn = CAST(ceil(qv.q * n) AS BIGINT)
    """


def group_mode(
    df: DataFrame, value_col: str, group_cols: list[str]
) -> DataFrame:
    """(group..., mode_value, mode_count) — most frequent non-null value
    per group, ties to the smallest value. Two hash aggregations, no
    sort: the (group, value) count layer combines map-side, then a
    struct-max fold picks (count DESC, value ASC) deterministically."""
    v = F.col(value_col)
    counts = (
        df.filter(v.isNotNull())
        .groupBy(*group_cols, v.alias("value"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # max of (n, -value) ≡ highest count then smallest value — but value
    # may be non-numeric, so order with a struct of (n, negated rank) via
    # min over a struct sorted the right way: max_by with a deterministic
    # tie needs the tie key INSIDE the comparison, so build an orderable
    # struct: (n DESC, value ASC) == max of struct(n, MINUS value) only
    # for numerics; the general form is min of struct(-n, value).
    return (
        counts.groupBy(*group_cols)
        .agg(F.min(F.struct((-F.col("n")).alias("neg_n"), F.col("value"))).alias("__m"))
        .select(
            *group_cols,
            F.col("__m.value").alias("mode_value"),
            (-F.col("__m.neg_n")).cast("long").alias("mode_count"),
        )
    )


def mode_oracle_sql(value_col: str, group_cols: list[str], table: str) -> str:
    """DuckDB twin — same (count DESC, value ASC) selection, written as
    an arg_min over the (-n, value) struct ordering via window rank."""
    g = ", ".join(group_cols)
    return f"""
    WITH c AS (
      SELECT {g}, {value_col} AS value, count(*) AS n
      FROM {table} WHERE {value_col} IS NOT NULL
      GROUP BY {g}, {value_col}
    ),
    r AS (
      SELECT {g}, value, n,
             row_number() OVER (PARTITION BY {g} ORDER BY n DESC, value ASC) AS rn
      FROM c
    )
    SELECT {g}, value AS mode_value, CAST(n AS BIGINT) AS mode_count
    FROM r WHERE rn = 1
    """


def winsorize(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    p_lo: float = 0.05,
    p_hi: float = 0.95,
    out_col: str | None = None,
) -> DataFrame:
    """Clamp ``value_col`` into its per-group ``[p_lo, p_hi]``
    percentile_disc bounds — the standard outlier-taming transform before
    length/quality statistics feed a sampler or a mixture weight.

    Returns the input columns plus ``out_col`` (default
    ``<value_col>_wins``). Semantics (pinned): null stays null, NaN stays
    NaN (NaN would otherwise clamp to the upper bound on BOTH engines —
    greatest(NaN, lo)=NaN then least(NaN, hi)=hi — so it is preserved
    explicitly); a group with no clampable values (all null/NaN) passes
    its rows through unchanged.

    Scale shape: bounds come from ``group_quantiles`` (one shared-
    Exchange rank pass), pivot to one (group, lo, hi) row per group —
    a |groups|-sized table AQE broadcast-joins back onto the scan."""
    out_col = out_col or f"{value_col}_wins"
    if not (0.0 < p_lo < p_hi <= 1.0):
        raise ValueError(f"need 0 < p_lo < p_hi <= 1, got {(p_lo, p_hi)!r}")
    _require_numeric(df, value_col, "winsorize")
    q = group_quantiles(df, value_col, group_cols, (p_lo, p_hi))
    bounds = q.groupBy(*group_cols).agg(
        F.min(F.when(F.col("q") == float(p_lo), F.col("value"))).alias("__lo"),
        F.min(F.when(F.col("q") == float(p_hi), F.col("value"))).alias("__hi"),
    )
    v = F.col(value_col)
    clamped = F.when(v.isNull() | F.isnan(v.cast("double")), v).otherwise(
        F.when(
            F.col("__lo").isNull(), v
        ).otherwise(F.least(F.greatest(v, F.col("__lo")), F.col("__hi")))
    )
    return (
        df.join(bounds, group_cols, "left")
        .withColumn(out_col, clamped)
        .drop("__lo", "__hi")
    )


def winsorize_oracle_sql(
    value_col: str,
    group_cols: list[str],
    p_lo: float,
    p_hi: float,
    table: str,
    select_cols: list[str],
    out_col: str | None = None,
) -> str:
    """DuckDB twin — the same rank-rule bounds and clamp semantics.
    ``select_cols``: the output projection (must match the Spark side's
    column set for the hash compare)."""
    out_col = out_col or f"{value_col}_wins"
    g = ", ".join(group_cols)
    q_list = f"CAST({float(p_lo)!r} AS DOUBLE), CAST({float(p_hi)!r} AS DOUBLE)"
    sel = ", ".join(f"t.{c}" for c in select_cols)
    return f"""
    WITH b AS (
      SELECT {g}, {value_col} AS value FROM {table}
      WHERE {value_col} IS NOT NULL AND NOT isnan(CAST({value_col} AS DOUBLE))
    ),
    r AS (
      SELECT {g}, value,
             row_number() OVER (PARTITION BY {g} ORDER BY value) AS rn,
             count(*) OVER (PARTITION BY {g}) AS n
      FROM b
    ),
    qv AS (
      SELECT {g}, q, value
      FROM r, (SELECT unnest([{q_list}]) AS q) qq
      WHERE rn = CAST(ceil(qq.q * n) AS BIGINT)
    ),
    bounds AS (
      SELECT {g},
             min(CASE WHEN q = CAST({float(p_lo)!r} AS DOUBLE) THEN value END) AS lo,
             min(CASE WHEN q = CAST({float(p_hi)!r} AS DOUBLE) THEN value END) AS hi
      FROM qv GROUP BY {g}
    )
    SELECT {sel},
           CASE WHEN t.{value_col} IS NULL
                  OR isnan(CAST(t.{value_col} AS DOUBLE)) THEN t.{value_col}
                WHEN bd.lo IS NULL THEN t.{value_col}
                ELSE least(greatest(t.{value_col}, bd.lo), bd.hi)
           END AS {out_col}
    FROM {table} t LEFT JOIN bounds bd USING ({g})
    """
