"""One-pass table profiling: per-column null counts, cardinality, min/max.

The standard "summarize" surface an analytics engine owes its users (the
reference has nothing like it — beyond-reference extension). One aggregate
job produces every metric; the per-column layout comes from a ``stack``
over the single result row, so the table is scanned exactly once.

Cardinality: the default is ``approx_count_distinct`` (HyperLogLog++,
mergeable, one pass, no extra shuffle) — the only sane choice at 100 TB.
``exact_distinct=True`` switches to exact ``count_distinct``, which makes
Catalyst plan an Expand (input multiplied by the number of distinct
aggregates) — fine for oracle comparisons and small tables, ruinous at
scale; the docstring is the warning label.

Min/max are emitted as strings so one uniform schema covers every column
type; the cast happens AFTER the typed aggregate, so numeric/date ordering
is the type's, not the string's.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    exact_distinct: bool = False,
) -> DataFrame:
    """(col_name, n_rows, n_nulls, n_distinct, min_str, max_str) per column."""
    cols = columns or df.columns
    aggs = [F.count(F.lit(1)).alias("__rows")]
    for c in cols:
        q = F.col(c)
        nd = F.count_distinct(q) if exact_distinct else F.approx_count_distinct(q)
        aggs += [
            F.count(q).alias(f"__nn_{c}"),
            nd.cast("long").alias(f"__nd_{c}"),
            F.min(q).cast("string").alias(f"__mn_{c}"),
            F.max(q).cast("string").alias(f"__mx_{c}"),
        ]
    row = df.agg(*aggs)
    stack = ", ".join(
        f"'{c}', `__nn_{c}`, `__nd_{c}`, `__mn_{c}`, `__mx_{c}`" for c in cols
    )
    return row.select(
        F.expr(
            f"stack({len(cols)}, {stack}) AS (col_name, n_nonnull, n_distinct, min_str, max_str)"
        ),
        F.col("__rows").alias("n_rows"),
    ).select(
        "col_name",
        "n_rows",
        (F.col("n_rows") - F.col("n_nonnull")).alias("n_nulls"),
        "n_distinct",
        "min_str",
        "max_str",
    )


def histogram(df: DataFrame, col: str, lo: float, hi: float, bins: int) -> DataFrame:
    """Equi-width histogram over ``[lo, hi)``: one hash aggregation on the
    bucket id (map-side combine — shuffle rows = ``bins``, not corpus
    rows). Values below ``lo`` clamp into bucket 0, at/above ``hi`` into
    bucket ``bins - 1`` (standard edge-clamp semantics); nulls and NaNs
    are dropped (NaN would otherwise cast into bucket 0 on Spark and
    error in DuckDB; ±Infinity clamps like any out-of-range value).
    Bucket arithmetic is plain double math shared with the oracle, and
    empty buckets are materialized as zero rows so the output shape is
    fixed (``bins`` rows) regardless of the data."""
    x = F.col(col).cast("double")
    width = (hi - lo) / bins
    # clamp in DOUBLE *before* the BIGINT cast: ±Infinity (and doubles
    # beyond int64, which ANSI Spark and DuckDB both refuse to cast) land
    # in the edge buckets instead of erroring — same shape as the oracle.
    pos = (x - F.lit(float(lo))) / F.lit(float(width))
    b = F.floor(
        F.least(F.greatest(pos, F.lit(0.0)), F.lit(float(bins - 1)))
    ).cast("long")
    counts = (
        df.filter(x.isNotNull() & ~F.isnan(x))
        .groupBy(b.alias("bucket"))
        .agg(F.count("*").alias("n"))
    )
    spark = df.sparkSession
    grid = spark.range(bins).select(F.col("id").alias("bucket"))
    return (
        grid.join(counts, "bucket", "left")
        .select(
            "bucket",
            (F.lit(float(lo)) + F.col("bucket") * F.lit(float(width))).alias("lo"),
            F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n"),
        )
    )


def histogram_oracle_sql(
    col: str, lo: float, hi: float, bins: int, table: str
) -> str:
    """DuckDB twin: same clamp + double bucket arithmetic + zero-filled
    grid. Float literals are CAST to DOUBLE explicitly — DuckDB parses a
    bare decimal literal as DECIMAL, and decimal arithmetic on the bucket
    edges diverges from Spark's double math in the last digits (caught by
    the randomized differential; the round-number catalog entry never
    tripped it)."""
    width = (hi - lo) / bins
    lo_d = f"CAST({lo!r} AS DOUBLE)"
    w_d = f"CAST({width!r} AS DOUBLE)"
    return f"""
    WITH c AS (
      SELECT CAST(floor(least(greatest((CAST({col} AS DOUBLE) - {lo_d}) / {w_d},
                              CAST(0 AS DOUBLE)),
                        CAST({float(bins - 1)!r} AS DOUBLE))) AS BIGINT) AS bucket,
             count(*) AS n
      FROM {table} WHERE {col} IS NOT NULL AND NOT isnan(CAST({col} AS DOUBLE))
      GROUP BY 1
    )
    SELECT g.bucket, {lo_d} + g.bucket * {w_d} AS lo,
           CAST(coalesce(c.n, 0) AS BIGINT) AS n
    FROM (SELECT unnest(range(0, {bins})) AS bucket) g LEFT JOIN c USING (bucket)
    """
