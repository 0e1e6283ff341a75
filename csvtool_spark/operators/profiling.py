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


def profile_melted(
    df: DataFrame, columns: list[str] | None = None, exact_distinct: bool = False
) -> DataFrame:
    """``profile_table`` unpivoted to (col_name, metric, val) string rows
    — the join-ready shape ``profile_drift`` compares."""
    p = profile_table(df, columns, exact_distinct)
    return p.select(
        "col_name",
        F.expr(
            "stack(5,"
            " 'n_rows', CAST(n_rows AS STRING),"
            " 'n_nulls', CAST(n_nulls AS STRING),"
            " 'n_distinct', CAST(n_distinct AS STRING),"
            " 'min', min_str,"
            " 'max', max_str) AS (metric, val)"
        ),
    )


def profile_drift(
    old_df: DataFrame,
    new_df: DataFrame,
    columns_old: list[str] | None = None,
    columns_new: list[str] | None = None,
) -> DataFrame:
    """Data-contract drift between two table snapshots: profile both
    sides (exact cardinality — drift needs comparable numbers, not HLL
    estimates whose error differs per side) and full-outer join the
    melted metrics. Emits (col_name, metric, old_val, new_val, changed);
    a column present on only one side shows null for the other — the
    schema-change signal — and ``changed`` uses null-safe equality so it
    is never null itself.

    Scale shape: two single-pass profile aggregates (each: one
    aggregation job, see ``profile_table``) joined on a ≤ 5·|columns|-row
    result — the comparison itself is negligible at any corpus size."""
    mo = profile_melted(old_df, columns_old, exact_distinct=True).withColumnRenamed(
        "val", "old_val"
    )
    mn = profile_melted(new_df, columns_new, exact_distinct=True).withColumnRenamed(
        "val", "new_val"
    )
    j = mo.join(mn, ["col_name", "metric"], "full_outer")
    return j.select(
        "col_name",
        "metric",
        "old_val",
        "new_val",
        (~F.col("old_val").eqNullSafe(F.col("new_val"))).alias("changed"),
    )


def _profile_melted_sql(table_expr: str, cols: list[str]) -> str:
    # aggregate-first shape (no GROUP BY): a bare aggregate always yields
    # ONE row, so an EMPTY snapshot still melts to 5 rows per column with
    # n_rows='0' — exactly like Spark's df.agg + stack. (A GROUP BY
    # m.metric formulation emits ZERO rows on an empty table and silently
    # diverges — an empty new snapshot is precisely the drift case this
    # check exists for.)
    parts = []
    for c in cols:
        parts.append(f"""
      SELECT '{c}' AS col_name, m.metric,
             CASE m.metric
               WHEN 'n_rows' THEN CAST(a.nr AS VARCHAR)
               WHEN 'n_nulls' THEN CAST(a.nr - a.nn AS VARCHAR)
               WHEN 'n_distinct' THEN CAST(a.nd AS VARCHAR)
               WHEN 'min' THEN a.mn
               WHEN 'max' THEN a.mx
             END AS val
      FROM (SELECT count(*) AS nr, count({c}) AS nn,
                   count(DISTINCT {c}) AS nd,
                   CAST(min({c}) AS VARCHAR) AS mn,
                   CAST(max({c}) AS VARCHAR) AS mx
            FROM {table_expr}) a,
           (SELECT unnest(['n_rows','n_nulls','n_distinct','min','max']) AS metric) m""")
    return "\n      UNION ALL".join(parts)


def profile_drift_oracle_sql(
    old_expr: str, old_cols: list[str], new_expr: str, new_cols: list[str]
) -> str:
    """DuckDB twin of ``profile_drift``: the same five metrics per column
    per side (VARCHAR-rendered like Spark's string casts), full-outer
    joined with null-safe change detection (IS DISTINCT FROM ≡ Spark's
    negated eqNullSafe)."""
    return f"""
    WITH mo AS ({_profile_melted_sql(old_expr, old_cols)}),
    mn AS ({_profile_melted_sql(new_expr, new_cols)})
    SELECT coalesce(mo.col_name, mn.col_name) AS col_name,
           coalesce(mo.metric, mn.metric) AS metric,
           mo.val AS old_val, mn.val AS new_val,
           mo.val IS DISTINCT FROM mn.val AS changed
    FROM mo FULL OUTER JOIN mn
      ON mo.col_name = mn.col_name AND mo.metric = mn.metric
    """
