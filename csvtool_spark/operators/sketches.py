"""Distributed sketches for cheap cardinality/quantile answers at scale.

- ``kmv_distinct``: K-Minimum-Values distinct-count estimator (Bar-Yossef et
  al. 2002): hash every value to uniform (0,1), keep the k smallest distinct
  hashes, estimate ``(k-1)/u_k`` from the kth smallest. The hash is md5-based
  and the estimator is pure arithmetic, so — unlike HLL register layouts —
  the estimate is bit-identical across engines and sits behind a full DuckDB
  oracle in the harness.
- ``approx_distinct`` / ``approx_quantiles``: thin wrappers over Spark's
  native HLL++ and Greenwald-Khanna sketches — the production choice when
  cross-engine reproducibility doesn't matter (single aggregation pass,
  mergeable partial sketches, no distinct shuffle at all).

Scale shape of kmv_distinct: one projection to 32-bit hashes, a distinct on
the HASH ONLY (shuffle of longs, never the values), then sort+limit k which
Spark executes as TakeOrdered — per-partition partial top-k, k rows to one
reducer. The final single-row aggregate is driver-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: 2^32 as a double — normalizes the 8-hex-digit md5 prefix into (0,1).
_SCALE = float(1 << 32)


def _unit_hash(col) -> F.Column:
    """Deterministic cross-engine uniform hash in (0,1): first 8 md5 hex
    digits as an integer over 2^32 (DuckDB twin:
    ``CAST(concat('0x', substr(md5(x),1,8)) AS BIGINT) / 4294967296.0``)."""
    from csvtool_spark.functions.hashing import md5_prefix_long

    h = md5_prefix_long(col.cast("string"))
    return (h.cast("double") + F.lit(1.0)) / F.lit(_SCALE)


def kmv_distinct(df: DataFrame, col: str, k: int = 256) -> DataFrame:
    """One-row KMV estimate: (k_used, u_k, est_distinct).

    When the column has fewer than k distinct hashes the sketch is exact
    (est = count seen); otherwise est = (k-1)/u_k.
    """
    # NULL is not a value: md5(NULL)→NULL would sort FIRST in Spark but
    # LAST in the DuckDB twin, and a count must not include it anyway
    mins = (
        df.filter(F.col(col).isNotNull())
        .select(_unit_hash(F.col(col)).alias("__u"))
        .distinct()
        .orderBy("__u")
        .limit(k)
    )
    return mins.agg(
        F.count(F.lit(1)).alias("k_used"),
        F.round(F.max("__u"), 6).alias("u_k"),
        F.round(
            F.when(
                F.count(F.lit(1)) < k, F.count(F.lit(1)).cast("double")
            ).otherwise((F.lit(float(k - 1))) / F.max("__u")),
            6,
        ).alias("est_distinct"),
    )


def kmv_oracle_sql(table: str, col: str, k: int = 256) -> str:
    """The DuckDB twin of ``kmv_distinct`` — same hash, same estimator."""
    return f"""
    WITH mins AS (
      SELECT DISTINCT (CAST(concat('0x', substr(md5(CAST({col} AS VARCHAR)), 1, 8)) AS BIGINT)
                       + 1.0) / 4294967296.0 AS u
      FROM {table} WHERE {col} IS NOT NULL ORDER BY u LIMIT {k}
    )
    SELECT CAST(count(*) AS BIGINT) AS k_used,
           round(max(u), 6) AS u_k,
           round(CASE WHEN count(*) < {k} THEN CAST(count(*) AS DOUBLE)
                      ELSE {float(k - 1)} / max(u) END, 6) AS est_distinct
    FROM mins
    """


def approx_distinct(df: DataFrame, col: str, rsd: float = 0.05) -> DataFrame:
    """Spark-native HLL++ — single-pass, mergeable, no distinct shuffle."""
    return df.agg(F.approx_count_distinct(col, rsd).alias("approx_distinct"))


def approx_quantiles(
    df: DataFrame, col: str, probs: list[float], rel_err: float = 0.01
) -> list[float]:
    """Greenwald-Khanna approximate quantiles (Spark-native)."""
    return df.approxQuantile(col, probs, rel_err)
