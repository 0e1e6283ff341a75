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


def cms_build(df: DataFrame, col: str, depth: int = 4, width: int = 2048) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan 2005) as a DataFrame of
    ``(d, bucket, cnt)`` counter cells — at most depth×width rows no matter
    how many distinct keys the input has.

    That bound is the point at 100 TB: exact per-key counting shuffles one
    row per distinct key; the sketch's shuffle is capped at depth×width rows
    per map task (the groupBy partial-aggregates the counters map-side), and
    the finished sketch broadcasts anywhere. Estimates only ever
    over-count, by ≤ ~2N/width with probability 1-2^-depth.

    Hashing is the repo's cross-engine md5 prefix (row d salts the key with
    ``"d:"``), so a DuckDB oracle can rebuild the identical sketch.
    """
    from csvtool_spark.functions.hashing import md5_prefix_long

    cells = [
        F.struct(
            F.lit(d).cast("int").alias("d"),
            (
                md5_prefix_long(F.concat(F.lit(f"{d}:"), F.col(col).cast("string")))
                % width
            ).alias("bucket"),
        )
        for d in range(depth)
    ]
    return (
        df.filter(F.col(col).isNotNull())
        .select(F.explode(F.array(*cells)).alias("c"))
        .groupBy(F.col("c.d").alias("d"), F.col("c.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 2048,
) -> DataFrame:
    """Point-query the sketch for each row of ``keys``: the estimate is the
    min over the depth counters the key hashes into. The sketch side is at
    most depth×width rows → broadcast; the keys side never shuffles (the
    final groupBy re-aggregates depth rows per key)."""
    from csvtool_spark.functions.hashing import md5_prefix_long

    probes = keys.select(
        F.col(key_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).cast("int").alias("d"),
                        (
                            md5_prefix_long(
                                F.concat(F.lit(f"{d}:"), F.col(key_col).cast("string"))
                            )
                            % width
                        ).alias("bucket"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("c"),
    ).select(key_col, "c.d", "c.bucket")
    return (
        probes.join(F.broadcast(sketch), ["d", "bucket"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0).cast("long"))).alias("est_count"))
    )


def cms_oracle_sql(
    table: str, col: str, key_filter: str, depth: int = 4, width: int = 2048
) -> str:
    """DuckDB twin of ``cms_build``+``cms_estimate`` over ``table.col`` for
    the keys satisfying ``key_filter`` — byte-identical hashing, so the
    estimates (not just the true counts) must match exactly."""
    bucket = (
        f"CAST(concat('0x', substr(md5(concat(CAST(d.d AS VARCHAR), ':', "
        f"CAST({col} AS VARCHAR))), 1, 8)) AS BIGINT) % {width}"
    )
    return f"""
    WITH ds AS (SELECT unnest(generate_series(0, {depth - 1})) AS d),
    cells AS (
      SELECT d.d AS d, {bucket} AS bucket
      FROM {table}, ds d WHERE {col} IS NOT NULL
    ),
    sk AS (SELECT d, bucket, CAST(count(*) AS BIGINT) AS cnt
           FROM cells GROUP BY d, bucket),
    ks AS (SELECT DISTINCT {col} FROM {table}
           WHERE {col} IS NOT NULL AND ({key_filter})),
    probes AS (
      SELECT {col}, d.d AS d, {bucket} AS bucket FROM ks, ds d
    )
    SELECT p.{col}, CAST(min(coalesce(sk.cnt, 0)) AS BIGINT) AS est_count
    FROM probes p LEFT JOIN sk USING (d, bucket)
    GROUP BY p.{col}
    """


def approx_distinct(df: DataFrame, col: str, rsd: float = 0.05) -> DataFrame:
    """Spark-native HLL++ — single-pass, mergeable, no distinct shuffle."""
    return df.agg(F.approx_count_distinct(col, rsd).alias("approx_distinct"))


def hll_group_sketches(
    df: DataFrame, group_col: str, col: str, lg_k: int = 12
) -> DataFrame:
    """Per-group Datasketches HLL sketches: ``(group, sketch binary,
    estimate)``. The sketch column is the 100 TB pattern: materialize one
    per partition/day/source once, then answer any distinct-count rollup by
    MERGING sketches (``hll_merge``) without rescanning the data — including
    non-additive rollups like "distinct users across these 14 days" that
    per-group exact counts cannot answer."""
    sk = df.groupBy(group_col).agg(
        F.hll_sketch_agg(F.col(col).cast("string"), F.lit(lg_k)).alias("hll")
    )
    return sk.select(
        group_col, "hll", F.hll_sketch_estimate("hll").alias("est_distinct")
    )


def hll_merge(sketches: DataFrame, sketch_col: str = "hll") -> DataFrame:
    """Union previously-built HLL sketches into one overall estimate —
    input is #groups rows, never the raw data."""
    return sketches.agg(
        F.hll_sketch_estimate(F.hll_union_agg(F.col(sketch_col))).alias(
            "est_distinct"
        )
    )


def approx_quantiles(
    df: DataFrame, col: str, probs: list[float], rel_err: float = 0.01
) -> list[float]:
    """Greenwald-Khanna approximate quantiles (Spark-native)."""
    return df.approxQuantile(col, probs, rel_err)
