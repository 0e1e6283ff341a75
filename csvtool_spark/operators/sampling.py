"""Dataset splitting and sampling for training pipelines.

- ``hash_split``: leakage-safe deterministic split. The fate of a row is a
  pure function of its KEY (first 8 md5 hex digits mod 10000), so the same
  document lands in the same split on every run, on any engine, at any
  scale — and duplicate keys always travel together (no train/test
  leakage through near-identical rows sharing an id). This is the split
  every reproducible pipeline wants; ``randomSplit`` gives neither
  property (it reflows with partitioning).
- ``stratified_sample``: per-stratum Bernoulli via ``sampleBy`` — seeded
  and reproducible for a fixed partitioning, one scan, no shuffle. For
  cross-engine-exact sampling use ``hash_split`` fractions per stratum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: hash buckets for split assignment — fractions resolve to 1/10000ths.
_BUCKETS = 10_000


def split_bucket(col) -> F.Column:
    """Deterministic bucket in [0, 10000): first 8 md5 hex digits of the
    key, mod 10000. DuckDB twin:
    ``CAST(concat('0x', substr(md5(CAST(k AS VARCHAR)),1,8)) AS BIGINT) % 10000``."""
    from csvtool_spark.functions.hashing import md5_prefix_long

    return md5_prefix_long(col.cast("string")) % _BUCKETS


def hash_split(
    df: DataFrame, key: str, fractions: dict[str, float]
) -> DataFrame:
    """Assign every row a split label from key-hash buckets. ``fractions``
    maps label → fraction (must sum to ≤ 1; rows past the last boundary get
    null — use an explicit remainder label to avoid that). Adds a
    ``split`` column; filter on it for the actual subsets."""
    total = sum(fractions.values())
    if total > 1.0 + 1e-9:
        raise ValueError(f"fractions sum to {total} > 1")
    b = split_bucket(F.col(key))
    expr = F.lit(None).cast("string")
    # boundaries from the CUMULATIVE fraction — per-label rounding could
    # leave a bucket sliver unlabeled even when fractions sum to 1
    # (e.g. 1/3+1/3+1/3 → 3×3333 ends at 9999)
    cum = 0.0
    hi = 0
    for label, frac in fractions.items():
        cum += frac
        lo, hi = hi, int(round(cum * _BUCKETS))
        expr = F.when((b >= lo) & (b < hi), F.lit(label)).otherwise(expr)
    return df.withColumn("split", expr)


def stratified_sample(
    df: DataFrame, strata_col: str, fractions: dict, seed: int = 42
) -> DataFrame:
    """Per-stratum Bernoulli sample (Spark-native ``sampleBy``): one scan,
    no shuffle, seeded. Strata absent from ``fractions`` are dropped —
    pass an explicit fraction (possibly 1.0) for every stratum to keep."""
    return df.sampleBy(strata_col, fractions, seed)


def source_quota(
    df: DataFrame, group_col: str, order_col: str, cap: int
) -> DataFrame:
    """Cap rows per group — the source-balancing / data-mixing step of a
    training pipeline (e.g. at most N documents per domain so one crawl
    host can't dominate the mixture). Keeps the first ``cap`` rows per
    group by deterministic ``order_col`` order.

    Scale shape: one shuffle on the group key + an in-partition sort
    (rank-and-filter window). A pathological hot group makes one task
    sort that group; when cap << group size, pre-thin hot groups with a
    cheap hash predicate (e.g. ``split_bucket(order) < p`` at a p that
    keeps ≥ cap survivors) before the exact rank — same result, bounded
    task input."""
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(order_col)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= int(cap))
        .drop("__rn")
    )
