"""Bucketing & skew utilities — the 100 TB join toolbox.

- ``write_bucketed`` / ``read_bucketed``: persist a table bucketed by its
  join key so repeated joins/aggregations on that key skip the shuffle
  entirely (SortMergeJoin with no Exchange on the bucketed side).
- ``salted_join``: explicit skew mitigation for hot keys — salt the skewed
  side S ways, replicate the build side per salt, join, drop the salt.
  (AQE's skewJoin handles moderate skew automatically; salting is for the
  pathological single-hot-key case, e.g. the null/default key.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 32,
    path: str | None = None,
) -> None:
    """Persist ``df`` bucketed (and sorted) by ``key``. Subsequent joins on
    ``key`` between tables bucketed with the same bucket count are
    shuffle-free and sort-free."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, key).sortBy(key)
    if path:
        w = w.option("path", path)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join where ``big`` has pathological skew on ``key``: spread each hot
    key across ``n_salts`` partitions by salting the big side randomly and
    exploding the small side to all salts. Output columns = big ⋈ small
    minus the internal salt columns."""
    big_s = big.withColumn("__salt", (F.rand(seed=42) * n_salts).cast("int"))
    small_s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = big_s.join(small_s, [key, "__salt"], how)
    return out.drop("__salt")
