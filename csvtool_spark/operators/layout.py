"""Data-layout maintenance for parquet tables at scale.

- ``compact_parquet``: the small-files fix. Streaming ingest and
  fine-grained partitioning leave thousands of KB-sized files; every scan
  then pays per-file open/footer costs and the driver pays listing. One
  sized repartition pass rewrites the table at a target file size.
- ``zorder_by``: multi-dimensional clustering. Sorting by one column gives
  parquet row-group min/max pruning on that column only; interleaving the
  bucket bits of several columns (Morton/Z-order) keeps rows that are close
  in ANY dimension close on disk, so min/max statistics prune scans for
  predicates on every participating column. This is the standard layout
  trick behind OPTIMIZE ZORDER in lakehouse engines, built here from plain
  DataFrame ops: uniform bucketing (width_bucket over the observed min/max
  — two driver-sized scalars per column), bit interleave as a column
  expression, then range-partition + sort by the z-value.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _content_bytes(spark: SparkSession, path: str) -> int:
    """On-disk byte size via the Hadoop FileSystem API — works for every
    scheme Spark can read (file://, hdfs://, s3a://...), unlike os.walk,
    which silently reports 0 for remote URIs."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return int(fs.getContentSummary(hpath).getLength())


def compact_parquet(
    spark: SparkSession,
    src: str,
    dst: str,
    target_file_mb: int = 128,
    codec: str = "zstd",
) -> dict:
    """Rewrite ``src`` parquet into ``dst`` with ≈``target_file_mb`` files.
    File count comes from the ON-DISK size (compressed, via the Hadoop FS
    so remote URIs size correctly), so the estimate tracks the actual
    write. Uses ``repartition`` (one shuffle) for even output sizes —
    ``coalesce`` would be shuffle-free but inherits the input's size skew,
    the thing being fixed."""
    df = spark.read.parquet(src)
    in_bytes = _content_bytes(spark, src)
    if in_bytes <= 0:
        raise ValueError(f"cannot size {src!r} (0 bytes reported) — refusing to "
                         "compact into a single file")
    n_files = max(1, math.ceil(in_bytes / (target_file_mb * 1024 * 1024)))
    (
        df.repartition(n_files)
        .write.mode("overwrite")
        .option("compression", codec)
        .parquet(dst)
    )
    out_files = [
        f for _, _, fs in os.walk(dst) for f in fs if f.endswith(".parquet")
    ]
    return {"in_bytes": in_bytes, "n_files": n_files, "out_files": len(out_files)}


def z_value(cols: list, mins: list[float], maxs: list[float], bits: int = 8):
    """Morton code as a pure column expression: each column is bucketed
    uniformly into 2^bits cells over its observed [min, max], then the
    bucket bits are interleaved (column i owns bit positions i, i+n,
    i+2n, ...). bits×n_cols ≤ 60 keeps the z-value in a long."""
    n = len(cols)
    if bits * n > 60:
        raise ValueError(f"bits*cols = {bits * n} > 60 — lower bits")
    z = F.lit(0).cast("long")
    for i, c in enumerate(cols):
        lo, hi = float(mins[i]), float(maxs[i])
        width = (hi - lo) or 1.0
        raw = F.floor(
            (c.cast("double") - F.lit(lo)) / F.lit(width) * (1 << bits)
        ).cast("long")
        # NULLs cluster in bucket 0 (least/greatest SKIP nulls, which would
        # otherwise silently send null rows to the max bucket)
        bucket = F.least(
            F.lit((1 << bits) - 1), F.coalesce(raw, F.lit(0).cast("long"))
        )
        bucket = F.greatest(F.lit(0).cast("long"), bucket)
        for b in range(bits):
            bit = F.call_function("shiftrightunsigned", bucket, F.lit(b)).bitwiseAND(
                F.lit(1)
            )
            z = z.bitwiseOR(
                F.call_function("shiftleft", bit, F.lit(b * n + i))
            )
    return z


def zorder_by(
    df: DataFrame,
    cols: list[str],
    n_partitions: int | None = None,
    bits: int = 8,
) -> DataFrame:
    """Return ``df`` re-clustered in Z-order on ``cols`` — write the result
    to parquet and scans filtering on any of the columns prune row groups
    via min/max statistics. One stats aggregate (2 scalars per column to
    the driver), one range-partition shuffle, per-partition sort."""
    stats = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"__lo{i}") for i, c in enumerate(cols)],
        *[F.max(F.col(c).cast("double")).alias(f"__hi{i}") for i, c in enumerate(cols)],
    ).first()
    mins = [stats[f"__lo{i}"] for i in range(len(cols))]
    maxs = [stats[f"__hi{i}"] for i in range(len(cols))]
    for c, lo, hi in zip(cols, mins, maxs):
        if lo is None or hi is None:
            raise ValueError(
                f"zorder_by: column {c!r} has no numeric min/max "
                "(empty input, all-null, or non-numeric) — cannot bucket"
            )
    z = z_value([F.col(c) for c in cols], mins, maxs, bits)
    out = df.withColumn("__z", z)
    n = n_partitions or out.rdd.getNumPartitions()
    return (
        out.repartitionByRange(n, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )
