"""Layout maintenance: compaction and Z-order clustering."""

from __future__ import annotations

from pyspark.sql import functions as F

from csvtool_spark.operators import layout


def test_compact_parquet_small_files(spark, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    df = spark.range(100_000).select(
        F.col("id"), (F.col("id") % 97).alias("k"), F.md5(F.col("id").cast("string")).alias("pad")
    )
    df.repartition(50).write.parquet(src)             # 50 tiny files
    import os
    n_in = sum(f.endswith(".parquet") for _, _, fs in os.walk(src) for f in fs)
    assert n_in == 50
    stats = layout.compact_parquet(spark, src, dst, target_file_mb=4)
    assert stats["out_files"] < n_in
    assert spark.read.parquet(dst).count() == 100_000


def test_zorder_clusters_every_dimension(spark):
    rows = [(x, y) for x in range(64) for y in range(64)]
    df = spark.createDataFrame(rows, "x long, y long").repartition(8)
    zdf = layout.zorder_by(df, ["x", "y"], n_partitions=8)
    spans = (
        zdf.withColumn("p", F.spark_partition_id())
        .groupBy("p")
        .agg(
            (F.max("x") - F.min("x") + 1).alias("sx"),
            (F.max("y") - F.min("y") + 1).alias("sy"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    )
    assert sum(r.n for r in spans) == 64 * 64
    # a linear sort on x would leave y-span = 64 in every partition; z-order
    # bounds BOTH spans — avg bounding-box area far below half the grid
    avg_area = sum(r.sx * r.sy for r in spans) / len(spans)
    assert avg_area < (64 * 64) / 2, [tuple(r) for r in spans]


def test_zorder_preserves_rows_and_schema(spark):
    df = spark.range(1000).select(
        F.col("id"), (F.col("id") * 3 % 17).alias("a"), (F.col("id") % 5).alias("b")
    )
    z = layout.zorder_by(df, ["a", "b"], n_partitions=4)
    assert z.columns == ["id", "a", "b"]
    assert z.count() == 1000
    assert z.select(F.sum("id")).first()[0] == 999 * 1000 // 2


def test_zorder_nulls_cluster_low_and_errors_are_named(spark):
    import pytest as _pytest

    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, 0.0)], "id long, x double"
    )
    z = layout.zorder_by(df.withColumn("y", F.col("id").cast("double")), ["x", "y"], n_partitions=1)
    assert z.count() == 3                      # nulls kept, bucket 0
    with _pytest.raises(ValueError, match="x"):
        layout.zorder_by(
            spark.createDataFrame([(1, None)], "id long, x double"), ["x"]
        )


def test_readme_documents_every_pipe_stage():
    """The README stage-reference table must cover STAGES exactly — a new
    stage ships with user docs or fails here (same lock pattern as the
    negative battery)."""
    from csvtool_spark.dialect.stages import STAGES

    readme = open("/root/repo/README.md").read()
    table = readme.split("## Pipe stage reference", 1)[1].split("## ", 1)[0]
    for name in STAGES:
        assert f"| `{name}` |" in table, f"stage '{name}' missing from README"
