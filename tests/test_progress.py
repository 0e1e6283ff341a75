"""Cancellation mapping (SURVEY §3: stop flag → cancelJobGroup)."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from csvtool_spark.progress import CancellableRun, run_with_timeout


def test_cancellable_run_completes(spark):
    run = CancellableRun(spark)
    n = run(lambda: spark.range(1000).count())
    assert n == 1000


def test_run_with_timeout_returns_fast_result(spark):
    df = spark.range(100).select(F.sum("id").alias("s"))
    rows = run_with_timeout(spark, df, seconds=60)
    assert rows[0].s == 4950


def test_run_with_timeout_cancels_slow_query(spark):
    # a deliberately slow job: wide cartesian aggregation
    big = spark.range(0, 1_000_000_000, 1, 8)
    slow = big.crossJoin(spark.range(1000)).agg(F.count(F.lit(1)).alias("n"))
    t0 = time.perf_counter()
    with pytest.raises(TimeoutError):
        run_with_timeout(spark, slow, seconds=3)
    assert time.perf_counter() - t0 < 30


def test_progress_reporter_observes_stage_progress(spark):
    from csvtool_spark.progress import ProgressReporter

    events = []
    df = (
        spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
        .groupBy("l_suppkey", "l_partkey")
        .count()
    )
    with ProgressReporter(spark, lambda s, c, t: events.append((s, c, t)), 0.02):
        df.write.mode("overwrite").format("noop").save()
    assert events, "expected at least one progress tick during the query"
    for _sid, done, total in events:
        assert 0 <= done <= total
