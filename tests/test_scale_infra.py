"""Scale-infrastructure behaviors: bucketed joins skip the shuffle, salted
joins preserve join semantics, AQE configs are live."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from csvtool_spark.sources.bucketing import read_bucketed, salted_join, write_bucketed


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    c = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    write_bucketed(
        o, "b_orders", "o_custkey", 8, path=str(tmp_path / "b_orders")
    )
    write_bucketed(
        c.withColumnRenamed("c_custkey", "o_custkey"),
        "b_customer", "o_custkey", 8, path=str(tmp_path / "b_customer"),
    )
    a = read_bucketed(spark, "b_orders")
    b = read_bucketed(spark, "b_customer")
    joined = a.join(b.hint("merge"), "o_custkey")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    # co-located buckets: no Exchange feeding the join
    assert "Exchange hashpartitioning" not in plan
    assert joined.count() == a.count()


def test_salted_join_matches_plain_join(spark):
    o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet").select(
        F.col("o_custkey").alias("k"), "o_orderkey"
    )
    c = spark.read.parquet("/root/testdata/sf0.001/customer.parquet").select(
        F.col("c_custkey").alias("k"), "c_name"
    )
    plain = o.join(c, "k").select("o_orderkey", "c_name")
    salted = salted_join(o, c, "k", n_salts=8).select("o_orderkey", "c_name")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_aqe_enabled(spark):
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"
