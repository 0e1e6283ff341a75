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


def test_ann_indexed_probe_is_bucket_pruned(spark, tmp_path):
    from csvtool_spark.operators import similarity

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qvec = [float(x) for x in e.filter(F.col("vec_id") == 0).first()["embedding"]]
    similarity.ann_index_write(
        e, "embedding", "vec_id", "ann_idx", path=str(tmp_path / "ann_idx")
    )
    conf_key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    before = spark.conf.get(conf_key)
    probe = similarity.ann_lsh_indexed(
        spark, "ann_idx", "embedding", "vec_id", qvec, k=10
    )
    # the probe must not leak its autoBucketedScan override into the
    # session (it would silently degrade every later bucketed scan) ...
    assert spark.conf.get(conf_key) == before
    # ... while the probe's own (already-planned) execution stays pruned
    plan = probe._jdf.queryExecution().executedPlan().toString()
    # the probe reads only the query's candidate buckets, never the corpus
    assert "SelectedBucketsCount" in plan
    import re

    m = re.search(r"SelectedBucketsCount: (\d+) out of (\d+)", plan)
    assert m and int(m.group(1)) < int(m.group(2))

    rows = probe.collect()
    assert 0 < len(rows) <= 10
    # exact re-rank: every returned cosine equals the bruteforce cosine
    bf = {
        r.vec_id: r.cos
        for r in similarity.ann_bruteforce(
            e, "embedding", "vec_id", qvec, k=e.count()
        ).collect()
    }
    for r in rows:
        assert bf[r.vec_id] == r.cos
    # the query vector itself (cos=1) must be found — it shares every
    # bucket with itself by construction
    assert rows[0].vec_id == 0 and rows[0].cos == 1.0
