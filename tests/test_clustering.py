"""Fixed-point k-means (operators/clustering.py): determinism, edge
cases, envelope validation, and plan shape.  Cross-engine exactness is
pinned by q_kmeans in the catalog gate (test_catalog_oracle) plus the
random-corpus differential here."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from csvtool_spark.operators.clustering import (
    kmeans,
    kmeans_assign,
    kmeans_fit,
    kmeans_oracle_sql,
)
from tests.conftest import SF_SMALL


def _emb(spark):
    return spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")


def test_kmeans_matches_oracle_on_random_vectors(spark):
    import random

    import duckdb

    from csvtool_spark.oracle import compare

    rng = random.Random(17)
    rows = [
        (i, [round(rng.uniform(-1, 1), 4) for _ in range(8)], i % 3)
        for i in range(120)
    ]
    pdf = pd.DataFrame(rows, columns=["vec_id", "embedding", "label"])
    d = spark.createDataFrame(pdf)
    out = kmeans(d, "embedding", "vec_id", k=5, iters=3, extra_cols=("label",))
    con = duckdb.connect()
    con.register("embeddings", pdf)
    assert compare(out, con, kmeans_oracle_sql(k=5, iters=3)) is None


def test_kmeans_deterministic_and_total(spark):
    e = _emb(spark)
    a = kmeans(e, "embedding", "vec_id", k=4, iters=1).collect()
    b = kmeans(e, "embedding", "vec_id", k=4, iters=1).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert len(a) == e.count()  # every row assigned
    assert {r["cluster"] for r in a} <= set(range(4))


def test_kmeans_iterations_reduce_inertia(spark):
    # Lloyd monotonicity: total dist2 never increases with more rounds
    e = _emb(spark)
    inertia = []
    for it in (0, 1, 2):
        out = kmeans(e, "embedding", "vec_id", k=8, iters=it)
        inertia.append(out.agg(F.sum("dist2")).collect()[0][0])
    assert inertia[1] <= inertia[0] and inertia[2] <= inertia[1]


def test_kmeans_null_vectors_pass_through(spark):
    d = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, None), (4, [1.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    out = {r["vec_id"]: r for r in kmeans(d, "embedding", "vec_id", k=2).collect()}
    assert out[3]["cluster"] is None and out[3]["dist2"] is None
    assert out[1]["cluster"] is not None


def test_kmeans_empty_cluster_carries_centroid(spark):
    # two far groups, k=3 seeded from the first 3 ids — one seed duplicates
    # a group so some cluster may go empty; fit must not crash and must
    # keep k centroids
    d = spark.createDataFrame(
        [(i, [0.0, 0.0] if i % 2 == 0 else [100.0, 100.0]) for i in range(10)],
        "vec_id long, embedding array<double>",
    )
    cents = kmeans_fit(d, "embedding", "vec_id", k=3, iters=2)
    assert len(cents) == 3 and all(len(c) == 2 for c in cents)


def test_kmeans_validation_errors(spark):
    d = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, [1.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="ragged"):
        kmeans_fit(d, "embedding", "vec_id", k=2)
    small = spark.createDataFrame(
        [(1, [1.0, 2.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="< k"):
        kmeans_fit(small, "embedding", "vec_id", k=5)
    with pytest.raises(ValueError, match="k >= 1"):
        kmeans_fit(small, "embedding", "vec_id", k=0)


def test_kmeans_rejects_nan_and_null_elements(spark):
    # Spark would quantize NaN to 0 while the DuckDB oracle errors (the
    # repo's NaN-cast rule) — must fail loudly instead (review finding)
    import pyspark.sql.functions as sf

    base = spark.createDataFrame(
        [(i, [1.0, 2.0]) for i in range(4)], "vec_id long, embedding array<double>"
    )
    nan = base.withColumn(
        "embedding",
        sf.when(sf.col("vec_id") == 0,
                sf.array(sf.lit(float("nan")), sf.lit(1.0))
        ).otherwise(sf.col("embedding")),
    )
    with pytest.raises(ValueError, match="non-finite"):
        kmeans_fit(nan, "embedding", "vec_id", k=2)
    withnull = base.withColumn(
        "embedding",
        sf.when(sf.col("vec_id") == 0,
                sf.array(sf.lit(None).cast("double"), sf.lit(1.0))
        ).otherwise(sf.col("embedding")),
    )
    with pytest.raises(ValueError, match="null ELEMENTS"):
        kmeans_fit(withnull, "embedding", "vec_id", k=2)


def test_kmeans_distance_envelope_enforced(spark):
    # dim*(2*scale*|x|)^2 past 2^63 would wrap int64 distances while the
    # oracle's HUGEINT stays exact — silent divergence (review finding)
    big = spark.createDataFrame(
        [(i, [1.0e6, 1.0e6]) for i in range(4)],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(ValueError, match="distance"):
        kmeans_fit(big, "embedding", "vec_id", k=2, scale=10_000_000)


def test_kmeans_assignment_is_map_only(spark):
    # the full-corpus pass must be a fused projection: no join, no
    # shuffle, no Python eval — centroid literals ride the closure
    e = _emb(spark)
    cents = kmeans_fit(e, "embedding", "vec_id", k=4, iters=1)
    plan = (
        kmeans_assign(e, "embedding", "vec_id", cents)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan and "Join" not in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_cluster_balanced_sample_caps_and_determinism(spark):
    from csvtool_spark.operators.clustering import cluster_balanced_sample

    e = _emb(spark)
    a = cluster_balanced_sample(e, "embedding", "vec_id", k=4, per_cluster=5)
    rows = a.collect()
    per = {}
    for r in rows:
        per.setdefault(r["cluster"], []).append(r["vec_id"])
    assert all(len(v) <= 5 for v in per.values())
    assert set(per) <= set(range(4))
    b = cluster_balanced_sample(e, "embedding", "vec_id", k=4, per_cluster=5)
    assert sorted(map(tuple, rows)) == sorted(map(tuple, b.collect()))


def test_cluster_balanced_sample_keeps_small_clusters_whole(spark):
    from csvtool_spark.operators.clustering import cluster_balanced_sample

    # 6 vectors, k=3, per_cluster=10 >> cluster sizes: nothing dropped
    d = spark.createDataFrame(
        [(i, [float(i % 3), float(i % 3)]) for i in range(6)],
        "vec_id long, embedding array<double>",
    )
    out = cluster_balanced_sample(d, "embedding", "vec_id", k=3, per_cluster=10)
    assert out.count() == 6


def test_clustered_stream_matches_batch_assignment(spark):
    from csvtool_spark.operators.clustering import kmeans_assign, kmeans_fit
    from csvtool_spark.streaming import run_to_memory
    from csvtool_spark.streaming.embeddings import clustered_stream, embedding_stream

    batch = _emb(spark)
    cents = kmeans_fit(batch, "embedding", "vec_id", k=4, iters=1)
    stream = embedding_stream(spark, SF_SMALL)
    out = clustered_stream(stream, cents)
    assert out.isStreaming
    run_to_memory(out, "clu_out", output_mode="append")
    got = {
        r.vec_id: (r.cluster, r.dist2)
        for r in spark.sql("SELECT * FROM clu_out").collect()
    }
    exp = {
        r.vec_id: (r.cluster, r.dist2)
        for r in kmeans_assign(
            batch, "embedding", "vec_id", cents, extra_cols=("label",)
        ).collect()
    }
    assert got == exp and len(got) > 0


def test_clustered_stream_keep_filter(spark):
    from csvtool_spark.operators.clustering import kmeans_fit
    from csvtool_spark.streaming import run_to_memory
    from csvtool_spark.streaming.embeddings import clustered_stream, embedding_stream

    batch = _emb(spark)
    cents = kmeans_fit(batch, "embedding", "vec_id", k=4, iters=1)
    stream = embedding_stream(spark, SF_SMALL)
    run_to_memory(clustered_stream(stream, cents, keep=(0, 1)), "clu_keep",
                  output_mode="append")
    clusters = {r.cluster for r in spark.sql("SELECT * FROM clu_keep").collect()}
    assert clusters <= {0, 1} and clusters
