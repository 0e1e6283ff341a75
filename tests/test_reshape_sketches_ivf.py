"""Behavior tests for the round-2 additions: pivot/unpivot, KMV + native
sketches, and IVF similarity search."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from csvtool_spark.operators import reshape, similarity, sketches


# --- reshape --------------------------------------------------------------


def _sales(spark):
    rows = [
        ("east", "A", 10), ("east", "A", 5), ("east", "B", 7),
        ("west", "B", 1), ("west", "C", 2),
    ]
    return spark.createDataFrame(rows, "rgn string, prod string, qty long")


def test_pivot_wide_explicit_values(spark):
    wide = reshape.pivot_wide(
        _sales(spark), ["rgn"], "prod", ["A", "B", "C"],
        [F.sum("qty").alias("q")],
    )
    # single agg → bare value column names; multi-agg → {value}_{alias}
    assert wide.columns == ["rgn", "A", "B", "C"]
    by = {r.rgn: r for r in wide.collect()}
    assert by["east"]["A"] == 15 and by["east"]["B"] == 7
    assert by["east"]["C"] is None            # empty cell stays null
    assert by["west"]["B"] == 1 and by["west"]["C"] == 2


def test_pivot_explicit_values_skip_discovery_scan(spark):
    # with explicit values the plan is a single aggregate — no extra
    # distinct-scan job to discover pivot values
    wide = reshape.pivot_wide(
        _sales(spark), ["rgn"], "prod", ["A", "B"], [F.sum("qty").alias("q")]
    )
    plan = wide._jdf.queryExecution().optimizedPlan().toString()
    assert plan.lower().count("aggregate") <= 2  # partial+final, no discovery


def test_unpivot_roundtrip_keeps_nulls(spark):
    wide = reshape.pivot_wide(
        _sales(spark), ["rgn"], "prod", ["A", "B", "C"],
        [F.sum("qty").alias("q")],
    )
    long = reshape.unpivot_long(wide, ["rgn"], ["A", "B", "C"], "prod", "qty")
    rows = {(r.rgn, r.prod): r.qty for r in long.collect()}
    assert len(rows) == 6                      # 2 regions × 3 measures
    assert rows[("east", "A")] == 15
    assert rows[("west", "A")] is None         # melt keeps empty cells


# --- sketches -------------------------------------------------------------


def test_kmv_exact_below_k(spark):
    df = spark.range(100).select(F.col("id").alias("v"))
    row = sketches.kmv_distinct(df, "v", k=256).first()
    assert row.k_used == 100 and row.est_distinct == 100.0


def test_kmv_estimate_accuracy(spark):
    # 10k distinct values, k=256 → relative error ~1/sqrt(k) ≈ 6%
    df = spark.range(10_000).select((F.col("id") * 7 + 3).alias("v"))
    row = sketches.kmv_distinct(df, "v", k=256).first()
    assert row.k_used == 256
    assert abs(row.est_distinct - 10_000) / 10_000 < 0.2


def test_kmv_duplicates_dont_inflate(spark):
    df = spark.range(50_000).select((F.col("id") % 500).alias("v"))
    row = sketches.kmv_distinct(df, "v", k=256).first()
    assert row.k_used == 256 or row.k_used == 500
    # 500 distinct regardless of 100× duplication
    assert row.est_distinct < 1_000


def test_approx_distinct_hll(spark):
    df = spark.range(5_000).select((F.col("id") % 1_000).alias("v"))
    n = sketches.approx_distinct(df, "v", rsd=0.05).first()["approx_distinct"]
    assert abs(n - 1_000) / 1_000 < 0.15


def test_approx_quantiles(spark):
    df = spark.range(1_001).select(F.col("id").cast("double").alias("v"))
    q25, q50, q75 = sketches.approx_quantiles(df, "v", [0.25, 0.5, 0.75], 0.01)
    assert abs(q50 - 500) <= 20 and q25 < q50 < q75


# --- IVF ------------------------------------------------------------------


def _emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")


def test_ann_ivf_full_probe_is_exact(spark):
    # probing every cell degrades IVF to brute force — identical top-k
    e = _emb(spark)
    qvec = [float(x) for x in e.filter(F.col("vec_id") == 0).first()["embedding"]]
    ivf = similarity.ann_ivf(e, "embedding", "vec_id", qvec, k=10, n_cells=8, nprobe=8)
    bf = similarity.ann_bruteforce(e, "embedding", "vec_id", qvec, k=10)
    assert [r.vec_id for r in ivf.collect()] == [r.vec_id for r in bf.collect()]


def test_ann_ivf_partial_probe_finds_query(spark):
    e = _emb(spark)
    qvec = [float(x) for x in e.filter(F.col("vec_id") == 0).first()["embedding"]]
    rows = similarity.ann_ivf(
        e, "embedding", "vec_id", qvec, k=10, n_cells=16, nprobe=4
    ).collect()
    # the query vector is its own nearest neighbor and its cell is always
    # the top-ranked probe cell
    assert rows[0].vec_id == 0 and rows[0].cos == 1.0
    # cosine ordering is maintained
    assert all(a.cos >= b.cos for a, b in zip(rows, rows[1:]))


def test_ivf_train_moves_centroids_to_clusters(spark):
    # two tight clusters; sampled centroids both start in cluster 1 —
    # Lloyd iterations must pull one centroid to cluster 2
    rows = [(i, [1.0 + 0.01 * i, 0.0]) for i in range(5)]
    rows += [(i + 5, [0.0, 1.0 + 0.01 * i]) for i in range(5)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = similarity.ivf_train(df, "embedding", "vec_id", n_cells=2, iters=3)
    axes = sorted(
        (0 if v[0] > v[1] else 1) for _, v in cents
    )
    assert axes == [0, 1]                      # one centroid per cluster


def test_ivf_indexed_probe_is_bucket_pruned(spark, tmp_path):
    e = _emb(spark)
    qvec = [float(x) for x in e.filter(F.col("vec_id") == 0).first()["embedding"]]
    cents = similarity.ivf_index_write(
        e, "embedding", "vec_id", "ivf_idx", n_cells=8, n_buckets=8,
        path=str(tmp_path / "ivf_idx"),
    )
    probe = similarity.ann_ivf_indexed(
        spark, "ivf_idx", "embedding", "vec_id", qvec, cents, k=10, nprobe=2
    )
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "SelectedBucketsCount" in plan
    m = re.search(r"SelectedBucketsCount: (\d+) out of (\d+)", plan)
    assert m and int(m.group(1)) < int(m.group(2))
    rows = probe.collect()
    assert rows[0].vec_id == 0 and rows[0].cos == 1.0
    # indexed and unindexed IVF agree given the same centroids and probe
    direct = similarity.ann_ivf(
        e, "embedding", "vec_id", qvec, k=10, n_cells=8, nprobe=2, centroids=cents
    ).collect()
    assert [r.vec_id for r in rows] == [r.vec_id for r in direct]


# --- as-of join -----------------------------------------------------------


def _asof_frames(spark):
    left = spark.createDataFrame(
        [(1, "k", 10), (2, "k", 25), (3, "k", 5), (4, "x", 50)],
        "id long, k string, t long",
    )
    right = spark.createDataFrame(
        [("k", 10, "a", None), ("k", 20, "b", 2.0), ("z", 1, "zz", 9.0)],
        "k string, t long, tag string, score double",
    )
    return left, right


def test_asof_backward_inclusive(spark):
    from csvtool_spark.operators.asof import asof_join

    left, right = _asof_frames(spark)
    out = {r.id: (r.tag, r.t_r) for r in asof_join(
        left, right, on="k", left_ts="t", right_ts="t"
    ).collect()}
    assert out[1] == ("a", 10)        # inclusive: t == right t matches
    assert out[2] == ("b", 20)        # latest of the two markers
    assert out[3] == (None, None)     # no marker at or before t=5
    assert out[4] == (None, None)     # key never on right side


def test_asof_forward(spark):
    from csvtool_spark.operators.asof import asof_join

    left, right = _asof_frames(spark)
    out = {r.id: r.tag for r in asof_join(
        left, right, on="k", left_ts="t", right_ts="t", direction="forward"
    ).collect()}
    assert out[3] == "a"              # earliest marker at/after t=5
    assert out[2] is None             # nothing at/after t=25


def test_asof_null_right_field_does_not_skip_match(spark):
    # marker ("a") carries a NULL score; the struct wrapper must still
    # count it as the match rather than skipping to an older marker
    from csvtool_spark.operators.asof import asof_join

    left, right = _asof_frames(spark)
    row = {r.id: r for r in asof_join(
        left, right, on="k", left_ts="t", right_ts="t"
    ).collect()}[1]
    assert row.tag == "a" and row.score is None


def test_asof_tolerance(spark):
    from pyspark.sql import functions as F
    from csvtool_spark.operators.asof import asof_join

    left, right = _asof_frames(spark)
    out = {r.id: r.tag for r in asof_join(
        left, right, on="k", left_ts="t", right_ts="t",
        tolerance=F.lit(5),
    ).collect()}
    assert out[1] == "a"              # age 0 ≤ 5
    assert out[2] == "b"              # age 5 ≤ 5
    # id=3 has no match at all; unchanged
    assert out[3] is None


def test_asof_tolerance_excludes_stale(spark):
    from pyspark.sql import functions as F
    from csvtool_spark.operators.asof import asof_join

    left, right = _asof_frames(spark)
    out = {r.id: r.tag for r in asof_join(
        left, right, on="k", left_ts="t", right_ts="t",
        tolerance=F.lit(4),
    ).collect()}
    assert out[2] is None             # age 5 > 4 → nulled out


def test_asof_single_shuffle_plan(spark):
    # the union+window form shuffles ONCE on the key — no range-join blowup
    from csvtool_spark.operators.asof import asof_join

    left, right = _asof_frames(spark)
    plan = asof_join(
        left, right, on="k", left_ts="t", right_ts="t"
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_kmv_ignores_nulls(spark):
    df = spark.createDataFrame(
        [(i,) for i in range(100)] + [(None,)] * 50, "v: long"
    )
    row = sketches.kmv_distinct(df, "v", k=256).first()
    assert row.k_used == 100 and row.est_distinct == 100.0


def test_ivf_sq_index_probe_pruned_and_exact_at_full_probe(spark, tmp_path):
    e = _emb(spark)
    qvec = [float(x) for x in e.filter(F.col("vec_id") == 0).first()["embedding"]]
    cents, bounds = similarity.ivf_sq_index_write(
        e, "embedding", "vec_id", "ivf_sq_idx", n_cells=8, n_buckets=8,
        path=str(tmp_path / "ivf_sq_idx"),
    )
    probe = similarity.ann_ivf_sq(
        spark, "ivf_sq_idx", "vec_id", qvec, cents, bounds, k=10, nprobe=2
    )
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "SelectedBucketsCount" in plan
    m = re.search(r"SelectedBucketsCount: (\d+) out of (\d+)", plan)
    assert m and int(m.group(1)) < int(m.group(2))
    rows = probe.collect()
    # the query's own row lives in a probed cell and dominates the scores
    assert rows[0].vec_id == 0

    # full probe == brute-force integer-dot ranking over the whole corpus
    full = similarity.ann_ivf_sq(
        spark, "ivf_sq_idx", "vec_id", qvec, cents, bounds, k=10, nprobe=8
    ).collect()
    codes = similarity.quantize_embeddings(e, "embedding", "vec_id")
    qrow = {r.vec_id: r.qvec for r in codes.collect()}
    scores = sorted(
        ((sum(a * b for a, b in zip(v, qrow[0])), -i) for i, v in qrow.items()),
        reverse=True,
    )[:10]
    assert [r.score_q for r in full] == [s for s, _ in scores]
    assert [r.vec_id for r in full] == [-i for _, i in scores]
