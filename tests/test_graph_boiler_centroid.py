"""Unit tests for the round-3 operators: integer PageRank, boilerplate
detection, and per-label centroid outlier mining."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from csvtool_spark.operators.graph import SCALE, pagerank_int
from csvtool_spark.operators.similarity import centroid_outliers, group_centroids
from csvtool_spark.operators.textstats import boilerplate_stats


# ---------------------------------------------------------------------------
# PageRank
# ---------------------------------------------------------------------------


def _ranks(df):
    return {r.node: r.rank for r in df.collect()}


def test_pagerank_symmetric_pair(spark):
    # a <-> b is perfectly symmetric: ranks must stay equal every iteration,
    # and with deg=1 the damped fixed-point update is exact:
    # r' = 0.15*S + 0.85*r  (converging toward S)
    edges = spark.createDataFrame([("a", "b"), ("b", "a")], ["src", "dst"])
    r = _ranks(pagerank_int(edges, "src", "dst", iters=3))
    assert r["a"] == r["b"]
    expect = SCALE
    base = (15 * SCALE) // 100
    for _ in range(3):
        expect = base + (85 * expect) // 100
    assert r["a"] == expect


def test_pagerank_sink_and_dangling(spark):
    # star a->c, b->c: c receives both full ranks; a and b get only the
    # base (no in-edges); c is dangling — its mass drops (documented).
    edges = spark.createDataFrame([("a", "c"), ("b", "c")], ["src", "dst"])
    r = _ranks(pagerank_int(edges, "src", "dst", iters=1))
    base = (15 * SCALE) // 100
    assert r["a"] == base and r["b"] == base
    assert r["c"] == base + (85 * (2 * SCALE)) // 100


def test_pagerank_partitioning_invariant(spark):
    # integer arithmetic ⇒ identical ranks regardless of partition count
    rows = [(f"n{i}", f"n{(i * 7 + 3) % 23}") for i in range(100)]
    e1 = spark.createDataFrame(rows, ["src", "dst"]).repartition(1)
    e2 = spark.createDataFrame(rows, ["src", "dst"]).repartition(17)
    assert _ranks(pagerank_int(e1, "src", "dst", iters=4)) == _ranks(
        pagerank_int(e2, "src", "dst", iters=4)
    )


def test_pagerank_multi_edge_weighting(spark):
    # a splits its mass across two out-edges; the DUPLICATED a->c edge must
    # get 2/3 of it vs 1/3 for a->d — deduplicating edges before the degree
    # count would send both ranks to base + 0.85*(SCALE//2) and fail here
    from csvtool_spark.operators.graph import SCALE as S

    edges = spark.createDataFrame(
        [("a", "c"), ("a", "c"), ("a", "d")], ["src", "dst"]
    )
    r = _ranks(pagerank_int(edges, "src", "dst", iters=1))
    base = (15 * S) // 100
    assert r["c"] == base + (85 * (2 * (S // 3))) // 100
    assert r["d"] == base + (85 * (S // 3)) // 100
    assert r["c"] > r["d"]


# ---------------------------------------------------------------------------
# boilerplate
# ---------------------------------------------------------------------------


def test_boilerplate_flags_shared_shingles(spark):
    # 'the quick brown fox' appears in 3 docs (min_docs=3) → its shingles
    # are boilerplate; doc 4 shares none of them
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps high"),
            (2, "the quick brown fox runs far"),
            (3, "the quick brown fox sits still"),
            (4, "entirely different words here now"),
        ],
        ["doc_id", "text"],
    )
    out = {
        r.doc_id: r
        for r in boilerplate_stats(docs, "text", "doc_id", k=3, min_docs=3).collect()
    }
    # each 6-token doc has 4 distinct 3-shingles; docs 1-3 share exactly
    # 'the quick brown' and 'quick brown fox'
    for i in (1, 2, 3):
        assert out[i].n_shingles == 4
        assert out[i].n_boiler == 2
        assert out[i].boiler_ratio == pytest.approx(0.5)
    assert out[4].n_boiler == 0
    assert out[4].boiler_ratio == 0.0


def test_boilerplate_short_doc_whole_text_shingle(spark):
    docs = spark.createDataFrame(
        [(1, "hi there"), (2, "hi there"), (3, "bye now")], ["doc_id", "text"]
    )
    out = {
        r.doc_id: r
        for r in boilerplate_stats(docs, "text", "doc_id", k=3, min_docs=2).collect()
    }
    assert out[1].n_shingles == 1 and out[1].n_boiler == 1
    assert out[3].n_boiler == 0


# ---------------------------------------------------------------------------
# centroids / outliers
# ---------------------------------------------------------------------------


def test_group_centroids_exact_mean(spark):
    df = spark.createDataFrame(
        [
            (1, "a", [1.0, 0.0]),
            (2, "a", [3.0, 2.0]),
            (3, "b", [10.0, 10.0]),
        ],
        ["vec_id", "label", "embedding"],
    )
    cent = {r.label: r.centroid for r in group_centroids(df, "embedding", "label").collect()}
    assert cent["a"] == [2.0, 1.0]
    assert cent["b"] == [10.0, 10.0]


def test_centroid_outliers_planted(spark):
    # cluster at ~(0,0) with one planted far point
    rows = [(i, "a", [0.0 + i * 0.001, 0.0]) for i in range(10)]
    rows.append((99, "a", [5.0, 5.0]))
    df = spark.createDataFrame(rows, ["vec_id", "label", "embedding"])
    top = centroid_outliers(df, "embedding", "vec_id", "label", k=1).collect()
    assert top[0].vec_id == 99
    assert top[0].dist > 5.0


def test_centroid_outliers_plan_is_take_ordered(spark):
    rows = [(i, i % 3, [float(i), 1.0]) for i in range(30)]
    df = spark.createDataFrame(rows, ["vec_id", "label", "embedding"])
    plan = centroid_outliers(df, "embedding", "vec_id", "label", k=5)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


# ---------------------------------------------------------------------------
# l2_normalize / deterministic_shuffle
# ---------------------------------------------------------------------------


def test_l2_normalize_unit_and_zero(spark):
    from csvtool_spark.operators.similarity import l2_normalize, norm, _vec_d

    df = spark.createDataFrame(
        [(1, [3.0, 4.0]), (2, [0.0, 0.0])], ["id", "v"]
    )
    out = {r.id: r.u for r in df.select("id", l2_normalize(F.col("v")).alias("u")).collect()}
    assert out[1] == [0.6, 0.8]
    assert out[2] == [None, None]  # zero vector → nulls, no ANSI error


def test_l2_normalize_plan_evaluates_norm_once(spark):
    # the let-binding trick: the O(d) norm fold must appear ONCE in the
    # optimized plan, not once per element
    from csvtool_spark.operators.similarity import l2_normalize

    df = spark.createDataFrame([(1, [1.0, 2.0, 3.0, 4.0])], ["id", "v"])
    plan = df.select(l2_normalize(F.col("v")).alias("u"))._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("aggregate(") <= 2  # norm fold (sqrt(dot)) let-bound


def test_deterministic_shuffle_reproducible_and_seeded(spark):
    from csvtool_spark.operators.sampling import deterministic_shuffle

    df = spark.createDataFrame([(i,) for i in range(100)], ["id"])
    o1 = [r.id for r in deterministic_shuffle(df, "id", seed=1).collect()]
    o2 = [r.id for r in deterministic_shuffle(df.repartition(13), "id", seed=1).collect()]
    o3 = [r.id for r in deterministic_shuffle(df, "id", seed=2).collect()]
    assert o1 == o2                      # partitioning-independent
    assert sorted(o1) == list(range(100))  # a permutation
    assert o1 != o3                      # new seed → new epoch order
    assert o1 != list(range(100))        # actually shuffled


def test_deterministic_shuffle_sharded(spark):
    from csvtool_spark.operators.sampling import deterministic_shuffle
    from pyspark.sql.functions import spark_partition_id

    df = spark.createDataFrame([(i,) for i in range(200)], ["id"])
    out = deterministic_shuffle(df, "id", seed=3, n_shards=4)
    rows = out.withColumn("p", spark_partition_id()).collect()
    assert len({r.p for r in rows}) == 4
    # within each shard, rows are ordered by the key; shards are key ranges
    by_p: dict = {}
    for r in rows:
        by_p.setdefault(r.p, []).append(r.shuffle_key)
    bounds = []
    for p in sorted(by_p):
        ks = by_p[p]
        assert ks == sorted(ks)
        bounds.append((min(ks), max(ks)))
    for (lo1, hi1), (lo2, hi2) in zip(bounds, bounds[1:]):
        assert hi1 <= lo2  # range partitioning: non-overlapping key ranges


# ---------------------------------------------------------------------------
# null-text contract across the shingle pipelines
# ---------------------------------------------------------------------------


def test_null_text_produces_no_pairs_or_boiler_counts(spark):
    # NULL text must behave like the SQL oracles: no shingles, no candidate
    # pairs, never an '' shingle that equi-joins with real empty docs
    from csvtool_spark.operators.dedup import (
        ngram_jaccard_pairs,
        near_dup_pairs_minhash,
    )

    docs = spark.createDataFrame(
        [
            (1, None),
            (2, None),
            (3, ""),
            (4, "the quick brown fox jumps"),
            (5, "the quick brown fox jumps"),
        ],
        ["doc_id", "text"],
    )
    ng = ngram_jaccard_pairs(docs, "text", "doc_id", threshold=0.5).collect()
    assert {(r.id_a, r.id_b) for r in ng} == {(4, 5)}  # nulls pair with nothing

    mh = near_dup_pairs_minhash(
        docs, "text", "doc_id", threshold=0.5, hash_family="md5"
    ).collect()
    assert {(r.id_a, r.id_b) for r in mh} == {(4, 5)}

    bo = {
        r.doc_id: r
        for r in boilerplate_stats(docs, "text", "doc_id", k=3, min_docs=2).collect()
    }
    # boilerplate coalesces null→'' so null and empty docs share the ''
    # shingle (counted consistently by its own coalescing oracle)
    assert bo[1].n_shingles == 1 and bo[4].n_boiler == bo[5].n_boiler


# ---------------------------------------------------------------------------
# profiling
# ---------------------------------------------------------------------------


def test_profile_table_metrics(spark):
    from csvtool_spark.operators.profiling import profile_table

    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", None), (3, "a", 2.5), (4, None, 2.5)],
        ["id", "s", "x"],
    )
    p = {r.col_name: r for r in profile_table(df, exact_distinct=True).collect()}
    assert p["id"].n_rows == 4 and p["id"].n_nulls == 0 and p["id"].n_distinct == 4
    assert p["s"].n_nulls == 1 and p["s"].n_distinct == 2
    assert p["x"].n_nulls == 1 and p["x"].n_distinct == 2
    assert p["id"].min_str == "1" and p["id"].max_str == "4"
    # typed ordering, not string ordering: min of [1.5, 2.5] is 1.5 even
    # though '10' < '9' lexicographically
    assert p["x"].min_str == "1.5" and p["x"].max_str == "2.5"


def test_profile_table_single_scan(spark):
    # approx mode: one aggregate, NO Expand operator (exact mode plans one)
    from csvtool_spark.operators.profiling import profile_table

    df = spark.createDataFrame([(1, "a")], ["id", "s"])
    approx = profile_table(df)._jdf.queryExecution().executedPlan().toString()
    exact = profile_table(df, exact_distinct=True)._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in approx
    assert "Expand" in exact  # the documented exact-mode cost


# ---------------------------------------------------------------------------
# batch ANN
# ---------------------------------------------------------------------------


def test_ann_batch_matches_single_query_bruteforce(spark):
    from csvtool_spark.operators.similarity import ann_bruteforce, ann_bruteforce_batch

    rows = [(i, [float((i * 7 + j) % 5) for j in range(8)]) for i in range(40)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    queries = {0: rows[0][1], 17: rows[17][1]}
    batch = ann_bruteforce_batch(df, "embedding", "vec_id", queries, k=3).collect()
    by_q = {}
    for r in batch:
        by_q.setdefault(r.qid, []).append((r.vec_id, r.cos))
    for qid, vec in queries.items():
        single = [(r.vec_id, r.cos) for r in ann_bruteforce(df, "embedding", "vec_id", vec, k=3).collect()]
        assert by_q[qid] == single
    assert len(by_q[0]) == 3


def test_ann_batch_plan_has_no_join(spark):
    # the score matrix is a map-only explode projection — no join operator,
    # one shuffle (the per-query window), limit pushed into the sort
    from csvtool_spark.operators.similarity import ann_bruteforce_batch

    rows = [(i, [float(i), 1.0]) for i in range(20)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    plan = ann_bruteforce_batch(df, "embedding", "vec_id", {0: [1.0, 0.0]}, k=2)._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan and "Cartesian" not in plan
    assert plan.count("Exchange") == 1
    assert "WindowGroupLimit" in plan
