"""Connected components + dedup_clusters: cross-checked against a local
union-find on deterministic random graphs, plus shape/convergence cases."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from csvtool_spark.operators import components, dedup


def _uf_components(n_nodes, edges):
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min-label per component
    out = {}
    for v in range(n_nodes):
        r = find(v)
        out.setdefault(r, []).append(v)
    return {v: min(vs) for r, vs in out.items() for v in vs}


def _cc(spark, edges):
    df = spark.createDataFrame(edges or [(0, 0)], "src long, dst long")
    if not edges:
        df = df.filter(F.lit(False))
    got = components.connected_components(df).collect()
    return {r["node"]: r["component"] for r in got}


def test_cc_two_triangles_and_bridge(spark):
    edges = [(1, 2), (2, 3), (3, 1), (10, 11), (11, 12), (5, 10)]
    got = _cc(spark, edges)
    assert got == {1: 1, 2: 1, 3: 1, 5: 5, 10: 5, 11: 5, 12: 5}


def test_cc_long_chain_converges_in_log_rounds(spark):
    # a 200-node path: min-label propagation would need ~200 rounds; the
    # alternating-star loop must finish inside its 20-round budget.
    edges = [(i, i + 1) for i in range(200)]
    got = _cc(spark, edges)
    assert set(got.values()) == {0}
    assert len(got) == 201


def test_cc_empty_edges(spark):
    assert _cc(spark, []) == {}


def test_cc_self_loops_and_duplicate_edges(spark):
    edges = [(7, 7), (1, 2), (2, 1), (1, 2), (3, 3)]
    got = _cc(spark, edges)
    # self-loops contribute no connectivity; 7 and 3 become isolated (absent)
    assert got == {1: 1, 2: 1}


@pytest.mark.parametrize("seed,n,m", [(11, 60, 40), (12, 80, 120), (13, 50, 10)])
def test_cc_matches_union_find(spark, seed, n, m):
    rng = random.Random(seed)
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
    edges = [(a, b) for a, b in edges if a != b]
    want = _uf_components(n, edges)
    # drop isolated nodes from the expectation — cc() only sees edge endpoints
    touched = {v for e in edges for v in e}
    want = {v: c for v, c in want.items() if v in touched}
    assert _cc(spark, edges) == want


def test_dedup_clusters_survivors(spark):
    docs = spark.createDataFrame([(i,) for i in range(8)], "doc_id long")
    pairs = spark.createDataFrame(
        [(0, 3), (3, 5), (1, 2)], "id_a long, id_b long"
    )
    got = {
        r["doc_id"]: (r["component"], r["cluster_size"], r["is_survivor"])
        for r in components.dedup_clusters(docs, pairs, "doc_id").collect()
    }
    assert got == {
        0: (0, 3, True),
        3: (0, 3, False),
        5: (0, 3, False),
        1: (1, 2, True),
        2: (1, 2, False),
        4: (4, 1, True),
        6: (6, 1, True),
        7: (7, 1, True),
    }


def test_dedup_clusters_end_to_end_ngram(spark):
    # near-identical docs 1/2/3 chain into one cluster via pairwise overlap;
    # doc 9 is unrelated
    rows = [
        (1, "the quick brown fox jumps over the lazy dog today"),
        (2, "the quick brown fox jumps over the lazy cat today"),
        (3, "a quick brown fox jumps over the lazy cat today"),
        (9, "completely different text about spark query engines"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = dedup.ngram_jaccard_pairs(docs, "text", "doc_id", threshold=0.3)
    got = {
        r["doc_id"]: (r["component"], r["is_survivor"])
        for r in components.dedup_clusters(docs, pairs, "doc_id").collect()
    }
    assert got[1] == (1, True)
    assert got[2] == (1, False)
    assert got[3] == (1, False)
    assert got[9] == (9, True)


def test_cc_plan_has_no_cartesian(spark):
    edges = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    plan = components.connected_components(edges)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_canonical_select_keeps_best_scoring_member(spark):
    """Clusters keep the highest score (tie → lowest id); singletons keep
    themselves; null scores lose to any real score."""
    from csvtool_spark.operators.components import canonical_select

    docs = spark.createDataFrame(
        [(1, 5.0), (2, 9.0), (3, 9.0), (4, 1.0), (5, None), (6, 2.0)],
        "doc_id long, q double",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], "id_a long, id_b long"
    )
    out = {r.doc_id: (r.keep_id, r.is_kept)
           for r in canonical_select(docs, pairs, "doc_id", "q").collect()}
    assert out[1] == (2, False) and out[2] == (2, True) and out[3] == (2, False)
    assert out[4] == (4, True)                 # singleton keeps itself
    assert out[5] == (6, False) and out[6] == (6, True)  # null loses


def test_cluster_size_stats_histogram(spark):
    # 6 docs: {1,2,3} one cluster, {4,5} one, {6} singleton
    d = spark.createDataFrame([(i,) for i in range(1, 7)], "doc_id long")
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (4, 5)], "id_a long, id_b long"
    )
    rows = {
        r["cluster_size"]: (r["n_clusters"], r["n_docs"])
        for r in components.cluster_size_stats(d, pairs, "doc_id").collect()
    }
    assert rows == {3: (1, 3), 2: (1, 2), 1: (1, 1)}
    # invariant: n_docs == cluster_size * n_clusters for every size
    for size, (nc, nd) in rows.items():
        assert nd == size * nc


def test_cluster_size_stats_all_singletons(spark):
    d = spark.createDataFrame([(i,) for i in range(10)], "doc_id long")
    empty = spark.createDataFrame([], "id_a long, id_b long")
    rows = components.cluster_size_stats(d, empty, "doc_id").collect()
    assert len(rows) == 1
    assert (rows[0]["cluster_size"], rows[0]["n_clusters"], rows[0]["n_docs"]) == (1, 10, 10)


def test_cluster_safe_split_never_straddles(spark):
    # two multi-doc clusters + singletons: every component must map to
    # exactly ONE split label, and the label must equal the md5 coin of
    # the component id (recomputed independently here).
    import hashlib

    docs = spark.createDataFrame([(i,) for i in range(12)], "doc_id long")
    pairs = spark.createDataFrame(
        [(1, 5), (5, 9), (2, 7)], "id_a long, id_b long"
    )
    out = components.cluster_safe_split(
        docs, pairs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}
    ).collect()
    assert len(out) == 12
    by_comp = {}
    for r in out:
        by_comp.setdefault(r["component"], set()).add(r["split"])
    assert all(len(s) == 1 for s in by_comp.values())
    # cluster {1,5,9} -> component 1; {2,7} -> component 2
    comp_of = {r["doc_id"]: r["component"] for r in out}
    assert comp_of[9] == 1 and comp_of[7] == 2

    def coin(k: int) -> str:
        b = int(hashlib.md5(str(k).encode()).hexdigest()[:8], 16) % 10_000
        return "train" if b < 8000 else ("val" if b < 9000 else "test")

    for r in out:
        assert r["split"] == coin(r["component"]), r


def test_cluster_safe_split_fraction_sanity(spark):
    # singletons only: split counts over 400 clusters should land near
    # the 80/10/10 target (md5 buckets are uniform; wide tolerance).
    docs = spark.createDataFrame([(i,) for i in range(400)], "doc_id long")
    pairs = spark.createDataFrame([], "id_a long, id_b long")
    got = components.cluster_safe_split(
        docs, pairs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}
    )
    counts = {r["split"]: r["n"] for r in got.groupBy("split").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    assert 270 <= counts["train"] <= 370
    assert 15 <= counts.get("val", 0) <= 85
    assert 15 <= counts.get("test", 0) <= 85


def test_non_integral_ids_rejected(spark):
    """Round-8 ADVICE: string ids used to cast to NULL and silently drop
    every row; the component lanes now reject them loudly."""
    import pytest

    from csvtool_spark.operators.components import (
        canonical_select,
        connected_components,
        dedup_clusters,
    )

    pairs = spark.createDataFrame([("a", "b")], "id_a string, id_b string")
    docs = spark.createDataFrame([("a", 1.0), ("b", 2.0)], "doc_id string, q double")
    with pytest.raises(TypeError, match="integral"):
        connected_components(pairs, src="id_a", dst="id_b")
    with pytest.raises(TypeError, match="integral"):
        dedup_clusters(docs, pairs, "doc_id")
    with pytest.raises(TypeError, match="integral"):
        canonical_select(docs, pairs, "doc_id", "q")
