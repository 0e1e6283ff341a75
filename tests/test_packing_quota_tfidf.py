"""Sequence packing, per-source quota, tf-idf top terms."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from csvtool_spark.operators.packing import pack_sequences
from csvtool_spark.operators.sampling import source_quota
from csvtool_spark.operators.textstats import tfidf_top_terms


def _pack_ref(docs, budget):
    """Reference concat-and-chunk: docs = [(id, n)], sorted by id."""
    out, pos = [], 0
    for did, n in sorted(docs):
        start, end = pos, pos + n
        pos = end
        if n == 0:
            out.append((did, start // budget, start % budget, 0))
            continue
        s = start
        while s < end:
            seq = s // budget
            span_end = min(end, (seq + 1) * budget)
            out.append((did, seq, s - seq * budget, span_end - s))
            s = span_end
    return sorted(out)


def _pack_spark(spark, docs, budget):
    df = spark.createDataFrame(docs, "doc_id long, n long")
    got = pack_sequences(df, "doc_id", "n", budget).collect()
    return sorted((r["doc_id"], r["seq_id"], r["seq_offset"], r["n_tok"]) for r in got)


def test_pack_basic_chunking(spark):
    docs = [(1, 3), (2, 4), (3, 2)]
    # stream: 1:[0,3) 2:[3,7) 3:[7,9); budget 4 → seqs 0..2
    assert _pack_spark(spark, docs, 4) == [
        (1, 0, 0, 3),
        (2, 0, 3, 1),
        (2, 1, 0, 3),
        (3, 1, 3, 1),
        (3, 2, 0, 1),
    ]


def test_pack_doc_longer_than_budget(spark):
    assert _pack_spark(spark, [(1, 10)], 4) == [
        (1, 0, 0, 4),
        (1, 1, 0, 4),
        (1, 2, 0, 2),
    ]


def test_pack_zero_token_doc(spark):
    assert _pack_spark(spark, [(1, 4), (2, 0), (3, 1)], 4) == [
        (1, 0, 0, 4),
        (2, 1, 0, 0),
        (3, 1, 0, 1),
    ]


@pytest.mark.parametrize("seed", [5, 6])
def test_pack_matches_reference_random(spark, seed):
    rng = random.Random(seed)
    docs = [(i, rng.randrange(0, 300)) for i in range(200)]
    assert _pack_spark(spark, docs, 128) == _pack_ref(docs, 128)


def test_pack_token_conservation(spark):
    rng = random.Random(7)
    docs = [(i, rng.randrange(0, 50)) for i in range(100)]
    df = spark.createDataFrame(docs, "doc_id long, n long")
    out = pack_sequences(df, "doc_id", "n", 64)
    per_doc = {
        r["doc_id"]: r["s"]
        for r in out.groupBy("doc_id").agg(F.sum("n_tok").alias("s")).collect()
    }
    assert per_doc == dict(docs)
    # every full sequence holds exactly `budget` tokens
    per_seq = [
        r["s"]
        for r in out.groupBy("seq_id").agg(F.sum("n_tok").alias("s")).collect()
    ]
    assert all(s <= 64 for s in per_seq)
    assert sum(s == 64 for s in per_seq) >= len(per_seq) - 1


def test_pack_rejects_bad_budget(spark):
    df = spark.createDataFrame([(1, 2)], "doc_id long, n long")
    with pytest.raises(ValueError):
        pack_sequences(df, "doc_id", "n", 0)


def test_source_quota_caps_groups(spark):
    rows = [(s, i) for s in ("a", "b") for i in range(10)] + [("c", 0)]
    df = spark.createDataFrame(rows, "src string, id long")
    got = source_quota(df, "src", "id", 3).collect()
    by_src = {}
    for r in got:
        by_src.setdefault(r["src"], []).append(r["id"])
    assert {k: sorted(v) for k, v in by_src.items()} == {
        "a": [0, 1, 2],
        "b": [0, 1, 2],
        "c": [0],
    }


def test_tfidf_ranks_rare_terms_first(spark):
    rows = [
        (1, "common common rare1"),
        (2, "common rare2 rare2"),
        (3, "common filler"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = tfidf_top_terms(df, "text", "doc_id", k=1)
    top = {r["doc_id"]: (r["term"], r["tf"], r["df"]) for r in got.collect()}
    # 'common' appears in every doc (df=3) → unique terms win despite tf
    assert top[1] == ("rare1", 1, 1)
    assert top[2] == ("rare2", 2, 1)
    assert top[3] == ("filler", 1, 1)


def test_tfidf_deterministic_ties(spark):
    df = spark.createDataFrame([(1, "b a")], "doc_id long, text string")
    got = [r["term"] for r in tfidf_top_terms(df, "text", "doc_id", k=2).collect()]
    assert got == ["a", "b"]  # equal scores → term asc
