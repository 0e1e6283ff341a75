"""JSON extraction, unigram-LM scoring, and int8 scalar-quantized ANN."""

from __future__ import annotations

from pyspark.sql import functions as F

from csvtool_spark.operators import semistructured, similarity, textstats
from tests.conftest import SF_SMALL


def test_json_field_missing_and_corrupt_are_null(spark):
    df = spark.createDataFrame(
        [(1, '{"k": 7}'), (2, '{"other": 1}'), (3, "not json"), (4, None)],
        "id long, props string",
    )
    got = {
        r.id: r.k
        for r in df.select(
            "id", semistructured.json_field(F.col("props"), "$.k", "long").alias("k")
        ).collect()
    }
    assert got == {1: 7, 2: None, 3: None, 4: None}


def test_parse_json_col_quarantines_corrupt(spark):
    df = spark.createDataFrame(
        [(1, '{"k": 7}'), (2, "{broken"), (3, None)], "id long, props string"
    )
    out = semistructured.parse_json_col(df, "props", "k long", keep_corrupt=True)
    rows = {r.id: r for r in out.collect()}
    assert rows[1].props_parsed.k == 7 and rows[1].props_corrupt is None
    # corrupt row: raw string preserved for the dead-letter path
    assert rows[2].props_corrupt == "{broken"
    # null input is absent data, not corruption
    assert rows[3].props_corrupt is None
    # ...and it stays null in the PARSED column too (the struct rebuild
    # must not fabricate a non-null all-null struct), matching the
    # keep_corrupt=False path
    assert rows[3].props_parsed is None
    plain = semistructured.parse_json_col(df, "props", "k long")
    assert {r.id: r.props_parsed is None for r in plain.collect()}[3] is True


def test_lm_surprisal_hand_computed(spark):
    # corpus counts: the=3, rare=1, word=2
    df = spark.createDataFrame(
        [(1, "the the word"), (2, "rare word the")], "doc_id long, text string"
    )
    got = {r.doc_id: (r.n_tokens, r.surprisal_ppb) for r in
           textstats.lm_surprisal(df, "text", "doc_id").collect()}
    b = 1_000_000_000
    # doc1: (2*(b//3) + 1*(b//2)) // 3 ; doc2: (b//1 + b//2 + b//3) // 3
    assert got[1] == (3, (2 * (b // 3) + b // 2) // 3)
    assert got[2] == (3, (b + b // 2 + b // 3) // 3)
    # all-rare doc scores strictly higher than repetitive doc
    assert got[2][1] > got[1][1]


def test_sq_codes_in_int8_range_and_order_preserving(spark):
    e = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    q = similarity.quantize_embeddings(e, "embedding", "vec_id")
    stats = q.select(
        F.min(F.array_min("qvec")).alias("lo"), F.max(F.array_max("qvec")).alias("hi")
    ).first()
    assert -128 <= stats.lo <= stats.hi <= 127
    # the extremes of the value range map to the extreme codes
    assert stats.lo == -128 and stats.hi in (126, 127)


def test_ann_quantized_agrees_with_bruteforce_neighbors(spark):
    e = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    qvec = e.orderBy("vec_id").first().embedding
    exact = [
        r.vec_id
        for r in similarity.ann_bruteforce(
            e.filter(F.col("vec_id") != e.agg(F.min("vec_id")).first()[0]),
            "embedding",
            "vec_id",
            list(qvec),
            k=10,
        ).collect()
    ]
    quant = [r.vec_id for r in similarity.ann_quantized(e, "embedding", "vec_id", k=10).collect()]
    # int8 codes are lossy: demand strong overlap, not identical ranking
    assert len(set(exact[:10]) & set(quant[:10])) >= 5


def test_semantic_dedup_clusters_known_groups(spark):
    from csvtool_spark.operators import similarity

    # two tight clusters + one outlier; vectors within a cluster are
    # near-identical (cos > 0.99), across clusters near-orthogonal
    rows = [
        (0, [1.0, 0.0, 0.01]), (1, [1.0, 0.01, 0.0]), (2, [0.99, 0.0, 0.0]),
        (10, [0.0, 1.0, 0.01]), (11, [0.01, 1.0, 0.0]),
        (20, [0.5, 0.5, 0.7]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    # explicit one-per-cluster centroids: the default sampled quantizer
    # would take the 3 lowest ids (all cluster A) and split A across
    # cells — the documented cross-cell recall caveat of cell-local
    # pairing, not a bug
    cents = [(0, [1.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0]), (2, [0.5, 0.5, 0.7])]
    out = {r.vec_id: r for r in similarity.semantic_dedup(
        df, "embedding", "vec_id", threshold=0.95, centroids=cents).collect()}
    assert out[0].component == out[1].component == out[2].component == 0
    assert out[0].cluster_size == 3
    assert out[10].component == out[11].component == 10
    # exactly one survivor per cluster, the min id; outlier survives alone
    assert [i for i in out if out[i].is_survivor] == [0, 10, 20]
    assert out[20].cluster_size == 1
