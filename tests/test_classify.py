"""Naive Bayes classifier: training semantics, scoring, edge cases."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from csvtool_spark.operators import classify
from csvtool_spark.functions.fixedpoint import half_away as _half_away


def _labeled(spark):
    rows = [
        (1, "the cat sat on the mat", "en"),
        (2, "the dog ate the food", "en"),
        (3, "le chat est sur le tapis", "fr"),
        (4, "le chien mange le repas", "fr"),
        (5, "the cat and the dog", "en"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_nb_train_model_shape(spark):
    m = classify.nb_train(_labeled(spark), vocab_size=100)
    assert m.classes == ["en", "fr"]
    toks = {r.token for r in m.tokens.collect()}
    assert "the" in toks and "le" in toks
    assert set(m.priors) == {"en", "fr"} and set(m.defaults) == {"en", "fr"}
    # priors: 3 en docs of 5, 2 fr docs of 5, fixed-point 1e6
    assert m.priors["en"] == _half_away(math.log(3 / 5) * classify.LOGP_SCALE)
    assert m.priors["fr"] == _half_away(math.log(2 / 5) * classify.LOGP_SCALE)


def test_nb_predicts_training_languages(spark):
    d = _labeled(spark)
    m = classify.nb_train(d, vocab_size=100)
    out = {r.doc_id: r.pred for r in classify.nb_score(d, m).collect()}
    assert out == {1: "en", 2: "en", 3: "fr", 4: "fr", 5: "en"}


def test_nb_scores_are_exact_integers(spark):
    d = _labeled(spark)
    m = classify.nb_train(d, vocab_size=100)
    row = classify.nb_score(d, m).filter(F.col("doc_id") == 1).collect()[0]
    # hand-computed: en has 14 in-vocab token occurrences, vocab size V
    v = m.tokens.count()
    t_en = 16  # tokens in en docs: 6 + 5 + 5 (docs 1,2,5 whitespace tokens)
    lp = {r.token: r.lp_0 for r in m.tokens.collect()}
    expect = m.priors["en"] + sum(
        lp[t] for t in "the cat sat on the mat".split(" ")
    )
    assert row.score_en == expect
    # every token of doc 1 is in-vocab; "the" occurs 6× in en docs
    assert lp["the"] == round(math.log((6 + 1) / (t_en + v)) * classify.LOGP_SCALE)


def test_nb_vocab_cap_and_oov_default(spark):
    d = _labeled(spark)
    m = classify.nb_train(d, vocab_size=3)  # tiny vocab forces OOV scoring
    assert m.tokens.count() == 3
    out = classify.nb_score(d, m)
    assert out.filter(F.col("pred").isNull()).count() == 0


def test_nb_null_and_empty_text(spark):
    rows = [(1, "a b", "en"), (2, None, "fr"), (3, "", "en")]
    d = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    m = classify.nb_train(d, vocab_size=10)
    out = {r.doc_id: r for r in classify.nb_score(d, m).collect()}
    # null text → prior-only argmax (en prior 2/3 beats fr 1/3)
    assert out[2].pred == "en"
    assert out[2].score_pred == m.priors["en"]
    assert len(out) == 3


def test_nb_tie_breaks_to_first_class(spark):
    # symmetric corpus: both classes identical → every score ties → 'a' wins
    rows = [(1, "x y", "a"), (2, "x y", "b")]
    d = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    m = classify.nb_train(d, vocab_size=10)
    out = classify.nb_score(d, m).collect()
    assert all(r.pred == "a" for r in out)


def test_nb_single_class_model(spark):
    # degenerate but legal: an all-one-label shard
    rows = [(1, "a b c", "en"), (2, "a d", "en")]
    d = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    m = classify.nb_train(d, vocab_size=10)
    assert m.classes == ["en"]
    for fn in (classify.nb_score, classify.nb_score_map):
        out = {r.doc_id: r for r in fn(d, m).collect()}
        assert all(r.pred == "en" for r in out.values())
        assert out[1].score_pred == out[1].score_en


def test_nb_model_is_materialized(spark):
    """Scoring must not re-run the training aggregation: the model token
    table has to be a local relation, not a lazy plan over the corpus."""
    d = _labeled(spark)
    m = classify.nb_train(d, vocab_size=100)
    plan = m.tokens._jdf.queryExecution().optimizedPlan().toString()
    # a local relation/RDD, not a lazy Aggregate over the training corpus
    assert "Aggregate" not in plan and "Sort" not in plan
    assert "LocalRelation" in plan or "LogicalRDD" in plan


def test_nb_model_save_load_roundtrip(spark, tmp_path):
    d = _labeled(spark)
    m = classify.nb_train(d, vocab_size=100)
    classify.save_model(m, str(tmp_path / "nb"))
    m2 = classify.load_model(spark, str(tmp_path / "nb"))
    assert m2.classes == m.classes
    assert m2.priors == m.priors and m2.defaults == m.defaults
    cols = ["doc_id", "pred", "score_pred"]
    a = sorted(tuple(r) for r in classify.nb_score(d, m).select(*cols).collect())
    b = sorted(tuple(r) for r in classify.nb_score(d, m2).select(*cols).collect())
    c = sorted(tuple(r) for r in classify.nb_score_map(d, m2).select(*cols).collect())
    assert a == b == c


def test_nb_model_save_back_to_own_path(spark, tmp_path):
    """Re-publishing a loaded model to its own path must not truncate the
    files the lazy reader still points at."""
    d = _labeled(spark)
    m = classify.nb_train(d, vocab_size=50)
    p = str(tmp_path / "nb")
    classify.save_model(m, p)
    m2 = classify.load_model(spark, p)
    classify.save_model(m2, p)  # crashed (and destroyed the artifact) before
    m3 = classify.load_model(spark, p)
    assert m3.priors == m.priors and m3.tokens.count() == m.tokens.count()


def test_nb_calibration_partitions_labeled_docs(spark):
    d = _labeled(spark)
    m = classify.nb_train(d, vocab_size=50)
    rows = classify.nb_calibration(d, m, n_buckets=4).collect()
    assert sum(r["n"] for r in rows) == 5  # every labeled doc in one bucket
    for r in rows:
        assert 0 <= r["bucket"] <= 3
        assert 0 <= r["n_correct"] <= r["n"]
        assert abs(r["acc"] - r["n_correct"] / r["n"]) < 1e-12


def test_nb_calibration_cap_bucket(spark):
    # width=1 puts every nonzero margin in the cap bucket
    d = _labeled(spark)
    m = classify.nb_train(d, vocab_size=50)
    rows = classify.nb_calibration(d, m, n_buckets=2, width=1).collect()
    assert {r["bucket"] for r in rows} <= {0, 1}


def test_nb_calibration_excludes_unlabeled(spark):
    d = _labeled(spark)
    extra = spark.createDataFrame(
        [(9, "the cat", None)], "doc_id long, text string, lang string"
    )
    m = classify.nb_train(d, vocab_size=50)
    rows = classify.nb_calibration(d.unionAll(extra), m, n_buckets=4).collect()
    assert sum(r["n"] for r in rows) == 5  # the null-label doc is excluded


def test_nb_calibration_validation(spark):
    import pytest

    d = _labeled(spark)
    m = classify.nb_train(d, vocab_size=50)
    one = classify.NBModel(
        classes=["en"], tokens=m.tokens, priors={"en": 0}, defaults={"en": 0}
    )
    with pytest.raises(ValueError, match=">= 2 classes"):
        classify.nb_calibration(d, one)
    with pytest.raises(ValueError, match="n_buckets"):
        classify.nb_calibration(d, m, n_buckets=0)
