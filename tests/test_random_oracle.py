"""Randomized cross-engine differential tests: the oracle SQL twins must
match the Spark operators on RANDOM corpora, not only on the fixed catalog
tables (a fixed table can mask boundary bugs — ties, empty classes, short
docs — that random shapes hit)."""

from __future__ import annotations

import random

import duckdb
import pandas as pd
import pytest

from csvtool_spark.oracle import compare


def _random_docs(seed: int, n: int = 120) -> pd.DataFrame:
    r = random.Random(seed)
    langs = ["aa", "bb", "cc"]
    words = {
        "aa": ["red", "blue", "green", "tie", "x"],
        "bb": ["eins", "zwei", "drei", "tie", "x"],
        "cc": ["un", "deux", "trois", "tie", "x"],
    }
    rows = []
    for i in range(n):
        lang = r.choice(langs)
        k = r.randint(0, 14)
        rows.append(
            {
                "doc_id": i,
                "text": " ".join(r.choice(words[lang]) for _ in range(k)),
                "lang": lang,
                "source": f"s{r.randint(0, 3)}",
                "n_chars": r.randint(1, 400),
            }
        )
    return pd.DataFrame(rows)


def _con_with(pdf: pd.DataFrame) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    con.register("documents", pdf)
    return con


@pytest.mark.parametrize("seed", range(4))
def test_nb_oracle_on_random_corpora(spark, seed):
    from csvtool_spark.operators import classify

    pdf = _random_docs(seed)
    d = spark.createDataFrame(pdf)
    vocab_size = random.Random(seed * 7 + 1).choice([4, 9, 1000])
    model = classify.nb_train(d, "text", "lang", vocab_size=vocab_size)
    out = classify.nb_score(d, model).select("doc_id", "lang", "pred", "score_pred")
    sql = classify.nb_oracle_sql(["aa", "bb", "cc"], vocab_size=vocab_size)
    assert compare(out, _con_with(pdf), sql) is None


@pytest.mark.parametrize("seed", range(3))
def test_dup_spans_oracle_on_random_corpora(spark, seed):
    from csvtool_spark.operators import dedup

    pdf = _random_docs(seed + 100)
    d = spark.createDataFrame(pdf)
    out = dedup.duplicate_span_stats(d, "text", "doc_id", k=4)
    sql = dedup.duplicate_span_oracle_sql(k=4)
    assert compare(out, _con_with(pdf), sql) is None


@pytest.mark.parametrize("seed", range(3))
def test_histogram_oracle_on_random_data(spark, seed):
    from csvtool_spark.operators.profiling import histogram, histogram_oracle_sql

    r = random.Random(seed + 500)
    lo, width, bins = r.uniform(-50, 0), r.uniform(0.5, 40), r.choice([3, 7, 16])
    hi = lo + width * bins
    pdf = pd.DataFrame(
        {"n_chars": [r.uniform(-100, 400) for _ in range(300)], "doc_id": range(300)}
    )
    d = spark.createDataFrame(pdf)
    out = histogram(d, "n_chars", lo, hi, bins)
    sql = histogram_oracle_sql("n_chars", lo, hi, bins, "documents")
    assert compare(out, _con_with(pdf), sql) is None


@pytest.mark.parametrize("seed", range(3))
def test_priority_sample_oracle_on_random_weights(spark, seed):
    from csvtool_spark.operators.sampling import (
        priority_sample,
        priority_sample_oracle_sql,
    )

    pdf = _random_docs(seed + 900)
    d = spark.createDataFrame(pdf)
    out = priority_sample(d, "n_chars", "doc_id", k=25)
    sql = priority_sample_oracle_sql("n_chars", "doc_id", 25)
    assert compare(out, _con_with(pdf), sql) is None
