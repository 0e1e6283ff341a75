"""The invariant oracles for the xx64-family catalog entries must be
REAL gates: a tampered result has to fail them (the test_type_parity
precedent — a checker that can't reject anything proves nothing).

Positive coverage (untampered results pass) lives in the catalog gate
(test_catalog_oracle runs every entry's invariant at sf0.001).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from csvtool_spark import queries as catalog
from csvtool_spark.scale_queries import (
    _inv_curate_full,
    _inv_minhash_xx64,
    _inv_simhash_xx64,
)
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def minhash_pairs(spark):
    return catalog.SHADOW_QUERIES["q_dedup_minhash"](spark, SF_SMALL).cache()


def test_minhash_invariant_rejects_value_drift(spark, duck, minhash_pairs):
    assert minhash_pairs.count() > 0  # non-vacuous
    drifted = minhash_pairs.withColumn("jaccard", F.col("jaccard") - F.lit(0.05))
    err = _inv_minhash_xx64(drifted, duck)
    assert err is not None and "jaccard mismatch" in err


def test_minhash_invariant_rejects_misordered_and_unknown_ids(spark, duck, minhash_pairs):
    swapped = minhash_pairs.select(
        F.col("id_b").alias("id_a"), F.col("id_a").alias("id_b"), "jaccard"
    )
    assert "misordered" in (_inv_minhash_xx64(swapped, duck) or "")
    ghost = minhash_pairs.withColumn("id_b", F.col("id_b") + F.lit(10_000_000))
    assert "unknown ids" in (_inv_minhash_xx64(ghost, duck) or "")


def test_minhash_invariant_rejects_below_threshold_pair(spark, duck, minhash_pairs):
    # a genuine non-near-dup pair with a fabricated passing jaccard: the
    # checker recomputes the truth and must catch it
    fake = spark.createDataFrame(
        [(0, 1, 0.9)], "id_a long, id_b long, jaccard double"
    )
    err = _inv_minhash_xx64(minhash_pairs.unionByName(fake), duck)
    assert err is not None


@pytest.fixture(scope="module")
def simhash_pairs(spark):
    return catalog.SHADOW_QUERIES["q_dedup_simhash"](spark, SF_SMALL).cache()


def test_simhash_invariant_rejects_missing_exact_dups(spark):
    # the testdata corpus has no EXACT text duplicates (its dups are near
    # dups), so exercise the completeness leg on a synthetic documents
    # table: docs 1 and 2 share identical text — the pair (1,2,hamming=0)
    # is mandatory under every hash family
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        "(1, 'hello world'), (2, 'hello world'), (3, 'other text')) "
        "t(doc_id, text)"
    )
    ok = spark.createDataFrame([(1, 2, 0)], "id_a long, id_b long, hamming int")
    assert _inv_simhash_xx64(ok, con) is None
    absent = spark.createDataFrame([(1, 3, 4)], "id_a long, id_b long, hamming int")
    err = _inv_simhash_xx64(absent, con)
    assert err is not None and "exact-duplicate" in err
    nonzero = spark.createDataFrame([(1, 2, 3)], "id_a long, id_b long, hamming int")
    err = _inv_simhash_xx64(nonzero, con)
    assert err is not None and "exact-duplicate" in err


def test_simhash_invariant_rejects_out_of_range_hamming(spark, duck, simhash_pairs):
    wild = simhash_pairs.withColumn("hamming", F.col("hamming") + F.lit(7))
    err = _inv_simhash_xx64(wild, duck)
    assert err is not None and "out of [0,6]" in err


@pytest.fixture(scope="module")
def curated_full(spark):
    return catalog.SHADOW_QUERIES["q_pipeline_curate_full"](spark, SF_SMALL).cache()


def test_curate_invariant_rejects_foreign_row(spark, duck, curated_full):
    fake = spark.createDataFrame(
        [(99_999_999, 0.9, "en", 10)],
        "doc_id long, quality double, lang_guess string, n_tokens int",
    ).withColumn("n_tokens", F.col("n_tokens").cast(
        dict(curated_full.dtypes)["n_tokens"]))
    err = _inv_curate_full(curated_full.unionByName(fake), duck)
    assert err is not None and "outside the SQL-curate set" in err


def test_curate_invariant_rejects_unjustified_drop(spark, duck, curated_full):
    # remove one kept doc that has NO ≥0.5 near-dup partner — the checker
    # must flag the fabricated drop as unjustified. Dropping a doc that
    # genuinely has a near-dup partner would legitimately pass, so pick a
    # victim the justification query itself can't excuse: try candidates
    # until one trips (the corpus is mostly unique docs, so the first
    # few candidates include an unjustifiable one).
    ids = [r["doc_id"] for r in curated_full.orderBy("doc_id").limit(5).collect()]
    tripped = False
    for victim in ids:
        err = _inv_curate_full(
            curated_full.filter(F.col("doc_id") != victim), duck
        )
        if err is not None and "justification" not in err:
            raise AssertionError(f"unexpected failure mode: {err}")
        if err is not None:
            tripped = True
            break
    assert tripped, "no candidate drop was flagged — checker is vacuous"
