"""Randomized cross-engine differential tests: the oracle SQL twins must
match the Spark operators on RANDOM corpora, not only on the fixed catalog
tables (a fixed table can mask boundary bugs — ties, empty classes, short
docs — that random shapes hit)."""

from __future__ import annotations

import random

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

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
    # pairing rule: hash-compares against the DuckDB oracle run the glibc
    # lane (bit-exact by construction; jvm≡libm is pinned separately)
    out = priority_sample(d, "n_chars", "doc_id", k=25, coin_lane="libm")
    sql = priority_sample_oracle_sql("n_chars", "doc_id", 25)
    assert compare(out, _con_with(pdf), sql) is None


@pytest.mark.parametrize("seed", range(2))
def test_pca_oracle_on_random_embeddings(spark, seed):
    from csvtool_spark.operators import pca

    r = random.Random(seed + 1300)
    dim = 6
    pdf = pd.DataFrame(
        {
            "vec_id": range(80),
            "label": [r.randint(0, 2) for _ in range(80)],
            "embedding": [
                [r.uniform(-0.6, 0.6) for _ in range(dim)] for _ in range(80)
            ],
        }
    )
    d = spark.createDataFrame(
        list(pdf.itertuples(index=False, name=None)),
        "vec_id long, label int, embedding array<float>",
    )
    out = pca.pca_project(d, "embedding", dim=dim, iters=2).select(
        "vec_id", "label", "proj"
    )
    con = duckdb.connect()
    # register float32 embeddings so both engines quantize identical values
    con.register("emb_raw", pdf)
    # CAST label to INTEGER: the Spark schema says int (as the catalog
    # parquet does on BOTH engines) while a registered pandas int column
    # is int64 — compare() is dtype-aware now and would flag the fixture
    con.execute(
        "CREATE VIEW embeddings AS SELECT vec_id, CAST(label AS INTEGER) AS label, "
        "CAST(embedding AS FLOAT[]) AS embedding FROM emb_raw"
    )
    sql = pca.pca_oracle_sql(dim=dim, iters=2)
    assert compare(out, con, sql) is None


@pytest.mark.parametrize("seed", range(2))
def test_source_overlap_oracle_on_random_corpora(spark, seed):
    from csvtool_spark.queries import SHADOW_ORACLES
    from csvtool_spark.operators import dedup

    r = random.Random(seed + 1700)
    base = "a b c d e f g h i j k l"
    rows = []
    for i in range(60):
        toks = base.split(" ")[: r.randint(4, 12)]
        if r.random() < 0.3:
            toks = toks + [f"u{i}"]
        rows.append(
            {"doc_id": i, "text": " ".join(toks), "lang": "en",
             "source": f"s{r.randint(0, 2)}", "n_chars": 10}
        )
    pdf = pd.DataFrame(rows)
    d = spark.createDataFrame(pdf)
    out = dedup.source_overlap_matrix(d, "text", "source", k=8)
    assert compare(out, _con_with(pdf), SHADOW_ORACLES["q_source_overlap"]) is None


@pytest.mark.parametrize("seed", range(2))
def test_split_leakage_oracle_on_random_corpora(spark, seed):
    from csvtool_spark.queries import SHADOW_ORACLES
    from csvtool_spark.operators.pipeline import split_leakage

    r = random.Random(seed + 2100)
    rows = []
    for i in range(70):
        if r.random() < 0.4:
            text = "shared doc body repeated across the split boundary here"
        else:
            text = " ".join(f"w{i}_{j}" for j in range(r.randint(3, 9)))
        rows.append({"doc_id": i, "text": text, "lang": "en",
                     "source": "s0", "n_chars": len(text)})
    pdf = pd.DataFrame(rows)
    d = spark.createDataFrame(pdf)
    out = split_leakage(
        d, "text", "doc_id", {"train": 0.8, "eval": 0.2}, "train", "eval", 0.2
    )
    assert compare(out, _con_with(pdf), SHADOW_ORACLES["q_split_leakage"]) is None


@pytest.mark.parametrize("seed", range(2))
def test_histogram_oracle_with_nonfinite_values(spark, seed):
    """±Infinity must clamp into the edge buckets on BOTH engines (the
    pre-fix oracle crashed casting floor(inf) to BIGINT — ADVICE r3);
    NaN stays dropped. Also mixes doubles far beyond int64 range, which
    the double-side clamp must absorb before the cast."""
    from csvtool_spark.operators.profiling import histogram, histogram_oracle_sql

    r = random.Random(seed + 4200)
    vals = [r.uniform(-100, 400) for _ in range(120)]
    vals += [float("inf"), float("-inf"), float("nan"), 1e300, -1e300]
    pdf = pd.DataFrame({"n_chars": vals, "doc_id": range(len(vals))})
    d = spark.createDataFrame(pdf)
    lo, hi, bins = 0.0, 260.0, 13
    out = histogram(d, "n_chars", lo, hi, bins)
    sql = histogram_oracle_sql("n_chars", lo, hi, bins, "documents")
    assert compare(out, _con_with(pdf), sql) is None
    got = {row.bucket: row.n for row in out.collect()}
    assert got[0] >= 1 and got[bins - 1] >= 1  # ±inf landed in edge buckets
    assert sum(got.values()) == len(vals) - 1  # only NaN dropped


def test_priority_sample_oracle_with_nan_weights(spark):
    """NaN weights pass ``w > 0`` on both engines and would sort first
    under DESC, silently capturing sample slots (ADVICE r3) — the isnan
    guard must exclude them on BOTH sides."""
    from csvtool_spark.operators.sampling import (
        priority_sample,
        priority_sample_oracle_sql,
    )

    pdf = _random_docs(7700)
    pdf["n_chars"] = pdf["n_chars"].astype(float)
    pdf.loc[pdf.index[:10], "n_chars"] = float("nan")
    d = spark.createDataFrame(pdf)
    out = priority_sample(d, "n_chars", "doc_id", k=25, coin_lane="libm")
    sql = priority_sample_oracle_sql("n_chars", "doc_id", 25)
    assert compare(out, _con_with(pdf), sql) is None
    nan_ids = set(pdf["doc_id"][:10])
    assert not nan_ids & {r.doc_id for r in out.collect()}


@pytest.mark.parametrize("seed", range(3))
def test_bm25_oracle_on_random_corpora(spark, seed):
    """BM25's fixed-point ranking must be hash-exact cross-engine on
    random shapes: skewed tf, absent terms, empty docs, null text."""
    from csvtool_spark.operators.retrieval import bm25_oracle_sql, bm25_scores

    r = random.Random(seed + 6100)
    pdf = _random_docs(seed + 6100, n=150)
    pdf.loc[pdf.index[:3], "text"] = None  # null docs: counted out of N
    d = spark.createDataFrame(pdf)
    terms = r.sample(["red", "eins", "deux", "tie", "x", "absent-term"], k=4)
    out = bm25_scores(d, "text", "doc_id", terms, k1=1.5, b=0.6, top_k=30)
    sql = bm25_oracle_sql(terms, k1=1.5, b=0.6, top_k=30)
    assert compare(out, _con_with(pdf), sql) is None


@pytest.mark.parametrize("seed", range(3))
@pytest.mark.parametrize("gumbel", [True, False])
def test_dsir_oracle_on_random_corpora(spark, seed, gumbel):
    """DSIR's bucket models, fixed-point log-weights and Gumbel draw must
    be hash-exact cross-engine on random corpora with nulls and empties."""
    from csvtool_spark.operators.importance import dsir_oracle_sql, dsir_sample

    pdf = _random_docs(seed + 8800, n=140)
    pdf.loc[pdf.index[:4], "text"] = None
    pdf.loc[pdf.index[4:7], "text"] = ""
    d = spark.createDataFrame(pdf)
    salt = "o'neill"  # quote in the salt: must be escaped into the oracle
    out = dsir_sample(
        d, "text", "doc_id", "lang = 'aa'", k=40, n_buckets=64, gumbel=gumbel,
        salt=salt, hash_family="md5", coin_lane="libm",
    )
    sql = dsir_oracle_sql("lang = 'aa'", k=40, n_buckets=64, gumbel=gumbel,
                          salt=salt)
    assert compare(out, _con_with(pdf), sql) is None


@pytest.mark.parametrize("seed", range(3))
def test_quantiles_oracle_on_random_data(spark, seed):
    """percentile_disc rank rule must match cross-engine on random group
    sizes (incl. size-1 groups), duplicate values, NaN and nulls."""
    from csvtool_spark.operators.stats import group_quantiles, quantiles_oracle_sql

    r = random.Random(seed + 9400)
    rows = []
    for i in range(260):
        rows.append(
            {
                "doc_id": i,
                "lang": r.choice(["aa", "bb", "cc", "solo"][: 3 + (i == 0)]),
                "n_chars": r.choice(
                    [None, float("nan")] + [float(r.randint(0, 40)) for _ in range(8)]
                ),
            }
        )
    pdf = pd.DataFrame(rows)
    d = spark.createDataFrame(pdf)
    qs = (0.1, 0.5, 0.95, 1.0)
    out = group_quantiles(d, "n_chars", ["lang"], qs)
    sql = quantiles_oracle_sql("n_chars", ["lang"], qs, "documents")
    assert compare(out, _con_with(pdf), sql) is None


@pytest.mark.parametrize("seed", range(3))
def test_mode_oracle_on_random_data(spark, seed):
    from csvtool_spark.operators.stats import group_mode, mode_oracle_sql

    pdf = _random_docs(seed + 9900, n=200)
    d = spark.createDataFrame(pdf)
    out = group_mode(d, "lang", ["source"])
    sql = mode_oracle_sql("lang", ["source"], "documents")
    assert compare(out, _con_with(pdf), sql) is None


@pytest.mark.parametrize("seed", range(4))
def test_funnel_oracle_on_random_event_logs(spark, seed):
    """The single-shuffle greedy fold and the k-pass min-chain oracle are
    INDEPENDENT implementations of the strict-progression semantics —
    they must agree on random logs with heavy timestamp ties (the case
    the strict rule exists for)."""
    from csvtool_spark.operators.funnel import funnel, funnel_oracle_sql

    r = random.Random(seed + 12000)
    types = ["a", "b", "c", "noise"]
    rows = []
    for i in range(400):
        rows.append(
            {
                "user_id": r.randint(0, 25),
                "event_type": r.choice(types),
                # coarse integer seconds → many exact ties; ~5% NULL ts
                # (a NULL-ts step-1 event must not count on either engine)
                "ts": (None if r.random() < 0.05 else
                       pd.Timestamp(2024, 1, 1) + pd.Timedelta(seconds=r.randint(0, 30))),
                "event_id": i,
            }
        )
    pdf = pd.DataFrame(rows)
    d = spark.createDataFrame(pdf)
    out = funnel(d, "user_id", "ts", "event_type", ["a", "b", "c"])
    sql = funnel_oracle_sql("user_id", "ts", "event_type", ["a", "b", "c"])
    con = duckdb.connect()
    con.register("events", pdf)
    assert compare(out, con, sql) is None


@pytest.mark.parametrize("seed", range(4))
def test_pii_oracle_on_injected_pii(spark, seed):
    """Java (Spark) and RE2 (DuckDB) must agree byte-for-byte on the
    conservative pattern subset — verified on text with real matches,
    boundary cases (digit runs inside words, dotted numbers), nulls and
    empties; the catalog corpus has no PII so this is the load-bearing
    check."""
    from csvtool_spark.operators.redact import pii_scrub_oracle_sql, redact_documents

    r = random.Random(seed + 13000)
    snippets = [
        "contact me at john.doe+spam@ex-ample.co.uk thanks",
        "server 10.0.255.3 and 999.999.999.999 pinged",  # permissive ipv4
        "call +4915112345678 or 212-555-0199 now",
        "card 4111111111111111 expires soon",
        "order 123456789012 is only 12 digits",            # below digit-run floor
        "v1.2.3.4beta is a version not an ip",             # \\b boundary case
        "x12345678901234567y has no word boundary",
        "plain text with no pii at all",
        "", None,
    ]
    rows = []
    for i in range(160):
        parts = [r.choice(snippets) for _ in range(r.randint(1, 3))]
        if any(p is None for p in parts):
            rows.append({"doc_id": i, "text": None})
        else:
            rows.append({"doc_id": i, "text": " ".join(parts)})
    pdf = pd.DataFrame(rows)
    d = spark.createDataFrame(pdf)
    out = redact_documents(d, "text", "doc_id", max_pii_fraction=0.5)
    sql = pii_scrub_oracle_sql(max_pii_fraction=0.5)
    assert compare(out, _con_with(pdf), sql) is None


@pytest.mark.parametrize("seed", range(2))
def test_dataset_report_oracle_on_random_corpora(spark, seed):
    """The datasheet's 8 metrics must be value-exact cross-engine on
    random corpora with duplicate texts and injected PII."""
    from csvtool_spark.operators.pipeline import (
        dataset_report,
        dataset_report_oracle_sql,
    )

    r = random.Random(seed + 15000)
    pdf = _random_docs(seed + 15000, n=180)
    # plant exact dups and PII
    for i in range(10):
        pdf.loc[pdf.index[i + 20], "text"] = pdf.loc[pdf.index[i], "text"]
    for i in range(8):
        pdf.loc[pdf.index[i + 50], "text"] += " mail me a@b.com now"
    d = spark.createDataFrame(pdf)
    out = dataset_report(d)
    sql = dataset_report_oracle_sql()
    assert compare(out, _con_with(pdf), sql) is None


@pytest.mark.parametrize("seed", range(3))
def test_cross_dedup_oracle_on_random_corpora(spark, seed):
    """The full cross-corpus LSH pipeline (signatures → bands → new×ref
    join → verify) must be hash-exact cross-engine on random corpora with
    planted cross-side and within-side duplicates (within-side pairs must
    appear in NEITHER engine)."""
    from csvtool_spark.operators import dedup
    from csvtool_spark.scale_queries import cross_dedup_oracle_sql

    pdf = _random_docs(seed + 17000, n=120)
    # plant duplicates on FORCED sides: (0,5) straddles the boundary (a
    # cross pair both engines must emit), (1,6) sits inside the new side
    # (a pair NEITHER engine may emit) — guaranteed per seed, not left to
    # the random source draw
    pdf.loc[pdf.index[5], "text"] = pdf.loc[pdf.index[0], "text"]
    pdf.loc[pdf.index[6], "text"] = pdf.loc[pdf.index[1], "text"]
    pdf.loc[pdf.index[0], "source"] = "s0"   # new side
    pdf.loc[pdf.index[5], "source"] = "s2"   # ref side → cross pair
    pdf.loc[pdf.index[1], "source"] = "s0"   # both new → within-side,
    pdf.loc[pdf.index[6], "source"] = "s1"   # must never pair
    d = spark.createDataFrame(pdf)
    pred = "source IN ('s0', 's1')"
    new = d.filter(F.expr(pred))
    ref = d.filter(~F.expr(pred))
    out = dedup.cross_corpus_neardup(
        new, ref, "text", "doc_id", threshold=0.4, n_hashes=32, bands=8,
        hash_family="md5",
    )
    sql = cross_dedup_oracle_sql(pred)
    assert compare(out, _con_with(pdf), sql) is None
    got = {(x.new_id, x.ref_id) for x in out.collect()}
    assert (0, 5) in got                       # forced cross pair found
    assert not any(0 in p_ and 5 not in p_ and p_ in {(1, 6), (6, 1)} for p_ in got)
    assert (1, 6) not in got and (6, 1) not in got  # within-new never pairs


@pytest.mark.parametrize("seed", range(3))
def test_winsorize_oracle_on_random_data(spark, seed):
    """Per-group clamp bounds and the null/NaN/empty-group pass-through
    must agree cross-engine on random group shapes."""
    from csvtool_spark.operators.stats import winsorize, winsorize_oracle_sql

    r = random.Random(seed + 18000)
    rows = []
    for i in range(240):
        lang = r.choice(["aa", "bb", "cc", "nanonly"])
        v = None if r.random() < 0.08 else float(r.randint(0, 60))
        rows.append({"doc_id": i, "lang": lang, "n_chars": v})
    pdf = pd.DataFrame(rows)
    # NaN must be constructed IN-ENGINE on both sides: pandas→Arrow and
    # duckdb.register both convert a float64 NaN to NULL in transit, so a
    # NaN planted in the frame never reaches either engine (review r4).
    nan_pred = "doc_id % 11 = 0 OR lang = 'nanonly'"
    d = spark.createDataFrame(pdf).withColumn(
        "n_chars",
        F.when(F.expr(nan_pred), F.lit(float("nan"))).otherwise(F.col("n_chars")),
    )
    out = winsorize(d, "n_chars", ["lang"], 0.1, 0.9).select(
        "doc_id", "lang", "n_chars", "n_chars_wins"
    )
    nan_docs = "(SELECT doc_id, lang, CASE WHEN " + nan_pred + \
        " THEN CAST('nan' AS DOUBLE) ELSE n_chars END AS n_chars FROM documents)"
    sql = winsorize_oracle_sql(
        "n_chars", ["lang"], 0.1, 0.9, nan_docs, ["doc_id", "lang", "n_chars"]
    )
    assert compare(out, _con_with(pdf), sql) is None
    # the NaN leg is live: NaN rows exist and pass through unclamped
    nan_rows = [x for x in out.collect() if x.n_chars != x.n_chars]
    assert nan_rows and all(x.n_chars_wins != x.n_chars_wins for x in nan_rows)


@pytest.mark.parametrize("seed", range(3))
def test_fuzzy_linkage_oracle_on_perturbed_names(spark, seed):
    """Char-trigram Jaccard linkage must be hash-exact cross-engine on
    typo-perturbed name tables (incl. short strings, nulls, and the
    gram-frequency prune)."""
    from csvtool_spark.operators.linkage import (
        fuzzy_pairs_oracle_sql,
        fuzzy_string_pairs,
    )

    r = random.Random(seed + 21000)
    base = ["anna schmidt", "j. k. rowling", "acme corp gmbh", "openai",
            "universitaet bonn", "al", "", None]
    a_rows, b_rows = [], []
    for i in range(120):
        s = r.choice(base)
        a_rows.append({"aid": i, "name": s})
        if s and r.random() < 0.6:  # perturbed twin on the other side
            chars = list(s)
            if chars:
                chars[r.randrange(len(chars))] = r.choice("abcdefgh ")
            b_rows.append({"bid": 1000 + i, "title": "".join(chars)})
        else:
            b_rows.append({"bid": 1000 + i, "title": r.choice(base)})
    pa, pb = pd.DataFrame(a_rows), pd.DataFrame(b_rows)
    da, db = spark.createDataFrame(pa), spark.createDataFrame(pb)
    out = fuzzy_string_pairs(da, db, "name", "title", "aid", "bid",
                             threshold=0.3, max_gram_freq=40)
    sql = fuzzy_pairs_oracle_sql("authors", "titles", "name", "title",
                                 "aid", "bid", threshold=0.3, max_gram_freq=40)
    con = duckdb.connect()
    con.register("authors", pa)
    con.register("titles", pb)
    assert compare(out, con, sql) is None


def test_dataset_report_empty_corpus_matches_oracle(spark):
    """Empty snapshot: both engines emit the 7 bare-agg metric rows and NO
    p50 row (the oracle's rank form produces none; the Spark side must not
    union a NULL-value p50 row — round-4 ADVICE)."""
    from csvtool_spark.operators.pipeline import (
        dataset_report,
        dataset_report_oracle_sql,
    )

    pdf = _random_docs(1234, n=5).iloc[0:0]  # schema, zero rows
    out = dataset_report(
        spark.createDataFrame(
            pdf, "doc_id long, text string, lang string, source string, n_chars long"
        )
    )
    assert compare(out, _con_with(pdf), dataset_report_oracle_sql()) is None
    metrics = {r["metric"] for r in out.collect()}
    assert "p50_n_chars" not in metrics and len(metrics) == 7


def test_dataset_report_all_null_lengths_matches_oracle(spark):
    """All-null length column: the p50 row is skipped on both sides (the
    oracle's WHERE filter leaves zero measurable rows)."""
    from csvtool_spark.operators.pipeline import (
        dataset_report,
        dataset_report_oracle_sql,
    )

    pdf = _random_docs(5678, n=40)
    pdf["n_chars"] = pd.array([None] * len(pdf), dtype="Int64")
    out = dataset_report(spark.createDataFrame(pdf))
    assert compare(out, _con_with(pdf), dataset_report_oracle_sql()) is None
    assert "p50_n_chars" not in {r["metric"] for r in out.collect()}
