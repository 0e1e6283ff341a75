"""End-to-end training-data pipeline composition: curate → chunk →
token-count → pack → deterministic shuffle. Each stage is individually
oracle-backed; this suite pins the INVARIANTS of their composition — the
path a real corpus takes from raw documents to training shards."""

from __future__ import annotations

from pyspark.sql import functions as F

from csvtool_spark.operators import textstats
from csvtool_spark.operators.packing import pack_sequences
from csvtool_spark.operators.pipeline import chunk_documents, curate
from csvtool_spark.operators.sampling import deterministic_shuffle
from tests.conftest import SF_SMALL

BUDGET = 64


def test_full_pipeline_invariants(spark):
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    n_raw = docs.count()

    # 1. curate: language + quality + near-dup gate
    kept = curate(docs, "text", "doc_id", min_quality=0.3).persist()
    n_kept = kept.count()
    assert 0 < n_kept <= n_raw

    # 2. chunk into 32-token windows, 8 overlap
    chunks = chunk_documents(kept, "text", "doc_id", chunk_tokens=32, overlap=8)
    chunks = chunks.withColumn(
        "n_tok", textstats.token_count(F.col("chunk_text"))
    ).persist()
    # every kept doc produced ≥1 chunk; no chunk exceeds the window
    assert chunks.select("doc_id").distinct().count() == n_kept
    assert chunks.filter(F.col("n_chunk_tokens") > 32).count() == 0
    # chunk token accounting: first chunk starts the doc, windows overlap
    # by ≤ 8, and the concatenation covers every token of the doc
    tok_sum = chunks.groupBy("doc_id").agg(
        F.sum("n_chunk_tokens").alias("s"), F.count("*").alias("c")
    )
    doc_toks = kept.select(
        "doc_id", textstats.token_count(F.col("text")).alias("n")
    )
    j = tok_sum.join(doc_toks, "doc_id")
    # sum of chunk lengths = doc length + overlap·(chunks−1)
    assert (
        j.filter(F.col("s") != F.col("n") + 8 * (F.col("c") - 1)).count() == 0
    )

    # 3. pack chunks into fixed-budget sequences
    cid = chunks.select(
        F.concat_ws("#", F.col("doc_id").cast("string"), F.col("chunk_id").cast("string")).alias("cid"),
        F.col("n_chunk_tokens").alias("n_tok"),
    )
    packed = pack_sequences(cid, "cid", "n_tok", BUDGET).persist()
    # conservation: every chunk's tokens land somewhere, exactly once
    total_chunk_tokens = cid.agg(F.sum("n_tok")).first()[0]
    assert packed.agg(F.sum("n_tok")).first()[0] == total_chunk_tokens
    # no sequence overflows its budget
    per_seq = packed.groupBy("seq_id").agg(F.sum("n_tok").alias("t"))
    assert per_seq.filter(F.col("t") > BUDGET).count() == 0
    # all sequences except the last are exactly full (greedy packing)
    last = per_seq.agg(F.max("seq_id")).first()[0]
    assert (
        per_seq.filter((F.col("seq_id") != last) & (F.col("t") != BUDGET)).count()
        == 0
    )

    # 4. deterministic shuffle of the packed sequence ids is a permutation
    seqs = per_seq.select("seq_id")
    shuffled = deterministic_shuffle(seqs, "seq_id", seed=11)
    ids = [r.seq_id for r in shuffled.collect()]
    assert sorted(ids) == [r.seq_id for r in seqs.orderBy("seq_id").collect()]
    assert ids != sorted(ids)  # genuinely shuffled

    kept.unpersist(), chunks.unpersist(), packed.unpersist()


def test_pipeline_is_one_spark_plan_until_pack(spark):
    # curate→chunk composes into ONE declarative plan (no driver
    # materialization until pack's bounded per-partition-count collect)
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    kept = curate(docs, "text", "doc_id", min_quality=0.3, near_dup_threshold=None)
    chunks = chunk_documents(kept, "text", "doc_id", chunk_tokens=32, overlap=8)
    plan = chunks._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_readme_curation_recipe(spark):
    """The README's end-to-end curation recipe (round-8 verdict item 6):
    clean -> langid gate -> quality cut -> transitive near-dedup ->
    decontaminate -> quota -> tokens -> pack, as ONE pipe query. Every
    stage is deterministic md5 machinery, so the sf0.001 row counts are
    exact pins (the README documents the sf0.1 run of the same text)."""
    from csvtool_spark.engine import CsvEngine
    from csvtool_spark.functions.caching import release_stages

    eng = CsvEngine(spark)
    eng.register_dir(SF_SMALL, ["documents"])
    bench = (
        spark.read.parquet(f"{SF_SMALL}/documents.parquet")
        .filter("source = 'src0'")
        .select("doc_id", "text")
    )
    eng.register("bench", bench)
    out = eng.sql(
        "select doc_id, source, text from documents "
        "where source != 'src0' "
        "|> normalize(text) "
        "|> clean(text, terminal=0) "
        "|> langid(text, keep=en) "
        "|> quality(text, min=0.7) "
        "|> neardup(text, id=doc_id, threshold=0.4, transitive=1) "
        "|> decontaminate(text, id=doc_id, ref=bench, k=4) "
        "|> quota(source, cap=75, order=doc_id) "
        "|> tokens(text) "
        "|> pack(n_tokens, id=doc_id, budget=512) "
        "|> shard(n=64, key=doc_id)"
    )
    rows = out.collect()
    release_stages(out)
    assert out.columns == [
        "doc_id", "source", "text", "lang_guess", "quality",
        "n_tokens", "seq_id", "seq_offset", "n_tok", "shard",
    ]
    # normalize is pinned IDENTITY on the synthetic corpus (single-space
    # ASCII), so the downstream md5 pins are unchanged; shard appends
    assert all(0 <= r["shard"] < 64 for r in rows)
    # deterministic pins at sf0.001 (475 non-bench docs in)
    assert len(rows) == 319  # spans
    assert len({r["seq_id"] for r in rows}) == 33  # packed sequences
    assert len({r["doc_id"] for r in rows}) == 287  # curated documents
    # the gates actually held
    assert all(r["lang_guess"] == "en" for r in rows)
    assert all(r["quality"] >= 0.7 for r in rows)
    assert all(1 <= r["n_tok"] <= 512 for r in rows)
    from collections import Counter

    assert max(Counter(r["source"] for r in rows).values()) <= 75 * 2  # spans per doc <= 2 here
