"""BPE tokenizer: classic-example training, distributed apply, model
differential vs a naive reference encoder."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from csvtool_spark.operators import bpe


def test_learn_bpe_classic_example():
    # Sennrich-style toy corpus: 'lo' dominates pair counts
    hist = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges = bpe.learn_bpe(hist, n_merges=4)
    assert len(merges) == 4
    # 'es' (9) and 'est' family dominate: first merge is ('e','s') with 9,
    # then ('es','t') with 9, then ('est','</w>') 9, then ('l','o') 7
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")
    assert merges[2] == ("est", "</w>")
    assert merges[3] == ("l", "o")


def test_encode_word_merge_priority():
    merges = [("e", "s"), ("es", "t"), ("est", "</w>"), ("l", "o")]
    assert bpe.encode_word("newest", merges) == ["n", "e", "w", "est</w>"]
    assert bpe.encode_word("low", merges) == ["lo", "w", "</w>"]
    assert bpe.encode_word("slowest", merges) == ["s", "lo", "w", "est</w>"]


def test_merge_word_greedy_left():
    # overlapping pair occurrences merge greedily left-to-right
    assert bpe._merge_word(("a", "a", "a"), ("a", "a")) == ("aa", "a")
    assert bpe._merge_word(("a", "a", "a", "a"), ("a", "a")) == ("aa", "aa")


def test_bpe_train_is_deterministic(spark):
    rows = [(i, "the quick brown fox jumps over the lazy dog") for i in range(20)]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    m1 = bpe.bpe_train(d, "text", n_merges=10)
    m2 = bpe.bpe_train(d, "text", n_merges=10)
    assert m1 == m2 and len(m1) == 10


def test_bpe_encode_matches_reference(spark):
    """Model differential: the mapInPandas path must equal per-word
    encode_word applied naively, token for token."""
    rng = random.Random(11)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta"]
    rows = [
        (i, " ".join(rng.choice(words) for _ in range(rng.randint(0, 12))))
        for i in range(60)
    ] + [(60, None), (61, "")]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    merges = bpe.bpe_train(d, "text", n_merges=25)
    out = {r.doc_id: r for r in bpe.bpe_encode(d, "text", merges).collect()}
    for doc_id, text in rows:
        expect: list[str] = []
        for w in (text or "").split(" "):
            if w:
                expect.extend(bpe.encode_word(w, merges))
        assert list(out[doc_id].bpe_tokens) == expect, doc_id
        assert out[doc_id].n_bpe_tokens == len(expect)


def test_bpe_roundtrip_reconstructs_text(spark):
    """Concatenating BPE tokens and splitting on </w> reconstructs the
    original words — no characters lost by tokenization."""
    rows = [(1, "hello world"), (2, "spark tokenizer test")]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    merges = bpe.bpe_train(d, "text", n_merges=30)
    for r in bpe.bpe_encode(d, "text", merges).collect():
        joined = "".join(r.bpe_tokens).replace(bpe.EOW, " ").strip()
        orig = dict(rows)[r.doc_id]
        assert joined == orig


def test_word_histogram_cap_and_ties(spark):
    rows = [(1, "b b a a c")]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    hist = bpe.word_histogram(d, "text", max_words=2).collect()
    # counts: a=2, b=2, c=1 → cap 2 keeps a,b (tie broken by word asc)
    assert [(r.word, r.n) for r in hist] == [("a", 2), ("b", 2)]


def test_bpe_merges_save_load_roundtrip(spark, tmp_path):
    rows = [(i, "banana bandana cabana") for i in range(5)]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    merges = bpe.bpe_train(d, "text", n_merges=12)
    bpe.save_merges(spark, merges, str(tmp_path / "merges"))
    loaded = bpe.load_merges(spark, str(tmp_path / "merges"))
    assert loaded == merges
    a = bpe.bpe_encode(d, "text", merges).select("doc_id", "bpe_tokens").collect()
    b = bpe.bpe_encode(d, "text", loaded).select("doc_id", "bpe_tokens").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_bpe_encode_cache_cap_preserves_output(spark, monkeypatch):
    """With the memo cap forced tiny, every output token stream is still
    identical — the cap bounds memory, never changes results (ADVICE r3)."""
    from csvtool_spark.operators import bpe as bpe_mod

    rows = [(i, f"low lower lowest unique{i} word{i % 3}") for i in range(30)]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    merges = bpe_mod.bpe_train(d, "text", n_merges=20)
    full = bpe_mod.bpe_encode(d, "text", merges).select("doc_id", "bpe_tokens").collect()
    monkeypatch.setattr(bpe_mod, "_CACHE_CAP", 2)
    capped = bpe_mod.bpe_encode(d, "text", merges).select("doc_id", "bpe_tokens").collect()
    assert sorted(map(tuple, full)) == sorted(map(tuple, capped))
