"""remove_duplicate_spans: cross-doc duplicate-passage removal semantics.

The oracle parity of q_span_removal / q_span_removal_all runs in the
catalog-wide gate (test_catalog_oracle); these tests pin the hand-checkable
edge semantics: owner keeps / keep='none', coverage union of overlapping
windows, short/null/fully-covered docs, and the detect/remove agreement
invariant against duplicate_span_stats.
"""
from __future__ import annotations

import pytest

from csvtool_spark.operators import dedup


def _run(spark, rows, **kw):
    d = spark.createDataFrame(rows, "doc_id long, text string")
    return {
        r.doc_id: r
        for r in dedup.remove_duplicate_spans(d, "text", "doc_id", **kw).collect()
    }


def test_owner_keeps_its_copy(spark):
    rows = [
        (1, "a b c d x1 x2"),      # owner of spans 'a b c d' (min doc_id)
        (2, "a b c d y1 y2"),      # loses positions 0-3
        (3, "p q r s t u"),        # unique → untouched
    ]
    out = _run(spark, rows, k=4, min_docs=2)
    assert out[1].text_dedup == "a b c d x1 x2" and out[1].n_removed == 0
    assert out[2].text_dedup == "y1 y2" and out[2].n_removed == 4
    assert out[3].text_dedup == "p q r s t u" and out[3].n_removed == 0
    assert all(out[i].n_tokens == 6 for i in (1, 2, 3))


def test_keep_none_strips_everywhere(spark):
    rows = [(1, "a b c d x1 x2"), (2, "a b c d y1 y2")]
    out = _run(spark, rows, k=4, min_docs=2, keep="none")
    assert out[1].text_dedup == "x1 x2" and out[1].n_removed == 4
    assert out[2].text_dedup == "y1 y2" and out[2].n_removed == 4


def test_overlapping_windows_remove_union_not_sum(spark):
    # docs share a 5-token passage → two overlapping 4-windows in each;
    # coverage is the union (5 positions), not 2×4
    rows = [(1, "a b c d e x"), (2, "a b c d e y")]
    out = _run(spark, rows, k=4, min_docs=2)
    assert out[1].n_removed == 0                    # owner
    assert out[2].text_dedup == "y" and out[2].n_removed == 5


def test_short_null_and_fully_covered_docs(spark):
    rows = [
        (1, "a b c d"),            # exactly k tokens, owner
        (2, "a b c d"),            # fully covered → ''
        (3, "a b"),                # shorter than k → no spans
        (4, None),                 # null text stays null
    ]
    out = _run(spark, rows, k=4, min_docs=2)
    assert out[1].text_dedup == "a b c d"
    assert out[2].text_dedup == "" and out[2].n_removed == 4
    assert out[3].text_dedup == "a b" and out[3].n_removed == 0
    assert out[4].text_dedup is None
    assert out[4].n_tokens == 0 and out[4].n_removed == 0


def test_within_doc_repeat_not_removed(spark):
    # the distinct-doc criterion: a passage repeated inside ONE doc is not
    # a cross-doc duplicate (same rule as duplicate_span_stats)
    rows = [(1, "p q r s p q r s"), (2, "t u v w x y z q")]
    out = _run(spark, rows, k=4, min_docs=2)
    assert out[1].text_dedup == "p q r s p q r s" and out[1].n_removed == 0


def test_agrees_with_duplicate_span_stats(spark):
    # detect/remove share _span_hashes: a doc has n_removed > 0 under
    # keep='none' iff duplicate_span_stats reports n_dup > 0 for it
    rows = [
        (1, "m n o p q r s t"),
        (2, "m n o p q r s t zz"),
        (3, "z y x w v u t s"),
        (4, "one two three"),
        (5, None),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    stats = {
        r.doc_id: r
        for r in dedup.duplicate_span_stats(d, "text", "doc_id", k=4).collect()
    }
    out = _run(spark, rows, k=4, min_docs=2, keep="none")
    for i in stats:
        assert (out[i].n_removed > 0) == (stats[i].n_dup > 0)
        assert out[i].n_removed <= out[i].n_tokens


def test_kept_tokens_are_a_subsequence(spark):
    rows = [(1, "a b c d e f g"), (2, "c d e f g h i"), (3, "a b c d q w e")]
    out = _run(spark, rows, k=4, min_docs=2)
    for i, text in ((1, rows[0][1]), (2, rows[1][1]), (3, rows[2][1])):
        orig = text.split(" ")
        kept = out[i].text_dedup.split(" ") if out[i].text_dedup else []
        it = iter(orig)
        assert all(tok in it for tok in kept)       # subsequence check


def test_within_doc_repeat_removal(spark):
    rows = [
        (1, "p q r s p q r s"),     # exact repeat → second copy trimmed
        (2, "a b c d e f g h"),     # no repeats → untouched
        (3, "x y x y x y x y"),     # periodic: every window repeats after
                                    # the first occurrence of its hash
        (4, None),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.doc_id: r
        for r in dedup.remove_repeated_spans(d, "text", "doc_id", k=4).collect()
    }
    assert out[1].text_dedup == "p q r s" and out[1].n_removed == 4
    assert out[2].text_dedup == "a b c d e f g h" and out[2].n_removed == 0
    # doc 3: windows 'x y x y'@0,2,4 and 'y x y x'@1,3 — repeats at 2,4
    # and 3 cover positions 2..7, leaving the first period 'x y'
    assert out[3].text_dedup == "x y" and out[3].n_removed == 6
    assert out[4].text_dedup is None and out[4].n_removed == 0


def test_within_doc_removal_ignores_cross_doc_duplicates(spark):
    # identical twin docs have no WITHIN-doc repeats: both untouched
    rows = [(1, "m n o p q r"), (2, "m n o p q r")]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.doc_id: r
        for r in dedup.remove_repeated_spans(d, "text", "doc_id", k=4).collect()
    }
    assert out[1].n_removed == 0 and out[2].n_removed == 0


def test_rejects_bad_keep(spark):
    d = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    with pytest.raises(ValueError, match="keep"):
        dedup.remove_duplicate_spans(d, "text", "doc_id", keep="last")
    with pytest.raises(ValueError, match="keep"):
        dedup.span_removal_oracle_sql(keep="bogus")


def test_membership_lanes_differential(spark):
    """The array_except keep-mask (default) must reproduce the original
    per-token array_contains scan bit-for-bit on the real corpus — the
    round-7 verdict item-6 rewrite."""
    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = dedup.remove_duplicate_spans(
        d, "text", "doc_id", k=8, min_docs=2, membership="except"
    ).orderBy("doc_id").collect()
    b = dedup.remove_duplicate_spans(
        d, "text", "doc_id", k=8, min_docs=2, membership="contains"
    ).orderBy("doc_id").collect()
    assert a == b
    assert any(r.n_removed > 0 for r in a)  # the corpus exercises removal
    with pytest.raises(ValueError, match="membership"):
        dedup.remove_duplicate_spans(
            d, "text", "doc_id", membership="bogus"
        )


def _paras(spark, rows, **kw):
    d = spark.createDataFrame(rows, "doc_id long, text string")
    return {
        r.doc_id: r
        for r in dedup.paragraph_dedup(d, "text", "doc_id", **kw).collect()
    }


def test_paragraph_dedup_owner_keeps(spark):
    rows = [
        (1, "dup para\n\nunique one"),
        (2, "dup para\n\nunique two"),
        (3, "solo\n\ndoc"),
    ]
    out = _paras(spark, rows, min_docs=2)
    assert out[1].text_dedup == "dup para\n\nunique one"
    assert out[1].n_removed == 0 and out[1].n_paragraphs == 2
    assert out[2].text_dedup == "unique two" and out[2].n_removed == 1
    assert out[3].text_dedup == "solo\n\ndoc" and out[3].n_removed == 0


def test_paragraph_dedup_keep_none_and_null(spark):
    rows = [(1, "x\n\ny"), (2, "x\n\nz"), (3, None)]
    out = _paras(spark, rows, min_docs=2, keep="none")
    assert out[1].text_dedup == "y" and out[1].n_removed == 1
    assert out[2].text_dedup == "z" and out[2].n_removed == 1
    assert out[3].text_dedup is None and out[3].n_paragraphs == 0
    with pytest.raises(ValueError, match="keep"):
        dedup.paragraph_dedup(
            spark.createDataFrame(rows, "doc_id long, text string"),
            "text", "doc_id", keep="bogus",
        )


def test_paragraph_dedup_custom_separator_is_literal(spark):
    # '. ' contains a regex metacharacter — the \\Q quoting must split
    # literally (matching DuckDB string_split), not "any char + space"
    rows = [(1, "same sent. ax bx"), (2, "same sent. cx dx")]
    out = _paras(spark, rows, sep=". ", min_docs=2)
    assert out[1].text_dedup == "same sent. ax bx"
    assert out[2].text_dedup == "cx dx" and out[2].n_removed == 1


def test_duplicate_run_stats_hand_corpus(spark):
    """Two docs share one exact 10-token passage and one exact 4-token
    passage: with k=3 the 10-token passage is 8 consecutive duplicated
    windows (one run, longest 10 tokens), the 4-token one is 2 windows
    (one run, 4 tokens); a unique doc reports zeros."""
    from csvtool_spark.operators.dedup import duplicate_run_stats

    shared10 = "a b c d e f g h i j"
    shared4 = "p q r s"
    rows = [
        (1, f"x1 y1 {shared10} z1 w1 {shared4} v1"),
        (2, f"x2 {shared10} k2 m2 n2 o2 {shared4}"),
        (3, "totally unique words only here nothing shared at all"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           duplicate_run_stats(d, "text", "doc_id", k=3).collect()}
    for i in (1, 2):
        assert out[i]["n_runs"] == 2
        assert out[i]["longest_run_tokens"] == 10
        assert out[i]["n_dup_positions"] == 8 + 2
    assert (out[3]["n_runs"], out[3]["longest_run_tokens"],
            out[3]["n_dup_positions"]) == (0, 0, 0)


def test_remove_duplicate_runs_length_threshold(spark):
    """The 10-token shared passage (≥ L=8) is removed from the non-owner;
    the 4-token shared passage (< 8) SURVIVES everywhere — the
    distinction remove_duplicate_spans cannot make."""
    from csvtool_spark.operators.dedup import (
        remove_duplicate_runs,
        remove_duplicate_spans,
    )

    shared10 = "a b c d e f g h i j"
    shared4 = "p q r s"
    rows = [
        (1, f"x1 y1 {shared10} z1 w1 {shared4} v1"),
        (2, f"x2 {shared10} k2 m2 n2 o2 {shared4}"),
        (3, "totally unique words only here nothing shared at all"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in remove_duplicate_runs(
        d, "text", "doc_id", k=3, min_run_tokens=8
    ).collect()}
    # owner (doc 1, min id) keeps everything
    assert out[1]["text_dedup"] == rows[0][1] and out[1]["n_removed"] == 0
    # doc 2 loses exactly the 10 tokens of the long passage, keeps 'p q r s'
    assert shared10 not in out[2]["text_dedup"]
    assert shared4 in out[2]["text_dedup"]
    assert out[2]["n_removed"] == 10
    assert out[3]["n_removed"] == 0
    # contrast: plain span removal also trims the short shared passage
    spans = {r["doc_id"]: r for r in remove_duplicate_spans(
        d, "text", "doc_id", k=3
    ).collect()}
    assert shared4 not in spans[2]["text_dedup"]


def test_remove_duplicate_runs_keep_none_and_membership(spark):
    from csvtool_spark.operators.dedup import remove_duplicate_runs

    shared = "m n o p q r s t u v"
    d = spark.createDataFrame(
        [(1, f"a1 {shared} b1"), (2, f"a2 {shared} b2")],
        "doc_id long, text string",
    )
    none_out = {r["doc_id"]: r["n_removed"] for r in remove_duplicate_runs(
        d, "text", "doc_id", k=3, min_run_tokens=8, keep="none"
    ).collect()}
    assert none_out == {1: 10, 2: 10}  # both copies trimmed
    a = remove_duplicate_runs(
        d, "text", "doc_id", k=3, min_run_tokens=8, membership="except"
    ).orderBy("doc_id").collect()
    b = remove_duplicate_runs(
        d, "text", "doc_id", k=3, min_run_tokens=8, membership="contains"
    ).orderBy("doc_id").collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_run_removal_exactness_no_welding(spark):
    """Round-8 verdict item 1: two DISTINCT short shared substrings whose
    straddle windows a third document duplicates used to weld into one
    apparent >=L run and be removed wholesale; the exactness lane
    re-hashes the FULL run text, finds it repeats nowhere, and keeps it.
    The window lane (verify_exact=False) still welds — differential pin."""
    import duckdb

    from csvtool_spark.operators.dedup import (
        remove_duplicate_runs,
        run_removal_oracle_sql,
    )

    x = "x1 x2 x3 x4 x5"
    y = "y1 y2 y3 y4 y5"
    rows = [
        (10, f"{x} {y}"),          # weld victim: X and Y adjacent
        (1, f"b1 b2 {x} b3 b4"),   # shares X only (5 tokens < L=8)
        (2, f"c1 {y} c2"),         # shares Y only
        (3, "x3 x4 x5 y1 y2 y3"),  # duplicates the X/Y straddle windows
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    exact = {r["doc_id"]: r for r in remove_duplicate_runs(
        d, "text", "doc_id", k=3, min_run_tokens=8
    ).collect()}
    # the welded 10-token island's full text repeats in no other document,
    # and each true match is shorter than L — nothing may be removed
    assert {i: r["n_removed"] for i, r in exact.items()} == {
        10: 0, 1: 0, 2: 0, 3: 0
    }
    assert exact[10]["text_dedup"] == f"{x} {y}"
    # the window lane DOES weld: doc 10's island spans all 10 tokens
    approx = {r["doc_id"]: r for r in remove_duplicate_runs(
        d, "text", "doc_id", k=3, min_run_tokens=8, verify_exact=False
    ).collect()}
    assert approx[10]["n_removed"] == 10
    # both lanes stay oracle-paired on the weld corpus
    con = duckdb.connect()
    con.register("documents", d.toPandas())
    for ve in (True, False):
        got = sorted(
            tuple(r[c] for c in ["doc_id", "text_dedup", "n_tokens", "n_removed"])
            for r in remove_duplicate_runs(
                d, "text", "doc_id", k=3, min_run_tokens=8, verify_exact=ve
            ).collect()
        )
        want = sorted(
            tuple(r[:4])
            for r in con.execute(run_removal_oracle_sql(
                k=3, min_run_tokens=8, verify_exact=ve
            )).fetchall()
        )
        assert got == want, f"verify_exact={ve} diverged from the oracle"


def test_run_removal_exact_still_removes_true_long_repeats(spark):
    """The exactness lane must not weaken the true-positive path: a
    genuinely shared >=L passage is still removed from the non-owner,
    and keep='none' removes every copy."""
    from csvtool_spark.operators.dedup import remove_duplicate_runs

    shared = "s1 s2 s3 s4 s5 s6 s7 s8 s9 s10"
    d = spark.createDataFrame(
        [(7, f"a1 {shared} a2"), (8, f"b1 b2 {shared}")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in remove_duplicate_runs(
        d, "text", "doc_id", k=3, min_run_tokens=8
    ).collect()}
    assert out[7]["n_removed"] == 0 and shared in out[7]["text_dedup"]
    assert out[8]["n_removed"] == 10 and shared not in out[8]["text_dedup"]
    none_out = {r["doc_id"]: r["n_removed"] for r in remove_duplicate_runs(
        d, "text", "doc_id", k=3, min_run_tokens=8, keep="none"
    ).collect()}
    assert none_out == {7: 10, 8: 10}
