"""Idempotence pins for the text-REWRITE stages: applying
normalize / pii_scrub / clean twice must equal applying them once.

Why this matters at 100 TB: curation pipelines re-run — a crawl gets
normalized at ingest and again inside a later recipe, a scrubbed dump is
scrubbed again after a merge. A non-idempotent rewrite silently mutates
text on every pass (and breaks fingerprint/dedup stability across
reprocessing). Each stage's docstring implies idempotence; this pins it
on adversarial probes (the round-9 lesson: order-of-operations claims
need probe corpora — cross-engine twins can't see a bug both passes
share).
"""

from __future__ import annotations

import pytest

from csvtool_spark.dialect.parser import parse_pipeline
from csvtool_spark.dialect.stages import apply_stages

PROBES = [
    (0, "café con leche"),                    # decomposed accents
    (1, "cafe\x00́ mark after control"),    # control between base+mark
    (2, "a  \t b\t\tc  "),                         # whitespace runs + trim
    (3, "mail a@b.com twice a@b.com\nand keep\nlines"),
    (4, "Line one ends here. \nshort\nAnother good line stays here."),
    (5, "中文 text with\x07bell"),
    (6, None),
    (7, ""),
    (8, "<EMAIL> placeholder already scrubbed"),
    (9, "tab\tand\nnewline survive normalize"),
    (10, "x" * 300),                               # one long token
]


def _apply(spark, pipe: str, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = apply_stages(df, parse_pipeline(pipe))
    return {r["doc_id"]: r["text"] for r in out.collect()}


@pytest.mark.parametrize(
    "stage",
    [
        "normalize(text)",
        "pii_scrub(text)",
        "clean(text, min_words=2, terminal=0)",
        "clean(text, min_words=1, terminal=1)",
    ],
)
def test_rewrite_stage_is_idempotent(spark, stage):
    once = _apply(spark, stage, PROBES)
    twice = _apply(spark, f"{stage} |> {stage}", PROBES)
    assert once == twice, stage


def test_normalize_then_scrub_composition_stable(spark):
    """The README recipe order (normalize first) re-applied end-to-end:
    normalize |> pii_scrub run twice equals once — the two rewrites
    don't re-expose each other's work (e.g. whitespace collapse must
    not splice a scrubbed placeholder into something email-shaped)."""
    pipe = "normalize(text) |> pii_scrub(text)"
    once = _apply(spark, pipe, PROBES)
    twice = _apply(spark, f"{pipe} |> {pipe}", PROBES)
    assert once == twice
