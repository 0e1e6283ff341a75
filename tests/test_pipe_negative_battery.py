"""Systematic expected-error battery for EVERY curation-pipe stage
(round-8 verdict item 5), modeled on the dialect's typecheck battery and
the reference's expected-error test style (main_test.go §5): each stage
is probed with its missing-required / wrong-type / unknown-kwarg /
reserved-name shapes and must raise a SemanticError whose message names
the problem. The battery is keyed off the STAGES dict itself, so adding
a stage without error coverage fails the suite."""

from __future__ import annotations

import pytest

from csvtool_spark.dialect.errors import SemanticError
from csvtool_spark.dialect.stages import STAGES
from csvtool_spark.engine import CsvEngine

Q = "select doc_id, text, source, n_tokens from battery_t |> "

#: stage -> [(category, full query, message regex)]
CASES: dict[str, list[tuple[str, str, str]]] = {
    "filter": [
        ("missing-arg", Q + "filter(min=1)", "exactly one column argument"),
        ("missing-arg", Q + "filter(n_tokens)", "requires min= and/or max="),
        ("wrong-type", Q + "filter(text, min=1)", "must be numeric"),
        ("wrong-type", Q + "filter(n_tokens, min=abc)", "expects a number"),
        ("unknown-kwarg", Q + "filter(n_tokens, min=1, bogus=2)",
         "unknown keyword"),
        ("bad-column", Q + "filter(nope, min=1)", "no column"),
    ],
    "normalize": [
        ("missing-arg", Q + "normalize()", "exactly one column argument"),
        ("wrong-type", Q + "normalize(n_tokens)", "must be a string"),
        ("unknown-kwarg", Q + "normalize(text, bogus=1)", "unknown keyword"),
        ("bad-column", Q + "normalize(nope)", "no column"),
    ],
    "shard": [
        ("missing-id", Q + "shard(key=doc_id)", "requires n="),
        ("missing-id", Q + "shard(n=8)", "requires key="),
        ("bad-value", Q + "shard(n=0, key=doc_id)", "requires n="),
        ("wrong-type", Q + "shard(n=x, key=doc_id)", "expects an integer"),
        ("unknown-kwarg", Q + "shard(n=8, key=doc_id, bogus=1)", "unknown keyword"),
        ("bad-value", Q + "shard(text, n=8, key=doc_id)", "keyword arguments only"),
        ("reserved-name", Q + "shard(n=8, key=doc_id, as=text)", "already exists"),
        ("bad-column", Q + "shard(n=8, key=nope)", "no column"),
    ],
    "dedup": [
        ("missing-id", Q + "dedup(text)", "requires id="),
        ("wrong-type", Q + "dedup(n_tokens, id=doc_id)", "must be a string"),
        ("unknown-kwarg", Q + "dedup(text, id=doc_id, bogus=1)", "unknown keyword"),
        ("bad-column", Q + "dedup(nope, id=doc_id)", "no column"),
        ("wrong-type", Q + "dedup(text, id=doc_id, by=source)",
         "numeric score column"),
    ],
    "neardup": [
        ("missing-id", Q + "neardup(text)", "requires id="),
        ("wrong-type", Q + "neardup(n_tokens, id=doc_id)", "must be a string"),
        ("unknown-kwarg", Q + "neardup(text, id=doc_id, bogus=1)", "unknown keyword"),
        ("bad-value", Q + "neardup(text, id=doc_id, threshold=0)", "threshold must be"),
        ("bad-value", Q + "neardup(text, id=doc_id, n_hashes=32, bands=5)",
         "multiple of bands"),
        ("wrong-type", Q + "neardup(text, id=text, transitive=1)", "integral"),
        ("bad-value", Q + "neardup(text, id=doc_id, by=n_tokens)",
         "applies only with transitive=1"),
        ("wrong-type", Q + "neardup(text, id=doc_id, transitive=1, by=text)",
         "numeric score column"),
    ],
    "langid": [
        ("wrong-type", Q + "langid(n_tokens)", "must be a string"),
        ("unknown-kwarg", Q + "langid(text, bogus=1)", "unknown keyword"),
        ("reserved-name", Q + "langid(text, as=text)", "already exists"),
        ("bad-value", Q + "langid(text, keep=klingon)", "keep= must be one of"),
    ],
    "quality": [
        ("wrong-type", Q + "quality(n_tokens)", "must be a string"),
        ("unknown-kwarg", Q + "quality(text, bogus=1)", "unknown keyword"),
        ("reserved-name", Q + "quality(text, as=source)", "already exists"),
        ("bad-value", Q + "quality(text, min=abc)", "expects a number"),
    ],
    "tokens": [
        ("missing-arg", Q + "tokens()", "exactly one column"),
        ("wrong-type", Q + "tokens(n_tokens)", "must be a string"),
        ("unknown-kwarg", Q + "tokens(text, bogus=1)", "unknown keyword"),
        ("reserved-name", Q + "tokens(text, as=text)", "already exists"),
    ],
    "fingerprint": [
        ("missing-arg", Q + "fingerprint()", "exactly one column"),
        ("wrong-type", Q + "fingerprint(n_tokens)", "must be a string"),
        ("unknown-kwarg", Q + "fingerprint(text, bogus=1)", "unknown keyword"),
        ("reserved-name", Q + "fingerprint(text, as=doc_id)", "already exists"),
    ],
    "pii_scrub": [
        ("missing-arg", Q + "pii_scrub()", "exactly one column"),
        ("wrong-type", Q + "pii_scrub(n_tokens)", "must be a string"),
        ("unknown-kwarg", Q + "pii_scrub(text, bogus=1)", "unknown keyword"),
        ("wrong-type", Q + "pii_scrub('text')", "string literal"),
    ],
    "hash_sample": [
        ("missing-key", Q + "hash_sample(0.5)", "requires key="),
        ("wrong-type", Q + "hash_sample(abc, key=doc_id)", "expected a fraction"),
        ("bad-value", Q + "hash_sample(1.5, key=doc_id)", "fraction must be"),
        ("unknown-kwarg", Q + "hash_sample(0.5, key=doc_id, bogus=1)",
         "unknown keyword"),
    ],
    "split": [
        ("missing-key", Q + "split(train=0.5)", "requires key="),
        ("missing-arg", Q + "split(key=doc_id)", "at least one label=fraction"),
        ("wrong-type", Q + "split(key=doc_id, train=abc)", "expects a fraction"),
        ("bad-value", Q + "split(doc_id, key=doc_id, train=0.5)",
         "keyword arguments only"),
        ("reserved-name", Q + "split(key=doc_id, train=0.5, as=text)",
         "already exists"),
        ("bad-value", Q + "split(key=doc_id, train=0.9, test=0.4)", "fraction"),
    ],
    "decontaminate": [
        ("missing-id", Q + "decontaminate(text)", "requires id="),
        ("missing-arg", Q + "decontaminate(text, id=doc_id)", "requires ref="),
        ("unknown-kwarg",
         Q + "decontaminate(text, id=doc_id, ref=battery_ref, bogus=1)",
         "unknown keyword"),
        ("bad-column",
         Q + "decontaminate(text, id=doc_id, ref=battery_ref, ref_text=nope)",
         "no column 'nope' in ref"),
    ],
    "despan": [
        ("missing-id", Q + "despan(text)", "requires id="),
        ("wrong-type", Q + "despan(n_tokens, id=doc_id)", "must be a string"),
        ("unknown-kwarg", Q + "despan(text, id=doc_id, bogus=1)", "unknown keyword"),
        ("bad-value", Q + "despan(text, id=doc_id, keep=middle)", "keep= must be"),
        ("bad-value", Q + "despan(text, id=doc_id, exact=0)",
         "exact= applies only"),
    ],
    "quota": [
        ("missing-arg", Q + "quota()", "exactly one group column"),
        ("missing-arg", Q + "quota(source, order=doc_id)", "requires cap="),
        ("missing-arg", Q + "quota(source, cap=5)", "requires order="),
        ("wrong-type", Q + "quota(source, cap=abc, order=doc_id)",
         "expects an integer"),
        ("unknown-kwarg", Q + "quota(source, cap=5, order=doc_id, bogus=1)",
         "unknown keyword"),
        ("wrong-type", Q + "quota(source, cap=5, order=doc_id, tokens=text)",
         "numeric count column"),
        ("bad-column", Q + "quota(source, cap=5, order=doc_id, tokens=nope)",
         "no column"),
        ("bad-column", Q + "quota(source, cap=5, order=doc_id, tie=nope)",
         "no column"),
    ],
    "chunk": [
        ("missing-id", Q + "chunk(text)", "requires id="),
        ("unknown-kwarg", Q + "chunk(text, id=doc_id, bogus=1)", "unknown keyword"),
        ("bad-value", Q + "chunk(text, id=doc_id, size=16, overlap=16)",
         "must be < size"),
        ("reserved-name",
         "select doc_id, text, doc_id as chunk_id from battery_t "
         "|> chunk(text, id=doc_id)",
         "already exists"),
    ],
    "pack": [
        ("missing-arg", Q + "pack(id=doc_id, budget=64)",
         "exactly one token-count column"),
        ("missing-id", Q + "pack(n_tokens, budget=64)", "requires id="),
        ("missing-arg", Q + "pack(n_tokens, id=doc_id)", "requires budget="),
        ("unknown-kwarg", Q + "pack(n_tokens, id=doc_id, budget=64, bogus=1)",
         "unknown keyword"),
        ("bad-column", Q + "pack(nope, id=doc_id, budget=64)", "no column"),
    ],
    "bpe": [
        ("missing-arg", Q + "bpe(text)", "requires merges="),
        ("unknown-kwarg", Q + "bpe(text, bogus=1)", "unknown keyword"),
        ("reserved-name", Q + "bpe(text, merges='x', as=text)", "already exists"),
        ("bad-value", Q + "bpe(text, merges='/nonexistent/battery.parquet')",
         "cannot load merges"),
    ],
    "clean": [
        ("wrong-type", Q + "clean(n_tokens)", "must be a string"),
        ("unknown-kwarg", Q + "clean(text, bogus=1)", "unknown keyword"),
        ("bad-value", Q + "clean(text, min_words=0)", "must be >= 1"),
        ("wrong-type", Q + "clean(text, min_words=abc)", "expects an integer"),
    ],
    "derep": [
        ("missing-id", Q + "derep(text)", "requires id="),
        ("wrong-type", Q + "derep(n_tokens, id=doc_id)", "must be a string"),
        ("unknown-kwarg", Q + "derep(text, id=doc_id, bogus=1)", "unknown keyword"),
        ("wrong-type", Q + "derep(text, id=doc_id, k=abc)", "expects an integer"),
    ],
    "gopher": [
        ("missing-arg", Q + "gopher()", "exactly one column"),
        ("wrong-type", Q + "gopher(n_tokens)", "must be a string"),
        ("unknown-kwarg", Q + "gopher(text, id=doc_id)", "unknown keyword"),
        ("reserved-name",
         "select doc_id, text, 0.1 as dup_line_frac from battery_t "
         "|> gopher(text)",
         "already exists"),
        ("wrong-type", Q + "gopher(text, filter=x)", "expects an integer"),
    ],
    "mixture": [
        ("missing-arg", Q + "mixture(key=doc_id, tokens=n_tokens, web=1000)",
         "exactly one source column"),
        ("missing-key", Q + "mixture(source, key=doc_id)",
         "requires key=<column> and tokens="),
        ("missing-arg", Q + "mixture(source, key=doc_id, tokens=n_tokens)",
         "at least one <source>=<ppm>"),
        ("bad-value", Q + "mixture(source, key=doc_id, tokens=n_tokens, web=abc)",
         "positive ppm"),
        ("reserved-name",
         "select doc_id, text, source, n_tokens, doc_id as keep_ppm "
         "from battery_t |> mixture(source, key=doc_id, tokens=n_tokens, "
         "web=1000)",
         "keep_ppm' already exists"),
        # temperature mode (round 11)
        ("mode-conflict",
         Q + "mixture(source, key=doc_id, tokens=n_tokens, rates=1, "
         "temperature=0.5)",
         "mutually exclusive"),
        ("bad-value",
         Q + "mixture(source, key=doc_id, tokens=n_tokens, temperature=1.5)",
         "in \\(0, 1\\]"),
        ("bad-value",
         Q + "mixture(source, key=doc_id, tokens=n_tokens, temperature=0)",
         "in \\(0, 1\\]"),
        ("missing-key",
         Q + "mixture(source, key=doc_id, temperature=0.5)",
         "temperature mode requires"),
        ("mode-conflict",
         Q + "mixture(source, key=doc_id, tokens=n_tokens, "
         "temperature=0.5, web=1000)",
         "not allowed"),
        ("wrong-type",
         Q + "mixture(source, key=doc_id, tokens=n_tokens, temperature=x)",
         "expects a number"),
    ],
}


@pytest.fixture(scope="module")
def eng(spark):
    e = CsvEngine(spark)
    e.register(
        "battery_t",
        spark.createDataFrame(
            [
                (1, "alpha beta gamma delta", "web", 4),
                (2, "epsilon zeta eta theta", "books", 4),
            ],
            "doc_id long, text string, source string, n_tokens long",
        ),
    )
    e.register(
        "battery_ref",
        spark.createDataFrame([(1, "ref words here")], "rid long, body string"),
    )
    return e


def test_battery_covers_every_stage():
    """A stage added to STAGES without negative-path coverage fails here —
    the lock the round-8 verdict asked for."""
    assert set(CASES) == set(STAGES), (
        f"stages without error coverage: {sorted(set(STAGES) - set(CASES))}; "
        f"stale battery entries: {sorted(set(CASES) - set(STAGES))}"
    )
    for name, cases in CASES.items():
        assert len(cases) >= 4, f"stage '{name}' needs >= 4 negative cases"


def test_battery_spans_all_categories():
    cats = {c for cases in CASES.values() for c, _, _ in cases}
    assert {"missing-id", "wrong-type", "unknown-kwarg", "reserved-name"} <= cats


@pytest.mark.parametrize(
    "stage,category,query,match",
    [(s, c, q, m) for s, cases in sorted(CASES.items()) for c, q, m in cases],
    ids=lambda v: v if isinstance(v, str) and len(v) < 40 else None,
)
def test_stage_negative_path(eng, stage, category, query, match):
    with pytest.raises(SemanticError, match=match):
        eng.sql(query)
