"""Property-based tests (hypothesis) for the dialect front-end invariants.

These are driver-side only (no Spark jobs) — they hammer the scanner,
literal type inference, and quirk semantics with generated inputs.
"""

from __future__ import annotations

from datetime import datetime, timedelta

from hypothesis import given, settings
from hypothesis import strategies as st

from csvtool_spark.dialect.errors import DialectError
from csvtool_spark.dialect.parser import parse
from csvtool_spark.dialect.scanner import scan
from csvtool_spark.dialect.types import (
    T_DATE,
    T_DURATION,
    T_FLOAT,
    T_INT,
    T_NULL,
    T_STRING,
    narrowest_type,
    parse_date,
    parse_duration_seconds,
    widen,
)

printable = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=80
)


@given(printable)
@settings(max_examples=300, deadline=None)
def test_scanner_total(text):
    """The scanner either returns tokens or raises ScanError — never other
    exceptions, and always terminates with EOF."""
    try:
        toks = scan(text)
    except DialectError:
        return
    assert toks[-1].kind == "EOF"
    for t in toks[:-1]:
        assert t.kind in ("WORD", "OP")
        assert t.quoted or t.val != ""


@given(printable)
@settings(max_examples=300, deadline=None)
def test_parser_total(text):
    """parse() either returns a Query or raises a DialectError."""
    try:
        q = parse("select a from 'f.csv' where b = " + text)
        assert q.base.path == "f.csv"
    except DialectError:
        pass


@given(st.integers(min_value=-(10**17), max_value=10**17))
def test_int_literals_infer_int(n):
    t = narrowest_type(str(n))
    if str(n).startswith("0") and len(str(n)) > 1:
        assert t == T_STRING  # leading-zero rule
    else:
        assert t == T_INT


@given(st.floats(allow_nan=False, allow_infinity=False, width=64))
def test_float_literals_infer_numeric(x):
    t = narrowest_type(repr(x))
    assert t in (T_INT, T_FLOAT)


@given(st.sampled_from(["null", "NULL", "Null", "NA", ""]))
def test_null_tokens(tok):
    assert narrowest_type(tok) == T_NULL


@given(
    st.integers(min_value=1, max_value=10**6),
    st.sampled_from(["s", "m", "h", "d", "w", "y", "seconds", "minutes",
                     "hours", "days", "weeks", "years"]),
)
def test_duration_inference_and_parse(n, unit):
    s = f"{n} {unit}"
    assert narrowest_type(s) == T_DURATION
    secs = parse_duration_seconds(s)
    assert secs is not None and secs > 0
    per = {"s": 1, "m": 60, "h": 3600, "d": 86400, "w": 604800, "y": 52 * 604800}
    assert secs == n * per[unit[0]]


@given(st.datetimes(min_value=datetime(1900, 1, 1), max_value=datetime(2100, 1, 1)))
def test_date_formats_roundtrip(dt):
    d = dt.replace(microsecond=0)
    for fmt in ("%Y-%m-%d %H:%M:%S", "%m/%d/%Y"):
        s = d.strftime(fmt)
        parsed = parse_date(s)
        assert parsed is not None
        if fmt == "%m/%d/%Y":
            assert parsed.date() == d.date()
        else:
            assert parsed == d


@given(st.lists(st.sampled_from([T_NULL, T_INT, T_FLOAT, T_DATE, T_DURATION, T_STRING]), min_size=1))
def test_widen_is_max_fold(types):
    """Column inference = max over the narrowing order (associative,
    commutative, idempotent)."""
    acc = T_NULL
    for t in types:
        acc = widen(acc, t)
    assert acc == max(types)
    assert widen(acc, acc) == acc


def test_between_halfopen_randomized_vs_model(spark):
    """200 seeded random (x, a, b) triples: the Spark builder must agree
    with a direct Python model of selector.go:480-495."""
    import random

    from pyspark.sql import functions as F

    from csvtool_spark.functions.scalar import between_halfopen

    rng = random.Random(1234)
    rows = [
        (rng.uniform(-100, 100), rng.uniform(-100, 100), rng.uniform(-100, 100))
        for _ in range(200)
    ]
    df = spark.createDataFrame(rows, "x double, a double, b double")
    got = [
        r[0]
        for r in df.select(
            between_halfopen(F.col("x"), F.col("a"), F.col("b"))
        ).collect()
    ]
    expected = [(x < b) if x >= a else (x >= b) for x, a, b in rows]
    assert got == expected


@given(st.floats(allow_nan=False, allow_infinity=False, width=64,
                 min_value=-1e12, max_value=1e12))
def test_half_away_matches_duckdb_round(x):
    """functions.fixedpoint.half_away must agree with DuckDB round(x, 0)
    for every finite double — the cross-engine grid contract every
    fixed-point operator (NB, PCA, BM25, DSIR) rests on."""
    import duckdb

    from csvtool_spark.functions.fixedpoint import half_away

    got = half_away(x)
    want = duckdb.sql(
        f"SELECT CAST(round(CAST({x!r} AS DOUBLE), 0) AS BIGINT)"
    ).fetchone()[0]
    assert got == want, (x, got, want)


@given(st.text(alphabet=st.characters(codec="utf-8"), max_size=40))
def test_md5_prefix_long_matches_duckdb(s):
    """The repo's canonical cross-engine hash: DuckDB's formula over the
    same string must equal the driver-side reference for ANY unicode
    payload (hashing operates on UTF-8 bytes in both engines)."""
    import hashlib

    import duckdb

    ref = int(hashlib.md5(s.encode("utf-8")).hexdigest()[:8], 16)
    got = duckdb.sql(
        "SELECT CAST(concat('0x', substr(md5(?), 1, 8)) AS BIGINT)", params=[s]
    ).fetchone()[0]
    assert got == ref, (s, got, ref)


@given(
    st.one_of(
        st.integers(min_value=-(2**63), max_value=2**63 - 1),
        st.floats(allow_nan=False, allow_infinity=False, width=64),
    )
)
@settings(max_examples=300, deadline=None)
def test_num_kwarg_lane_matches_twin_lane(v):
    """The filter stage's literal-lane rule and twin_filter's isinstance
    branch must agree for EVERY numeric lexeme: an integer lexeme parses
    to int on the engine side exactly when the twin would emit the
    BIGINT lane for the parsed value; every other lexeme lands both
    sides in the double lane (round-10 lane contract)."""
    from csvtool_spark.dialect import ast as dast
    from csvtool_spark.dialect.stages import _num_kwarg

    text = repr(v)
    st_stub = dast.Stage(
        name="filter", args=[], kwargs={"min": dast.StageArg(text, False)}
    )
    got = _num_kwarg(st_stub, "min", None)
    if isinstance(v, int):
        assert got == v and isinstance(got, int)  # exact int64 lane
    else:
        assert isinstance(got, float) and got == float(text)


# ---------------------------------------------------------------------------
# Sink-name arithmetic (engine.split_sink_name / numbered_sink_path) —
# the seam where round 11 found the multi-statement -N/codec bug
# (out.jsonl-2.gz, a name no dispatch can ever read back)
# ---------------------------------------------------------------------------

_fmt_exts = st.sampled_from(
    ["", ".csv", ".tsv", ".txt", ".jsonl", ".ndjson", ".json",
     ".parquet", ".orc", ".dat"]
)
_codec_exts = st.sampled_from(["", ".gz", ".bz2", ".deflate"])
# stems free of '.' so splitext can't bite into them; non-empty
_stems = st.text(
    alphabet=st.characters(
        min_codepoint=97, max_codepoint=122
    ),
    min_size=1, max_size=20,
).map(lambda s: "/tmp/" + s)


@given(_stems, _fmt_exts, _codec_exts, st.integers(2, 9), st.integers(0, 8))
@settings(max_examples=300, deadline=None)
def test_sink_name_split_and_numbering_invariants(stem, fmt, codec, n, i):
    """For every (stem, format, codec) composition:
    - split_sink_name is exact: stem/format/codec recovered verbatim
      (a dotless stem can't be bitten into by splitext);
    - numbered_sink_path inserts -N BEFORE the format extension with the
      codec outermost (round-11 contract), keeps n==1 names untouched,
      and its output re-splits to the same format/codec lanes — so a
      multi-statement save always re-reads through the same dispatch."""
    from csvtool_spark.engine import numbered_sink_path, split_sink_name

    i = min(i, n - 1)
    path = f"{stem}{fmt}{codec}"
    s, f, c = split_sink_name(path)
    assert (s, f.lower(), c.lower()) == (stem, fmt, codec), path

    assert numbered_sink_path(path, 0, 1) == path  # single statement
    out = numbered_sink_path(path, i, n)
    assert out == f"{stem}-{i + 1}{fmt}{codec}", (path, out)
    s2, f2, c2 = split_sink_name(out)
    # the numbered name rides the SAME dispatch lanes as the original
    assert (f2.lower(), c2.lower()) == (fmt, codec), (path, out)
    assert s2 == f"{stem}-{i + 1}", (path, out)
