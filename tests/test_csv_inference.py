"""Schema-inference breadth: permissive date shapes (reference
utils.go:393 dateparse.ParseAny) and the full Go duration unit set
(utils.go:446-504 + time.ParseDuration), plus reader robustness for
header names Spark would otherwise parse as struct access."""

from __future__ import annotations

import datetime

import pytest

from csvtool_spark.dialect.types import (
    T_DATE,
    T_DURATION,
    T_STRING,
    narrowest_type,
)
from csvtool_spark.sources.csv import read_csv


def _write(tmp_path, name: str, text: str) -> str:
    p = tmp_path / name
    p.write_text(text)
    return str(p)


# ---------------------------------------------------------------------------
# driver-side inference lattice
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "value",
    [
        "2017-06-01T00:00:00Z",
        "2017-06-01T02:00:00+02:00",
        "2017-06-01T00:00:00+0200",
        "2017-06-01T00:00:00.123Z",
        "2017-06-01 00:00",
        "June 1 2017 15:04:05",
        "Jun 1 2017 15:04:05",
        "Mon, 2 Jan 2006 15:04:05",
        "2006.01.02",
    ],
)
def test_permissive_shapes_infer_date(value):
    assert narrowest_type(value) == T_DATE


@pytest.mark.parametrize(
    "value",
    ["100ms", "250us", "80ns", "-1h30m", "1h30.5m", "1m100ms", "-2 weeks"],
)
def test_duration_shapes_infer_duration(value):
    assert narrowest_type(value) == T_DURATION


def test_epoch_like_digits_stay_int():
    # bare digit strings are INT (Atoi wins before dateparse in the
    # reference lattice too) — epoch detection must NOT capture them
    assert narrowest_type("1332151919") != T_DATE


def test_garbage_stays_string():
    assert narrowest_type("not a date 123x") == T_STRING


# ---------------------------------------------------------------------------
# Spark-side casts agree with the driver-side inference
# ---------------------------------------------------------------------------


def test_zoned_iso_roundtrip(spark, tmp_path):
    # all four cells are the same instant; session tz is UTC
    path = _write(
        tmp_path,
        "zoned.csv",
        "id,ts\n"
        "1,2017-06-01T12:00:00Z\n"
        "2,2017-06-01T14:00:00+02:00\n"
        "3,2017-06-01T14:00:00+0200\n"
        "4,2017-06-01T12:00:00.000Z\n",
    )
    df, names, types = read_csv(spark, path)
    assert types[1] == T_DATE
    vals = {r.ts for r in df.collect()}
    assert vals == {datetime.datetime(2017, 6, 1, 12, 0, 0)}


def test_minute_precision_and_monthname_time(spark, tmp_path):
    path = _write(
        tmp_path,
        "shapes.csv",
        "a,b\n"
        "2020-03-04 10:30,June 1 2017 15:04:05\n"
        "2020-03-05 23:59,Jun 2 2017 08:00:00\n",
    )
    df, _, types = read_csv(spark, path)
    assert types == [T_DATE, T_DATE]
    rows = df.collect()
    assert rows[0].a == datetime.datetime(2020, 3, 4, 10, 30)
    assert rows[0].b == datetime.datetime(2017, 6, 1, 15, 4, 5)
    assert all(r.a is not None and r.b is not None for r in rows)


def test_subsecond_and_fractional_durations(spark, tmp_path):
    path = _write(
        tmp_path,
        "durs.csv",
        "task,dur\n"
        "a,100ms\n"
        "b,-1h30m\n"
        "c,1h30.5m\n"
        "d,1m100ms\n"
        "e,250us\n"
        "f,-2 weeks\n",
    )
    df, _, types = read_csv(spark, path)
    assert types[1] == T_DURATION
    by_task = {r.task: r.dur for r in df.collect()}
    td = datetime.timedelta
    assert by_task["a"] == td(milliseconds=100)
    assert by_task["b"] == -td(hours=1, minutes=30)
    assert by_task["c"] == td(hours=1, minutes=30, seconds=30)
    assert by_task["d"] == td(minutes=1, milliseconds=100)
    assert by_task["e"] == td(microseconds=250)
    assert by_task["f"] == -td(weeks=2)


def test_dotted_and_spaced_header_names(spark, tmp_path):
    # a header like 'a.b' must not be parsed as struct-field access
    path = _write(
        tmp_path,
        "dotted.csv",
        "a.b,c d,plain\n1,x,10\n2,y,20\n",
    )
    df, names, _ = read_csv(spark, path)
    assert names == ["a.b", "c d", "plain"]
    rows = df.collect()
    assert [r["a.b"] for r in rows] == [1, 2]
    assert [r["plain"] for r in rows] == [10, 20]


def test_gzipped_csv_and_jsonl_through_engine(spark, tmp_path):
    """Compressed crawl drops read through the same inference path as
    their plain twins (Spark decompresses by extension)."""
    import gzip
    import shutil

    from csvtool_spark.engine import CsvEngine

    src = "tests/data/violations.csv"
    gz = str(tmp_path / "violations.csv.gz")
    with open(src, "rb") as f, gzip.open(gz, "wb") as g:
        shutil.copyfileobj(f, g)
    eng = CsvEngine(spark)
    plain = eng.sql(f"select plate fine from '{src}' where fine > 400")
    comp = eng.sql(f"select plate fine from '{gz}' where fine > 400")
    assert sorted(map(tuple, comp.collect())) == sorted(map(tuple, plain.collect()))
    assert comp.dtypes == plain.dtypes  # same inferred schema

    import bz2 as bz2lib

    b2 = str(tmp_path / "violations.csv.bz2")
    with open(src, "rb") as f:
        raw = f.read()
    with open(b2, "wb") as g:
        g.write(bz2lib.compress(raw))
    comp2 = eng.sql(f"select plate fine from '{b2}' where fine > 400")
    assert sorted(map(tuple, comp2.collect())) == sorted(map(tuple, plain.collect()))

    jl = str(tmp_path / "docs.jsonl.gz")
    with gzip.open(jl, "wt") as g:
        g.write('{"a": 1, "b": "x"}\n{"a": 2, "b": "y"}\n')
    rows = eng.sql(f"select a b from '{jl}'").collect()
    assert sorted((r.a, r.b) for r in rows) == [(1, "x"), (2, "y")]


def test_glob_reads_shards_as_one_table(spark, tmp_path):
    import shutil

    from csvtool_spark.dialect.errors import SemanticError
    from csvtool_spark.engine import CsvEngine

    src = "tests/data/violations.csv"
    with open(src) as f:
        lines = f.readlines()
    head, body = lines[0], lines[1:]
    mid = len(body) // 2
    (tmp_path / "part1.csv").write_text(head + "".join(body[:mid]))
    (tmp_path / "part2.csv").write_text(head + "".join(body[mid:]))
    eng = CsvEngine(spark)
    whole = eng.sql(f"select plate fine from '{src}' where fine > 400")
    shards = eng.sql(f"select plate fine from '{tmp_path}/part*.csv' where fine > 400")
    assert sorted(map(tuple, shards.collect())) == sorted(map(tuple, whole.collect()))
    assert shards.dtypes == whole.dtypes

    import pytest

    with pytest.raises(SemanticError):
        eng.sql(f"select * from '{tmp_path}/nomatch*.csv'")


# ---------------------------------------------------------------------------
# epoch-timestamp columns (dateparse.ParseAny numeric breadth, utils.go:393)
# ---------------------------------------------------------------------------


def test_epoch_seconds_column_promotes_to_date(spark, tmp_path):
    # unanimity-guarded column-level promotion: every sampled value is a
    # 10-digit epoch in 1990-2040 → DATE (single values still infer INT,
    # exactly like the reference's Atoi-first lattice)
    path = _write(
        tmp_path,
        "epoch.csv",
        "id,created\n1,1609459200\n2,1612137600\n3,null\n",
    )
    df, _, types = read_csv(spark, path)
    assert types[1] == T_DATE
    by_id = {r.id: r.created for r in df.collect()}
    assert by_id[1] == datetime.datetime(2021, 1, 1, 0, 0)
    assert by_id[2] == datetime.datetime(2021, 2, 1, 0, 0)
    assert by_id[3] is None


def test_epoch_millis_column_promotes_to_date(spark, tmp_path):
    path = _write(
        tmp_path,
        "epochms.csv",
        "id,t\n1,1609459200500\n2,1612137600000\n",
    )
    df, _, types = read_csv(spark, path)
    assert types[1] == T_DATE
    by_id = {r.id: r.t for r in df.collect()}
    assert by_id[1] == datetime.datetime(2021, 1, 1, 0, 0, 0, 500000)
    assert by_id[2] == datetime.datetime(2021, 2, 1, 0, 0)


def test_epoch_outside_range_or_mixed_widths_stay_int(spark, tmp_path):
    # 9999999999 (year 2286) violates the 1990-2040 guard; a column mixing
    # 10-digit and small ints is not unanimous — both stay INT
    path = _write(
        tmp_path,
        "notepoch.csv",
        "a,b\n9999999999,1609459200\n1609459200,42\n",
    )
    df, _, types = read_csv(spark, path)
    from csvtool_spark.dialect.types import T_INT

    assert types == [T_INT, T_INT]
    rows = df.collect()
    assert {r.a for r in rows} == {9999999999, 1609459200}


def test_mixed_date_and_epoch_cells_both_convert(spark, tmp_path):
    # widen(T_INT, T_DATE) = T_DATE: the reference converts every cell of a
    # DATE column via ParseAny, which accepts both shapes — so must we
    path = _write(
        tmp_path,
        "mixed.csv",
        "id,d\n1,2021-01-01\n2,1612137600\n3,1609459200500\n",
    )
    df, _, types = read_csv(spark, path)
    assert types[1] == T_DATE
    by_id = {r.id: r.d for r in df.collect()}
    assert by_id[1] == datetime.datetime(2021, 1, 1)
    assert by_id[2] == datetime.datetime(2021, 2, 1)
    assert by_id[3] == datetime.datetime(2021, 1, 1, 0, 0, 0, 500000)


def test_parse_date_literal_epoch():
    # dialect literal conversion breadth: '1609459200' enforced to DATE
    from csvtool_spark.dialect.types import parse_date

    assert parse_date("1609459200") == datetime.datetime(2021, 1, 1)
    assert parse_date("1609459200500") == datetime.datetime(2021, 1, 1, 0, 0, 0, 500000)
    assert parse_date("123") is None


def test_epoch_promotion_optout(spark, tmp_path):
    path = _write(
        tmp_path, "optout.csv", "id,created\n1,1609459200\n2,1612137600\n"
    )
    from csvtool_spark.dialect.types import T_INT

    df, _, types = read_csv(spark, path, epoch_promotion=False)
    assert types[1] == T_INT
    assert {r.created for r in df.collect()} == {1609459200, 1612137600}


def test_epoch_cast_range_guard(spark):
    # full-scan conversion carries the same range guard as detection: a
    # 10-digit value beyond 2040 (possible past the sampled head) → null
    from csvtool_spark.sources.csv import EPOCH_SECONDS, parse_date_col
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("1609459200",), ("9999999999",), ("0999999999",)], ["v"]
    )
    out = df.select(parse_date_col(F.col("v"), [EPOCH_SECONDS]).alias("t")).collect()
    vals = [r.t for r in out]
    assert vals[0] == datetime.datetime(2021, 1, 1)
    assert vals[1] is None and vals[2] is None


def test_observed_formats_keep_ladder_fallback_when_only_epoch_sampled():
    # a DATE column whose first 200 non-null values are all epoch must not
    # lose the format ladder — the date string that made it DATE may sit
    # beyond the [:200] slice
    from csvtool_spark.sources.csv import (
        EPOCH_SECONDS,
        SPARK_DATE_FORMATS,
        observed_date_formats,
    )

    fmts = observed_date_formats(["1609459200"] * 200)
    assert fmts[-1] == EPOCH_SECONDS
    assert fmts[:-1] == SPARK_DATE_FORMATS
    # and a matched ladder entry narrows as before, epoch appended
    fmts2 = observed_date_formats(["2021-01-01", "1609459200"])
    assert "yyyy-MM-dd" in fmts2 and fmts2[-1] == EPOCH_SECONDS
    assert len(fmts2) < 6
