"""Dialect `sample` clause (engine extension): deterministic TABLESAMPLE
on the base file — md5-coin fraction or exact-N reservoir keyed on the
scan-order row number.  Cross-engine exactness rides the catalog gate
(q_dialect_sample / q_dialect_sample_n); these tests pin the parse
rules, determinism, nesting and composition."""

from __future__ import annotations

import pytest

from csvtool_spark.dialect.errors import ParseError
from csvtool_spark.engine import CsvEngine

V = " '/root/repo/tests/data/violations.csv' "


@pytest.fixture(scope="module")
def eng(spark):
    return CsvEngine(spark)


def _plates(df):
    return [r["plate"] for r in df.collect()]


def test_sample_fraction_deterministic(eng):
    a = _plates(eng.sql("select plate from" + V + "sample 0.5"))
    b = _plates(eng.sql("select plate from" + V + "sample 0.5"))
    assert a == b and 0 < len(a) < 200  # strict subset of the 200 rows


def test_sample_count_exact_and_nested(eng):
    s10 = set(_plates(eng.sql("select plate from" + V + "sample 10")))
    s20 = set(_plates(eng.sql("select plate from" + V + "sample 20")))
    assert len(s10) == 10 and len(s20) == 20
    assert s10 <= s20  # reservoir nesting: smaller sample ⊆ larger


def test_sample_composes_with_where_order_top(eng):
    out = eng.sql(
        "select top 5 plate fine from" + V
        + "sample 0.6 where fine > 100 order by fine"
    ).collect()
    assert 0 < len(out) <= 5
    fines = [r["fine"] for r in out]
    assert all(f > 100 for f in fines)
    assert fines == sorted(fines, reverse=True)  # default-DESC order


def test_sample_fraction_thins_proportionally(eng):
    n_all = eng.sql("select plate from" + V).count()
    n_half = eng.sql("select plate from" + V + "sample 0.5").count()
    assert abs(n_half / n_all - 0.5) < 0.15  # md5 coin ≈ uniform


def test_sample_parse_errors(eng):
    with pytest.raises(ParseError, match="fraction must be in"):
        eng.sql("select plate from" + V + "sample 1.5")
    with pytest.raises(ParseError, match="count must be >= 1"):
        eng.sql("select plate from" + V + "sample 0")
    with pytest.raises(ParseError, match="number after 'sample'"):
        eng.sql("select plate from" + V + "sample lots")


def test_sample_with_aggregate(eng):
    # aggregates see only the sampled rows
    n = eng.sql("select count(*) as n from" + V + "sample 20").collect()[0]["n"]
    assert n == 20.0  # dialect count() is FLOAT


def test_sample_reservoir_is_take_ordered(eng):
    plan = (
        eng.sql("select plate from" + V + "sample 15")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan


def test_sample_applies_to_base_before_join(eng):
    # 'from a sample N join b' samples the BASE file's scan rows first,
    # then joins. The expectation is computed INDEPENDENTLY from the
    # documented coin — md5('smp#' || scan_index), 3 smallest (coin, i) —
    # so a regression that moved the sample after the join (whose row
    # numbering differs) would fail, not just change counts.
    import hashlib

    lines = [
        ln.split(",")
        for ln in open("/root/repo/tests/data/cities.csv").read().strip().splitlines()
    ]
    coins = sorted(
        (int(hashlib.md5(f"smp#{i}".encode()).hexdigest()[:8], 16), i)
        for i in range(len(lines))
    )
    expected_base = {lines[i][0] for _, i in coins[:3]}

    q = (
        "nh select c.c1 r.c2 from '/root/repo/tests/data/cities.csv' c "
        "sample 3 join '/root/repo/tests/data/regions.csv' r on c.c3 = r.c1"
    )
    a = [tuple(r) for r in eng.sql(q).collect()]
    b = [tuple(r) for r in eng.sql(q).collect()]
    assert sorted(a) == sorted(b)
    assert {c1 for c1, _ in a} == expected_base  # all 3 sampled rows join
