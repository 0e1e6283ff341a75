"""Duration-typed CSV columns through the dialect (reference §1.2: duration
is a first-class scalar type, summable, date±duration algebra)."""

from __future__ import annotations

import datetime
import os

import pytest

from csvtool_spark.engine import CsvEngine

T = f" '{os.path.join(os.path.dirname(__file__), 'data')}/tasks.csv' "


@pytest.fixture(scope="module")
def eng(spark):
    return CsvEngine(spark)


def test_duration_column_inferred(eng):
    df = eng.sql("select top 3 task dur started from" + T)
    assert dict(df.dtypes)["dur"] == "interval day to second"
    assert dict(df.dtypes)["started"] == "timestamp"


def test_duration_sum(eng):
    total = eng.sql("select sum(dur) as total from" + T).first().total
    assert isinstance(total, datetime.timedelta)
    assert total > datetime.timedelta(days=1)


def test_duration_algebra(eng):
    rows = eng.sql("select task started started+dur as eta dur*2 as dbl from" + T).collect()
    for r in rows:
        assert r.eta >= r.started


def test_duration_comparison_with_literal(eng):
    n = eng.sql("select task from" + T + "where dur > '1 hour'").count()
    assert 0 < n < 50


def test_duration_avg_and_abs(eng):
    row = eng.sql("select avg(dur) as a from" + T).first()
    assert isinstance(row.a, datetime.timedelta)


def test_three_file_join_chain(eng, spark):
    eng.register_dir("/root/testdata/sf0.001", ["customer", "nation", "region"])
    df = eng.sql(
        "select c_custkey n_name r_name from customer c "
        "join nation n on c.c_nationkey = n.n_nationkey "
        "join region r on n.n_regionkey = r.r_regionkey"
    )
    rows = df.collect()
    assert len(rows) == spark.read.parquet(
        "/root/testdata/sf0.001/customer.parquet"
    ).count()
    assert all(r.r_name for r in rows)
