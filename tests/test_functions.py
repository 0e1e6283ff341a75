"""Unit tests for the dialect scalar builders (reference-quirk semantics)."""

from __future__ import annotations

from pyspark.sql import functions as F

from csvtool_spark.functions.crypto import decrypt, encrypt
from csvtool_spark.functions.scalar import (
    between_halfopen,
    csv_div,
    csv_like,
    csv_week,
    null_eq,
)


def _vals(spark, col, rows, schema):
    df = spark.createDataFrame(rows, schema)
    return [r[0] for r in df.select(col).collect()]


def test_between_halfopen_semantics(spark):
    # Reference: x>=a → x<b (exclusive upper); x<a → x>=b (reversed bounds).
    rows = [(5.0,), (10.0,), (15.0,), (20.0,), (25.0,)]
    out = _vals(
        spark,
        between_halfopen(F.col("x"), F.lit(10.0), F.lit(20.0)),
        rows,
        "x double",
    )
    assert out == [False, True, True, False, False]
    # reversed bounds a=20, b=10: x>=20 → x<10 (False); x<20 → x>=10
    out = _vals(
        spark,
        between_halfopen(F.col("x"), F.lit(20.0), F.lit(10.0)),
        rows,
        "x double",
    )
    assert out == [False, True, True, False, False]


def test_csv_week_is_doy_div_7(spark):
    rows = [("2024-01-06",), ("2024-01-07",), ("2024-12-31",)]
    df = spark.createDataFrame(rows, "d string")
    out = [
        r[0]
        for r in df.select(csv_week(F.col("d").cast("timestamp"))).collect()
    ]
    # doy 6→0, 7→1, 366→52 (2024 is a leap year)
    assert out == [0, 1, 52]


def test_csv_like_case_insensitive_anchored(spark):
    rows = [("FooBar",), ("xfoobarx",), ("foo",)]
    out = _vals(spark, csv_like(F.col("s"), "foo%"), rows, "s string")
    assert out == [True, False, True]
    out = _vals(spark, csv_like(F.col("s"), "%oo_ar%"), rows, "s string")
    assert out == [True, True, False]


def test_csv_div_truncates_and_null_on_zero(spark):
    rows = [(7, 2), (9, 3), (5, 0)]
    out = _vals(
        spark,
        csv_div(F.col("a").cast("double"), F.col("b"), int_result=True),
        rows,
        "a long, b long",
    )
    assert out == [3, 3, None]


def test_null_eq(spark):
    rows = [(None, None), (1, None), (1, 1)]
    out = _vals(spark, null_eq(F.col("a"), F.col("b")), rows, "a int, b int")
    assert out == [True, False, True]


def test_encrypt_decrypt_roundtrip(spark):
    df = spark.createDataFrame([("secret stuff",), ("x",)], "s string")
    out = df.select(
        decrypt(encrypt(F.col("s"), "pw"), "pw").alias("rt"),
        decrypt(encrypt(F.col("s"), "pw", deterministic=True), "pw").alias("rt2"),
    ).collect()
    assert [r.rt for r in out] == ["secret stuff", "x"]
    assert [r.rt2 for r in out] == ["secret stuff", "x"]


def test_stddev_formula_matches_builtin(spark):
    # The harness derives stddev from exact integer sums; confirm it agrees
    # with Spark's stddev_samp to float tolerance.
    df = spark.range(1, 1000).select((F.col("id") * 1.37).alias("x"))
    a = df.agg(F.stddev_samp("x")).first()[0]
    from csvtool_spark.queries import cents

    c = cents(F.col("x"))
    n = F.count(F.lit(1)).cast("double")
    s = F.sum(c).cast("double")
    ss = F.sum(c * c).cast("double")
    b = df.agg(F.sqrt((ss - s * s / n) / (n - F.lit(1.0))) / F.lit(100.0)).first()[0]
    assert abs(a - b) / a < 1e-4
