"""Result-TYPE parity between Spark and the DuckDB oracles (round-6).

The driver's value hash is type-sensitive: a DuckDB ``sum()`` over
BIGINT silently widens to HUGEINT (decimal128 in Arrow), which
hash-mismatches Spark's int64 even when every value is equal — the
exact leak that kept ``q_nb_classify`` red in rounds 4-5 while the
string-normalizing local comparator stayed green.  ``oracle.compare``
now checks the DuckDB result's Arrow schema against ``sdf.dtypes``
(so every ``test_catalog_oracle`` row doubles as a type-parity check);
these tests pin the checker itself.
"""

from __future__ import annotations

import duckdb
import pyarrow as pa

from csvtool_spark.oracle import _type_match, compare, dtype_error


def test_uncast_hugeint_sum_fails_dtype_check(spark):
    """A deliberately uncast sum() oracle (HUGEINT → decimal128) must now
    fail compare() even though the VALUES stringify identically — this
    reproduces the driver's q_nb_classify failure locally."""
    sdf = spark.createDataFrame([(15,)], "s long")
    con = duckdb.connect()
    err = compare(sdf, con, "SELECT sum(x) AS s FROM (VALUES (7), (8)) t(x)")
    assert err is not None and "dtype mismatch" in err and "decimal" in err
    # the cast repairs it — same values, BIGINT edge
    assert compare(
        sdf, con,
        "SELECT CAST(sum(x) AS BIGINT) AS s FROM (VALUES (7), (8)) t(x)",
    ) is None


def test_int_width_mismatch_fails(spark):
    sdf = spark.createDataFrame([(1,)], "x long")
    con = duckdb.connect()
    err = compare(sdf, con, "SELECT CAST(1 AS INTEGER) AS x")
    assert err is not None and "dtype mismatch" in err


def test_matching_int32_passes(spark):
    sdf = spark.createDataFrame([(1,)], "x int")
    con = duckdb.connect()
    assert compare(sdf, con, "SELECT CAST(1 AS INTEGER) AS x") is None


def test_type_match_table():
    cases = [
        ("bigint", pa.int64(), True),
        ("bigint", pa.decimal128(38, 0), False),
        ("bigint", pa.int32(), False),
        ("int", pa.int32(), True),
        ("double", pa.float64(), True),
        ("double", pa.decimal128(18, 6), False),
        ("string", pa.string(), True),
        ("string", pa.large_string(), True),
        ("boolean", pa.bool_(), True),
        ("date", pa.date32(), True),
        ("timestamp", pa.timestamp("us"), True),
        ("timestamp", pa.timestamp("ns"), True),
        ("array<double>", pa.list_(pa.float64()), True),
        ("array<double>", pa.list_(pa.int64()), False),
        ("array<bigint>", pa.large_list(pa.int64()), True),
        ("decimal(38,0)", pa.decimal128(38, 0), True),
        ("decimal(38,0)", pa.decimal128(18, 0), False),
    ]
    for s, a, want in cases:
        assert _type_match(s, a) is want, (s, a)


def test_dtype_error_reports_all_columns(spark):
    sdf = spark.createDataFrame([(1, 2.0)], "a long, b double")
    schema = pa.schema([("a", pa.decimal128(38, 0)), ("b", pa.float64())])
    err = dtype_error(sdf, schema)
    assert err is not None and "a:" in err and "b:" not in err
