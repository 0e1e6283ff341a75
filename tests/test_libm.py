"""The glibc-libm kernels (functions/libm.py) must be bit-identical to
DuckDB's ln on the md5-coin domain — that identity is what makes the
priority_sample / DSIR-Gumbel ORACLE LANE (coin_lane='libm') run-stable
by construction.  (Causal record: the round-4/5 NB gate failures that
motivated these kernels were a HUGEINT type leak, not libm — the
kernels stay as oracle-lane hardening; the operators default to the
vectorized JVM lane.)"""

from __future__ import annotations

import math
import random
import struct

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from csvtool_spark.functions.libm import gumbel_coin, ln_coin

_DEN = 4294967296.0


def _bits(x: float) -> int:
    return struct.unpack("<q", struct.pack("<d", x))[0]


@pytest.mark.parametrize("seed", [0, 1])
def test_ln_coin_bit_identical_to_duckdb(spark, seed):
    rng = random.Random(seed)
    ms = [rng.randrange(0, 2**32) for _ in range(5000)] + [0, 1, 2**32 - 1]
    sdf = spark.createDataFrame([(m,) for m in ms], "m long")
    got = {
        r["m"]: (r["lnu"], r["g"])
        for r in sdf.select(
            "m",
            ln_coin(F.col("m"), 1.0).alias("lnu"),
            gumbel_coin(F.col("m"), 0.5).alias("g"),
        ).collect()
    }
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"m": ms}))
    want = {
        int(m): (lnu, g)
        for m, lnu, g in con.execute(
            "SELECT m, ln((m + 1) / 4294967296.0),"
            " -ln(-ln((m + 0.5) / 4294967296.0)) FROM t"
        ).fetchall()
    }
    for m in ms:
        assert _bits(got[m][0]) == _bits(want[m][0]), m
        assert _bits(got[m][1]) == _bits(want[m][1]), m
    # and both equal Python math.log directly (same libm)
    for m in ms[:100]:
        assert _bits(got[m][0]) == _bits(math.log((m + 1) / _DEN))


def test_ln_coin_null_passthrough(spark):
    sdf = spark.createDataFrame([(1,), (None,)], "m long")
    rows = sdf.select(ln_coin(F.col("m"), 1.0).alias("l")).collect()
    assert rows[0]["l"] is not None and rows[1]["l"] is None


def test_jvm_log_agrees_within_two_ulps(spark):
    """Sanity bound: Math.log and glibc log are EACH only 1-ulp-accurate,
    so the lanes can legitimately differ by up to 2 ulps — if this fails
    the coin domain changed."""
    ms = list(range(1, 20000, 7))
    sdf = spark.createDataFrame([(m,) for m in ms], "m long")
    rows = sdf.select(
        ln_coin(F.col("m"), 1.0).alias("libm"),
        F.log((F.col("m") + F.lit(1)) / F.lit(_DEN)).alias("jvm"),
    ).collect()
    for r in rows:
        assert abs(_bits(r["libm"]) - _bits(r["jvm"])) <= 2


def test_gumbel_coin_null_passthrough(spark):
    sdf = spark.createDataFrame([(7,), (None,)], "m long")
    rows = sdf.select(gumbel_coin(F.col("m"), 0.5).alias("g")).collect()
    assert rows[0]["g"] is not None and rows[1]["g"] is None
