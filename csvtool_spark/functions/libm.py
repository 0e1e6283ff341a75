"""glibc-exact transcendental kernels for oracle-paired per-row math.

Why this exists: Spark evaluates ``F.log`` with JVM ``Math.log``, which
HotSpot may run as interpreted fdlibm (StrictMath) OR as the C2 x86
intrinsic depending on JIT warmup — the SAME query can round a
half-grid-adjacent value differently run-to-run.  DuckDB's ``ln`` and
Python's ``math.log`` both call the platform libm (glibc on this stack),
so a priority/score that must hash-match a DuckDB oracle has to compute
its logs through libm, never through the JVM.  Bounded model grids do
this driver-side (``classify._logp_fixed``, BM25 ``idf6``); per-row
coins can't — these Arrow-batched kernels are the per-row equivalent.

``math.log`` is applied elementwise (NOT ``np.log``: numpy routes
float64 through its own SIMD implementations on some builds, which is
deterministic but not ulp-identical to libm).  The inputs here are
md5-derived 32-bit coins, so each batch is one int64 array in, one
float64 array out — the Python loop costs ~1M rows/s/core, comparable
to the md5 that produced the coin and far from the operators' shuffle
costs.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import Column
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType

#: md5-prefix coins are 32-bit: u = (m + offset) / 2^32.
_COIN_DEN = 4294967296.0


def ln_coin(m: Column, offset: float) -> Column:
    """``ln((m + offset) / 2^32)`` through glibc libm, elementwise.

    ``m`` is an int64 md5-prefix coin in [0, 2^32).  The division is the
    same IEEE double op Spark/DuckDB perform, so the only thing this
    kernel changes vs ``F.log`` is WHICH log implementation runs.
    """

    @pandas_udf(DoubleType())
    def _k(s: pd.Series) -> pd.Series:
        return pd.Series(
            [
                None if v is None else math.log((float(v) + offset) / _COIN_DEN)
                for v in s
            ],
            dtype="float64",
        )

    return _k(m)


def gumbel_coin(m: Column, offset: float = 0.5) -> Column:
    """Standard Gumbel noise ``-ln(-ln((m + offset) / 2^32))`` through
    glibc libm — the Gumbel-top-k coin, oracle-exact on any run."""

    @pandas_udf(DoubleType())
    def _k(s: pd.Series) -> pd.Series:
        return pd.Series(
            [
                None
                if v is None
                else -math.log(-math.log((float(v) + offset) / _COIN_DEN))
                for v in s
            ],
            dtype="float64",
        )

    return _k(m)
