"""glibc-libm transcendental kernels — the ORACLE-PAIRED lane for
per-row coins, not the default execution path.

Spark evaluates ``F.log`` with JVM ``Math.log`` (1-ulp-accurate;
HotSpot may run fdlibm interpreted or the C2 intrinsic), while DuckDB's
``ln`` and Python's ``math.log`` call the platform libm (glibc here).
A last-ulp difference could in principle flip a value sitting exactly
on a rounding-grid boundary, so cross-engine gates that hash-compare a
DuckDB oracle use these kernels; bounded model grids get the same
guarantee driver-side (``classify._logp_fixed``, BM25 ``idf6``).

Causal record (round-6 correction): the round-4/5 ``q_nb_classify``
gate failures that motivated wiring these kernels into the sampling
hot paths were NOT a libm divergence — the root cause was a DuckDB
HUGEINT/decimal128 type leak in the oracle SQL, and measured boundary
distances on the catalog coin grids are ~1e6 ulps (no real libm pair
differs by that much).  These kernels therefore remain as determinism
HARDENING for the oracle lane only; the operators' default lane is the
vectorized JVM ``F.log`` (``coin_lane='jvm'`` in ``priority_sample`` /
``dsir_sample``), which codegen fuses into the scan — per-element
Python ``math.log`` (~1M rows/s/core) is not a 100 TB hot path.

``math.log`` is applied elementwise (NOT ``np.log``: numpy routes
float64 through its own SIMD implementations on some builds, which is
deterministic but not ulp-identical to libm).  The inputs here are
md5-derived 32-bit coins, so each batch is one int64 array in, one
float64 array out.
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
        # pd.isna, not `is None`: Arrow hands int64-with-nulls to pandas as
        # float64 with NaN, so a None check would silently route nulls
        # through math.log(NaN) and rely on NaN→null coercion on the way out
        return pd.Series(
            [
                None if pd.isna(v) else math.log((float(v) + offset) / _COIN_DEN)
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
        # pd.isna for the same Arrow int64-with-nulls→float64/NaN reason
        # as ln_coin
        return pd.Series(
            [
                None
                if pd.isna(v)
                else -math.log(-math.log((float(v) + offset) / _COIN_DEN))
                for v in s
            ],
            dtype="float64",
        )

    return _k(m)
