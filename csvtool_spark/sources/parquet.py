"""Parquet table loading.

Spark cannot read parquet TIMESTAMP(NANOS) columns natively; the
runtime-settable legacy conf reads them as epoch-nanos longs, which we
convert to proper timestamps (truncated to micros — Spark's and DuckDB's
common precision) with pure integer arithmetic, JVM-side. Generated
testdata has shipped ``events.ts`` both as nanos and as micros across
rounds, so the conversion only fires when the column actually arrives as a
long (micros files read natively as TIMESTAMP_NTZ and pass through).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Columns stored as TIMESTAMP(NANOS) in the driver-generated testdata.
_NANOS_TS_COLS: dict[str, list[str]] = {"events": ["ts"]}


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table, normalizing nanos timestamps."""
    nanos_cols = _NANOS_TS_COLS.get(name, [])
    if nanos_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for c in nanos_cols:
        if isinstance(df.schema[c].dataType, T.LongType):
            # Integer division (not /1000.0): epoch-nanos exceed 2^53, double
            # arithmetic would corrupt the low digits.
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df
