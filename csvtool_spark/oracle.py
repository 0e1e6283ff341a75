"""Cross-engine comparison helpers (Spark result vs DuckDB oracle).

Used by tools/check_correctness.py and the pytest suite. Comparison is
order-insensitive over rows, name-sorted over columns, and EXACT on values
(including doubles): the query catalog is engineered for bit-identical
results across engines, so any drift is a bug.
"""

from __future__ import annotations

import math
from datetime import date, datetime

import duckdb
import pyarrow as pa

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def norm_cell(v) -> str:
    if v is None:
        return "∅"
    if isinstance(v, float):
        return "nan" if math.isnan(v) else repr(v)
    if isinstance(v, datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, date):
        return v.strftime("%Y-%m-%d 00:00:00.000000")
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def normalize(rows, cols) -> list[str]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(norm_cell(r[i]) for i in order) for r in rows)


def _type_match(spark_type: str, at: pa.DataType) -> bool:
    """True iff the DuckDB/Arrow result type is the one Spark emits.

    EXACT on numeric width and on decimal-vs-integer: the driver's value
    hash is type-sensitive, so ``decimal128(38,0)`` vs ``int64`` is a real
    failure even when every value is equal (the round-4/5 ``q_nb_classify``
    HUGEINT leak this check exists to catch).  Lenient only where the
    engines genuinely share a value space: string/large_string,
    timestamp units (the comparator formats to µs), date32/date64.
    """
    s = spark_type.strip().lower()
    if s == "bigint":
        return pa.types.is_int64(at)
    if s == "int":
        return pa.types.is_int32(at)
    if s == "smallint":
        return pa.types.is_int16(at)
    if s == "tinyint":
        return pa.types.is_int8(at)
    if s == "double":
        return pa.types.is_float64(at)
    if s == "float":
        return pa.types.is_float32(at)
    if s == "string":
        return pa.types.is_string(at) or pa.types.is_large_string(at)
    if s == "boolean":
        return pa.types.is_boolean(at)
    if s == "date":
        return pa.types.is_date(at)
    if s.startswith("timestamp"):
        return pa.types.is_timestamp(at)
    if s == "binary":
        return pa.types.is_binary(at) or pa.types.is_large_binary(at)
    if s.startswith("array<") and s.endswith(">"):
        return (
            pa.types.is_list(at) or pa.types.is_large_list(at)
        ) and _type_match(s[6:-1], at.value_type)
    if s.startswith("decimal(") and s.endswith(")"):
        if not pa.types.is_decimal(at):
            return False
        p, sc = (int(x) for x in s[8:-1].split(","))
        return at.precision == p and at.scale == sc
    return False  # unknown pairing → fail loudly, extend deliberately


def dtype_error(sdf, schema: pa.Schema) -> str | None:
    """Per-column Spark-vs-DuckDB result-type comparison (None = match)."""
    stypes = dict(sdf.dtypes)
    bad = [
        f"{f.name}: spark={stypes[f.name]} duckdb={f.type}"
        for f in schema
        if f.name in stypes and not _type_match(stypes[f.name], f.type)
    ]
    return "; ".join(bad) or None


def compare(sdf, con: duckdb.DuckDBPyConnection, sql: str) -> str | None:
    """Return None on match, else a human-readable mismatch description.

    Checks, in order: row count, column names, column TYPES (the Arrow
    schema of the DuckDB result vs ``sdf.dtypes`` — a type-sensitive
    driver hash fails on e.g. HUGEINT-leaked decimal128 sums even when
    stringified values agree), then exact values.
    """
    srows = [tuple(r) for r in sdf.collect()]
    scols = sdf.columns
    tbl = con.execute(sql).fetch_arrow_table()
    dcols = tbl.column_names
    drows = [tuple(d[c] for c in dcols) for d in tbl.to_pylist()]
    if len(srows) != len(drows):
        return f"rowcount spark={len(srows)} duckdb={len(drows)}"
    if sorted(scols) != sorted(dcols):
        return f"columns spark={sorted(scols)} duckdb={sorted(dcols)}"
    terr = dtype_error(sdf, tbl.schema)
    if terr:
        return f"dtype mismatch: {terr}"
    sn, dn = normalize(srows, scols), normalize(drows, dcols)
    if sn != dn:
        diff = [(a, b) for a, b in zip(sn, dn) if a != b][:3]
        return f"value mismatch; first diffs: {diff}"
    return None
