"""Semi-structured (JSON) column handling.

Event logs and crawl metadata ship JSON payload columns (the testdata
``events.props`` is one). Two extraction shapes, both pure JVM expressions:

- ``json_field``: point extraction via ``get_json_object`` — one JSON path,
  cast to a scalar. Right when a query touches one or two fields; the
  parse is re-done per path, so for wide extraction prefer:
- ``parse_json_col``: ``from_json`` with an explicit schema — parses once
  into a struct column, every field then a free struct access. The schema
  is declared, not discovered: a 100 TB scan must not pay a sampling pass,
  and silent drift is caught by the nullability of missing fields.

No Python UDFs — both compile to Catalyst JSON expressions inside
whole-stage codegen, and the parquet scan still prunes to the JSON column
plus whatever else the query names.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def json_field(col: Column, path: str, dtype: str = "string") -> Column:
    """Extract one JSON path (e.g. ``$.k``) and cast it. Malformed JSON or
    a missing key yields null — a 100 TB scan must not die on one bad
    payload. (DuckDB is stricter: ``->>`` ERRORS on malformed JSON, so
    cross-engine oracles guard with ``json_valid`` to match this
    null-on-bad behavior.)"""
    return F.get_json_object(col, path).cast(dtype)


def parse_json_col(
    df: DataFrame, col: str, schema: T.StructType | str, keep_corrupt: bool = False
) -> DataFrame:
    """Parse a JSON string column into a typed struct ``<col>_parsed``.

    With ``keep_corrupt`` the raw string of unparseable rows is preserved
    in ``<col>_corrupt`` for quarantine sinks — at scale you route those to
    a dead-letter table rather than dropping silently. (PERMISSIVE
    ``from_json`` yields a struct of nulls, not a null struct, on bad
    input, so corruption is captured via ``columnNameOfCorruptRecord`` —
    the parser fills that field with the raw string only when the parse
    failed; a null input stays null everywhere, absent data not corruption.)
    """
    if not keep_corrupt:
        return df.withColumn(f"{col}_parsed", F.from_json(F.col(col), schema))
    st = T.StructType.fromDDL(schema) if isinstance(schema, str) else schema
    # The corrupt-record field name must not collide with payload keys: a
    # valid JSON object containing that key would populate the field and
    # misroute the row to quarantine. No name is collision-proof against
    # arbitrary payloads, so pick an implausible one and refuse schemas
    # that shadow it.
    corrupt = f"__{col}_corrupt_rec__"
    if corrupt in st.fieldNames():
        raise ValueError(f"schema field name {corrupt!r} is reserved")
    widened = T.StructType(list(st.fields) + [T.StructField(corrupt, T.StringType())])
    parsed = F.from_json(
        F.col(col), widened, {"columnNameOfCorruptRecord": corrupt}
    )
    return (
        df.withColumn("__p", parsed)
        .withColumn(
            f"{col}_parsed",
            # the struct rebuild (dropping the corrupt field) must not turn
            # a NULL input into a non-null all-null struct — the
            # keep_corrupt=False path and the docstring both promise a null
            # input stays null everywhere
            F.when(
                F.col(col).isNotNull(),
                F.struct(*[F.col("__p")[f.name].alias(f.name) for f in st.fields]),
            ),
        )
        .withColumn(f"{col}_corrupt", F.col("__p")[corrupt])
        .drop("__p")
    )


def props_stats(df: DataFrame, json_col: str, path: str, group_col: str) -> DataFrame:
    """Grouped stats over one numeric JSON field — the smoke-test shape for
    JSON ingestion (min/max/sum/cardinality of ``path`` per group)."""
    k = json_field(F.col(json_col), path, "long")
    return (
        df.select(F.col(group_col), k.alias("__k"))
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.min("__k").alias("k_min"),
            F.max("__k").alias("k_max"),
            F.sum("__k").cast("long").alias("k_sum"),
            F.count_distinct(F.col("__k")).cast("long").alias("k_card"),
        )
    )
