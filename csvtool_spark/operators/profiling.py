"""One-pass table profiling: per-column null counts, cardinality, min/max.

The standard "summarize" surface an analytics engine owes its users (the
reference has nothing like it — beyond-reference extension). One aggregate
job produces every metric; the per-column layout comes from a ``stack``
over the single result row, so the table is scanned exactly once.

Cardinality: the default is ``approx_count_distinct`` (HyperLogLog++,
mergeable, one pass, no extra shuffle) — the only sane choice at 100 TB.
``exact_distinct=True`` switches to exact ``count_distinct``, which makes
Catalyst plan an Expand (input multiplied by the number of distinct
aggregates) — fine for oracle comparisons and small tables, ruinous at
scale; the docstring is the warning label.

Min/max are emitted as strings so one uniform schema covers every column
type; the cast happens AFTER the typed aggregate, so numeric/date ordering
is the type's, not the string's.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    exact_distinct: bool = False,
) -> DataFrame:
    """(col_name, n_rows, n_nulls, n_distinct, min_str, max_str) per column."""
    cols = columns or df.columns
    aggs = [F.count(F.lit(1)).alias("__rows")]
    for c in cols:
        q = F.col(c)
        nd = F.count_distinct(q) if exact_distinct else F.approx_count_distinct(q)
        aggs += [
            F.count(q).alias(f"__nn_{c}"),
            nd.cast("long").alias(f"__nd_{c}"),
            F.min(q).cast("string").alias(f"__mn_{c}"),
            F.max(q).cast("string").alias(f"__mx_{c}"),
        ]
    row = df.agg(*aggs)
    stack = ", ".join(
        f"'{c}', `__nn_{c}`, `__nd_{c}`, `__mn_{c}`, `__mx_{c}`" for c in cols
    )
    return row.select(
        F.expr(
            f"stack({len(cols)}, {stack}) AS (col_name, n_nonnull, n_distinct, min_str, max_str)"
        ),
        F.col("__rows").alias("n_rows"),
    ).select(
        "col_name",
        "n_rows",
        (F.col("n_rows") - F.col("n_nonnull")).alias("n_nulls"),
        "n_distinct",
        "min_str",
        "max_str",
    )
