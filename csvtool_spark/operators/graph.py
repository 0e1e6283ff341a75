"""Iterative graph algorithms on DataFrames: deterministic PageRank.

Link-quality ranking is a standard corpus-curation signal (quality-weighted
sampling of crawled pages). The reference has no graph surface — this is a
beyond-reference scale operator exercising Spark's iterative-computation
pattern: a driver-side loop over a fixed number of joins, with
``localCheckpoint`` truncating the lineage each round so the plan doesn't
grow (and re-execute) quadratically with iterations.

Determinism: ranks are exact fixed-point BIGINTs. Each node starts at
``scale`` units; an edge ships ``rank div out_degree`` (integer division),
the damped update is ``base + (d_num * in_sum) div d_den`` — all integer,
so the result is independent of partitioning, summation order, and engine.
A DuckDB oracle unrolls the same iterations as chained CTEs and matches
bit-for-bit. Dangling-node mass (nodes with no out-edges) is dropped, the
common simplification; both implementations share it.

Scale: the per-iteration work is one equi-join edges⋈ranks (shuffle on the
edge source key, or broadcast when the rank table fits) plus a hash
aggregate on the destination key — the standard distributed PageRank shape.
Rank state is |nodes| rows, far smaller than |edges|; AQE picks the join
strategy. Overflow headroom: a node's ``in_sum`` is bounded by the total
mass |nodes|·scale, and the damped update multiplies it by ``d_num``, so
int64 holds while |nodes| < 2⁶³ / (d_num·scale) ≈ 1.08e8 nodes at the
defaults — drop ``scale`` to 1e6 for ~1e11 nodes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 1_000_000_000


def pagerank_int(
    edges: DataFrame,
    src_col: str,
    dst_col: str,
    iters: int = 5,
    scale: int = SCALE,
    d_num: int = 85,
    d_den: int = 100,
) -> DataFrame:
    """(node, rank) after ``iters`` damped power iterations, rank in
    fixed-point units of ``1/scale``. Multi-edges contribute multiply
    (weight = multiplicity)."""
    e = edges.select(F.col(src_col).alias("__src"), F.col(dst_col).alias("__dst"))
    nodes = (
        e.select(F.col("__src").alias("node"))
        .union(e.select(F.col("__dst").alias("node")))
        .distinct()
    )
    deg = e.groupBy("__src").agg(F.count(F.lit(1)).alias("__deg"))
    # edges+degree+nodes are reused every iteration — persist once.
    ed = e.join(deg, "__src").persist()
    nodes = nodes.persist()
    base = ((d_den - d_num) * scale) // d_den
    ranks = nodes.select("node", F.lit(scale).cast("long").alias("rank"))
    try:
        for _ in range(iters):
            contrib = ed.join(ranks, ed["__src"] == ranks["node"]).select(
                F.col("__dst").alias("node"),
                F.expr("rank div __deg").alias("__c"),
            )
            in_sum = contrib.groupBy("node").agg(F.sum("__c").alias("__in"))
            ranks = nodes.join(in_sum, "node", "left").select(
                "node",
                (
                    F.lit(base).cast("long")
                    + F.expr(f"({d_num} * coalesce(__in, 0L)) div {d_den}")
                ).alias("rank"),
            )
            # Truncate lineage: without this the logical plan doubles per
            # iteration and Catalyst re-optimizes (and could re-execute)
            # the whole history each round. Eager: materialized now, so the
            # finally-block unpersists can't force a recompute later.
            ranks = ranks.localCheckpoint(eager=True)
    finally:
        # The final ranks live in their own checkpoint blocks; the loop
        # inputs must not linger in executor storage for the session's
        # lifetime. (Superseded intermediate checkpoints are released by
        # the ContextCleaner once unreferenced.)
        ed.unpersist()
        nodes.unpersist()
    return ranks


def pagerank_oracle_sql(
    edges_sql: str,
    iters: int = 5,
    scale: int = SCALE,
    d_num: int = 85,
    d_den: int = 100,
) -> str:
    """DuckDB CTE chain computing the same integer PageRank from an edge
    subquery ``edges_sql`` that yields (src, dst) — bit-exact vs
    ``pagerank_int`` (integer sums are associative, ``//`` matches ``div``
    on the non-negative ranks involved)."""
    base = ((d_den - d_num) * scale) // d_den
    parts = [
        f"eg AS ({edges_sql})",
        "nodes AS (SELECT src AS node FROM eg UNION SELECT dst FROM eg)",
        "deg AS (SELECT src, count(*) AS deg FROM eg GROUP BY src)",
        f"r0 AS (SELECT node, CAST({scale} AS BIGINT) AS rank FROM nodes)",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"""r{i} AS (
      SELECT n.node,
             CAST({base} + ({d_num} * coalesce(s.in_sum, 0)) // {d_den} AS BIGINT)
               AS rank
      FROM nodes n LEFT JOIN (
        SELECT e.dst AS node, CAST(SUM(r.rank // d.deg) AS BIGINT) AS in_sum
        FROM eg e JOIN r{i - 1} r ON e.src = r.node JOIN deg d ON e.src = d.src
        GROUP BY e.dst
      ) s ON n.node = s.node
    )"""
        )
    return (
        "WITH " + ",\n    ".join(parts) + f"\n    SELECT node, rank FROM r{iters}"
    )
