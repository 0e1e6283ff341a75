"""Benchmark decontamination: flag training documents whose k-gram shingles
overlap an evaluation/benchmark document set.

This is the standard eval-decontamination step of an LLM training pipeline
(GPT-3 appendix C and PaLM both filter training text on 8-13-gram collisions
with their eval suites); the reference engine has no equivalent — this is a
beyond-reference scale operator like the dedup family in
``csvtool_spark.operators.dedup``.

Spark-first shape, sized for a 100 TB corpus vs a small benchmark:

- The *benchmark* shingle set is tiny relative to training data (eval suites
  are at most ~10^5 documents), so its distinct shingles **broadcast**.
- The *corpus* side explodes its per-document distinct shingles and probes
  the broadcast hash table — the 100 TB side is never shuffled, and the
  per-document re-aggregation groups on ``id`` which Catalyst satisfies with
  a partial/final hash aggregate over the already-exploded rows.
- Nothing is quadratic and no full-corpus sort exists anywhere in the plan.

For a benchmark too big to broadcast, drop the hint: the same plan becomes a
shuffled hash join on the shingle key, still linear.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from csvtool_spark.operators.dedup import normalized, word_shingles
from csvtool_spark.operators.textstats import tokens


def shingle_set(df: DataFrame, text_col: str, id_col: str, k: int = 5) -> DataFrame:
    """(id, shingle) rows: distinct k-word shingles of normalized text.
    Documents shorter than k words contribute their whole text as one
    shingle (same guard as ``dedup.word_shingles``)."""
    toks = tokens(normalized(F.col(text_col)))
    return df.select(
        F.col(id_col), F.explode(word_shingles(toks, k)).alias("shingle")
    )


def contamination_report(
    corpus: DataFrame,
    bench: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 5,
    broadcast_bench: bool = True,
) -> DataFrame:
    """Per contaminated corpus document: distinct-shingle count, number of
    shingles also present in the benchmark set, and the contaminated
    fraction. Documents with zero overlap are dropped (the clean 99.9% of a
    real corpus never leaves the executors)."""
    bench_sh = shingle_set(bench, text_col, id_col, k).select("shingle").distinct()
    if broadcast_bench:
        bench_sh = F.broadcast(bench_sh)
    toks = tokens(normalized(F.col(text_col)))
    corp = corpus.select(
        F.col(id_col),
        F.size(word_shingles(toks, k)).cast("long").alias("n_shingles"),
        F.explode(word_shingles(toks, k)).alias("shingle"),
    )
    hits = (
        corp.join(bench_sh, "shingle")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_contaminated"),
            F.first("n_shingles").alias("n_shingles"),
        )
    )
    return hits.select(
        id_col,
        "n_shingles",
        "n_contaminated",
        F.round(
            F.col("n_contaminated").cast("double") / F.col("n_shingles").cast("double"),
            6,
        ).alias("contaminated_frac"),
    )
