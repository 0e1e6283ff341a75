"""Corpus curation pipeline — the operators composed the way an LLM
training-data job actually runs them:

    score → filter (quality, language) → exact dedup → near-dedup → emit

One declarative plan end-to-end: Catalyst fuses the scoring/filter stages
into the scan, the two dedup stages are hash/LSH joins, and nothing
materializes until the sink. At 100 TB each stage is shuffle-bounded by
its own key (text hash, band key) — no stage is all-pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from csvtool_spark.operators import dedup, textstats


def curate(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_quality: float = 0.5,
    languages: tuple[str, ...] = ("en",),
    near_dup_threshold: float | None = 0.6,
) -> DataFrame:
    """Return the curated corpus: one surviving row per kept document with
    its quality/language annotations.

    Stages:
    1. annotate: quality score, language guess, token count (pure scan);
    2. filter: quality ≥ min_quality AND language ∈ languages;
    3. exact dedup: keep the min-id representative per normalized text;
    4. near dedup (optional): drop the higher-id member of every
       MinHash-verified near-duplicate pair.
    """
    t = F.col(text_col)
    annotated = df.select(
        F.col(id_col),
        t.alias(text_col),
        textstats.quality_score(t).alias("quality"),
        textstats.lang_id(t).alias("lang_guess"),
        textstats.token_count(t).alias("n_tokens"),
    )
    kept = annotated.filter(
        (F.col("quality") >= min_quality) & F.col("lang_guess").isin(*languages)
    )

    # exact dedup: min-id survivor per hash
    survivors = (
        kept.select(F.col(id_col), F.md5(dedup.normalized(F.col(text_col))).alias("__h"))
        .groupBy("__h")
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )
    kept = kept.join(survivors, id_col)

    if near_dup_threshold is not None:
        pairs = dedup.near_dup_pairs_minhash(
            kept, text_col, id_col, threshold=near_dup_threshold
        )
        losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
        kept = kept.join(losers, id_col, "left_anti")

    return kept


def curation_report(df: DataFrame, curated: DataFrame, id_col: str = "doc_id") -> dict:
    """Driver-side summary: kept/dropped counts (two jobs, small results)."""
    total = df.count()
    kept = curated.count()
    return {"total": total, "kept": kept, "dropped": total - kept}
