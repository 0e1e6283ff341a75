"""Ad-hoc (round 14): decompose the curate/report cluster — where does
each query's warm time actually go? Components timed via the noop sink,
median of 5 warm reps after one cold pass. Not part of the suite."""
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from csvtool_spark.queries import load
from csvtool_spark.session import get_spark

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
spark = get_spark("exp_fuse")


def noop(df):
    df.write.mode("overwrite").format("noop").save()


def t(label, make):
    df = make()
    spark.sparkContext.setJobDescription(f"fuse: {label}")
    noop(df)  # cold
    xs = []
    for _ in range(5):
        t0 = time.perf_counter()
        noop(df)
        xs.append(time.perf_counter() - t0)
    spark.sparkContext.setJobDescription(None)
    print(f"{label:48s} med {statistics.median(xs):7.3f} min {min(xs):7.3f}", flush=True)


d = load(spark, sf_dir, "documents")
noop(d)

# --- q_pii_scrub components ------------------------------------------------
from csvtool_spark.operators.redact import (
    STRICT_PATTERNS,
    pii_counts,
    redact_documents,
    redact_pii,
)

t("scan text only", lambda: d.select("doc_id", "text"))
t("pii: counts only (4 extract + 3 replace)", lambda: d.select(
    "doc_id", *[c.alias(f"n_{n}") for n, c in
                pii_counts(F.col("text"), STRICT_PATTERNS).items()]))
t("pii: redact only (4 replace)", lambda: d.select(
    "doc_id", redact_pii(F.col("text"), STRICT_PATTERNS).alias("r")))
t("pii: counts + redact (CSE probe)", lambda: d.select(
    "doc_id", redact_pii(F.col("text"), STRICT_PATTERNS).alias("r"),
    *[c.alias(f"n_{n}") for n, c in
      pii_counts(F.col("text"), STRICT_PATTERNS).items()]))
t("pii: full redact_documents", lambda: redact_documents(
    d, "text", "doc_id"))

# --- q_dataset_report components -------------------------------------------
from csvtool_spark.operators import pipeline
from csvtool_spark.operators.dedup import normalized
from csvtool_spark.operators.textstats import tokens

t("report: full dataset_report", lambda: pipeline.dataset_report(d))
t("report: agg WITHOUT pii", lambda: d.agg(
    F.count(F.lit(1)), F.sum(F.size(tokens(normalized(F.col("text"))))),
    F.count_distinct("source"), F.count_distinct("lang"),
    F.sum("n_chars"),
    F.count_distinct(F.md5(normalized(F.col("text"))))))
counts = pii_counts(F.col("text"), STRICT_PATTERNS)
n_pii = None
for name, _, _ in STRICT_PATTERNS:
    n_pii = counts[name] if n_pii is None else n_pii + counts[name]
t("report: pii sum agg only", lambda: d.agg(
    F.sum(F.when(n_pii > 0, 1).otherwise(0))))
t("report: count_distincts only", lambda: d.agg(
    F.count_distinct("source"), F.count_distinct("lang"),
    F.count_distinct(F.md5(normalized(F.col("text"))))))
t("report: tokens sum only", lambda: d.agg(
    F.sum(F.size(tokens(normalized(F.col("text")))))))

# --- curate chain prefixes (dialect + python) -------------------------------
from csvtool_spark.operators.textstats import lang_id, quality_score

t("curate: langid jvm", lambda: d.select(
    "doc_id", lang_id(F.col("text"), kernel="jvm").alias("lg")))
t("curate: langid arrow", lambda: d.select(
    "doc_id", lang_id(F.col("text"), kernel="arrow").alias("lg")))
t("curate: quality only", lambda: d.select(
    "doc_id", quality_score(F.col("text")).alias("q")))
t("curate: q_pipeline_curate", lambda: pipeline.curate(
    load(spark, sf_dir, "documents"), min_quality=0.5, languages=("en",),
    near_dup_threshold=None).select("doc_id", "quality"))

from csvtool_spark.dialect_queries import _engine


def dialect_curate():
    eng = _engine(spark, sf_dir)
    return eng.sql(
        "select doc_id, lang, text from documents "
        "|> langid(text) |> quality(text, min=0.45) "
        "|> dedup(text, id=doc_id) |> hash_sample(0.8, key=doc_id)"
    )


def dialect_prefix(n):
    stages = [
        "|> langid(text) ", "|> quality(text, min=0.45) ",
        "|> dedup(text, id=doc_id) ", "|> hash_sample(0.8, key=doc_id)",
    ]
    eng = _engine(spark, sf_dir)
    return eng.sql(
        "select doc_id, lang, text from documents " + "".join(stages[:n])
    )


t("dialect curate: select only", lambda: dialect_prefix(0))
t("dialect curate: +langid", lambda: dialect_prefix(1))
t("dialect curate: +quality", lambda: dialect_prefix(2))
t("dialect curate: +dedup", lambda: dialect_prefix(3))
t("dialect curate: full", lambda: dialect_prefix(4))
