"""Ad-hoc (round 14): validate the compute-once gate restructure of
redact_documents — plan shape (regex battery evaluated once, filter NOT
pushed through the staging project), warm A/B vs the current form, and
exact row equality. Not part of the suite."""
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from csvtool_spark.operators import redact
from csvtool_spark.operators.dedup import normalized
from csvtool_spark.operators.textstats import tokens
from csvtool_spark.session import get_spark

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
spark = get_spark("exp_gate")
d = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))


def v0():
    return redact.redact_documents(d, "text", "doc_id", max_pii_fraction=0.2)


def v1():
    pats = redact.STRICT_PATTERNS
    counts = redact.pii_counts(F.col("text"), pats)
    n_pii = None
    for name, _, _ in pats:
        n_pii = counts[name] if n_pii is None else n_pii + counts[name]
    # text after the first 3 replaces — shared prefix of the count chain
    t3 = F.col("text")
    for _, pat, repl in pats[:-1]:
        t3 = F.regexp_replace(t3, pat, repl)
    n_toks = F.greatest(F.size(tokens(normalized(F.col("text")))), F.lit(1))
    staged = d.select(
        F.col("doc_id"),
        t3.alias("__t3"),
        n_pii.alias("__np"),
        n_toks.alias("__nt"),
        F.monotonically_increasing_id().alias("__nd"),
    )
    frac = F.round(F.col("__np").cast("double") / F.col("__nt").cast("double"), 6)
    gated = staged.filter((frac <= 0.2) & (F.col("__nd") >= 0))
    last = pats[-1]
    return gated.select(
        F.col("doc_id"),
        F.regexp_replace(F.col("__t3"), last[1], last[2]).alias("text"),
        F.col("__np").alias("n_pii"),
        frac.alias("pii_fraction"),
    )


def noop(df):
    df.write.mode("overwrite").format("noop").save()


for name, make in [("v0 current", v0), ("v1 gated", v1)]:
    df = make()
    ep = df._jdf.queryExecution().executedPlan().toString()
    print(name, "| extract_all:", ep.count("regexp_extract_all"),
          "| replace:", ep.count("regexp_replace"),
          "| split:", ep.count("split("))

a, b = v0(), v1()
print("schema equal:", a.schema == b.schema)
diff = a.exceptAll(b).count() + b.exceptAll(a).count()
print("row diff:", diff, "counts:", a.count(), b.count())

for name, make in [("v0 current", v0), ("v1 gated", v1), ("v0 again", v0), ("v1 again", v1)]:
    df = make()
    noop(df)
    xs = []
    for _ in range(5):
        t0 = time.perf_counter()
        noop(df)
        xs.append(time.perf_counter() - t0)
    print(f"{name:12s} med {statistics.median(xs):6.3f} min {min(xs):6.3f}")
