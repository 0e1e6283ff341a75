"""Ad-hoc stage profiler for the bench long poles (not part of the suite)."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from csvtool_spark.session import get_spark
from csvtool_spark.queries import load
from csvtool_spark.operators import dedup, textstats

sf_dir = "/root/testdata/sf0.1"
spark = get_spark("profile")

def t(name, df):
    t0 = time.perf_counter()
    df.write.mode("overwrite").format("noop").save()
    print(f"{name:40s} {time.perf_counter()-t0:6.3f}s")

d = load(spark, sf_dir, "documents")
t("warmup scan", d)
t("scan only", d)

toks = textstats.tokens(dedup.normalized(F.col("text")))
staged = d.select(F.col("doc_id"), toks.alias("__toks")).select(
    "doc_id", "__toks", dedup.hashed_shingles(F.col("__toks"), 3).alias("__shingles"))
t("tokens+shingles", staged)

sigs = staged.select("doc_id", dedup.minhash_signature(F.col("__shingles"), 32).alias("__sig"))
t("minhash sigs 32", sigs)

banded = dedup._banded(sigs, "doc_id", "__sig", 8, 4)
t("banded", banded)

pairs = dedup.candidate_pairs(banded, "doc_id")
t("candidate pairs", pairs)

full = dedup.near_dup_pairs_minhash(d, "text", "doc_id", threshold=0.4, n_hashes=32, bands=8)
t("full minhash pipeline", full)
t("full minhash pipeline (2nd)", full)

# langid pieces
t("langid full", d.select("doc_id", "lang", textstats.lang_id(F.col("text")).alias("g")))
cjk = F.length(F.regexp_replace(F.col("text"), "[^一-鿿]", ""))
t("cjk regex only", d.select("doc_id", cjk.alias("c")))
t("exact dedup", dedup.exact_dedup(d, "text", "doc_id"))
