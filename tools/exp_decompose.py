"""Ad-hoc decomposition of where headline-query wall time goes (not part of
the suite). Run on an idle box."""
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from csvtool_spark.queries import load
from csvtool_spark.session import get_spark

sf_dir = "/root/testdata/sf0.1"
spark = get_spark("exp_decompose")


def noop(df):
    df.write.mode("overwrite").format("noop").save()


def t(name, fn, reps=5):
    xs = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        xs.append(time.perf_counter() - t0)
    print(f"{name:44s} med {statistics.median(xs):6.3f}  min {min(xs):6.3f}")


from csvtool_spark import queries as catalog

pool = {**catalog.SHADOW_QUERIES, **catalog.QUERIES}

# warm
for tab in ["lineitem", "orders", "customer", "supplier", "nation", "region",
            "documents", "embeddings", "events"]:
    noop(load(spark, sf_dir, tab))

t("trivial job (range(1))", lambda: noop(spark.range(1)))
t("range(1e6) 32 parts", lambda: noop(spark.range(1_000_000)))
t("scan lineitem (7 cols)", lambda: noop(load(spark, sf_dir, "lineitem").select(
    "l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
    "l_discount", "l_tax", "l_shipdate")))
t("scan lineitem (1 col)", lambda: noop(load(spark, sf_dir, "lineitem").select("l_quantity")))
t("scan orders", lambda: noop(load(spark, sf_dir, "orders")))
t("scan documents", lambda: noop(load(spark, sf_dir, "documents")))
t("scan events", lambda: noop(load(spark, sf_dir, "events")))

# build-only cost (no action): DataFrame construction + analysis
for name in ["q1_pricing_summary", "q3_shipping_priority", "q5_local_suppliers",
             "q_dedup_minhash", "q_text_langid", "q_sessionize"]:
    t(f"build-only {name}", lambda n=name: pool[n](spark, sf_dir))

# q1 pieces
def q1_scan_filter():
    noop(load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1999-09-02").cast("timestamp")
    ).select("l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
             "l_discount", "l_tax"))

t("q1 scan+filter only", q1_scan_filter)
t("q1 full", lambda: noop(pool["q1_pricing_summary"](spark, sf_dir)))

# q5 pieces: the lineitem->orders join only, then full
def q5_join1():
    l = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    noop(l.join(o, l.l_orderkey == o.o_orderkey).select("l_extendedprice", "o_custkey"))

t("q5 l JOIN o only", q5_join1)
t("q5 full", lambda: noop(pool["q5_local_suppliers"](spark, sf_dir)))
t("q3 full", lambda: noop(pool["q3_shipping_priority"](spark, sf_dir)))

# events / sessionize
t("sessionize full", lambda: noop(pool["q_sessionize"](spark, sf_dir)))
t("events_window full", lambda: noop(pool["q_events_window"](spark, sf_dir)))
