"""Ad-hoc A/B experiment: does a keyed fan-out repartition after the
single-row-group scans beat the serial map-side stage? (not part of the suite)"""
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from csvtool_spark.operators import similarity, textstats
from csvtool_spark.queries import cents, load
from csvtool_spark.session import get_spark

sf_dir = "/root/testdata/sf0.1"
spark = get_spark("exp_fanout")
PAR = spark.sparkContext.defaultParallelism


def noop(df):
    df.write.mode("overwrite").format("noop").save()


def timeit(fn):
    t0 = time.perf_counter()
    noop(fn())
    return time.perf_counter() - t0


def ab(name, base_fn, opt_fn, reps=5):
    base, opt = [], []
    for _ in range(reps):
        base.append(timeit(base_fn))
        opt.append(timeit(opt_fn))
    print(
        f"{name:28s} base {statistics.median(base):6.3f} "
        f"(min {min(base):6.3f})  opt {statistics.median(opt):6.3f} "
        f"(min {min(opt):6.3f})  ratio {statistics.median(opt)/statistics.median(base):5.2f}"
    )


# warm everything
for t in ["lineitem", "orders", "customer", "supplier", "nation", "region",
          "documents", "embeddings", "events"]:
    noop(load(spark, sf_dir, t))

# cost of the .rdd guard probe
t0 = time.perf_counter()
for _ in range(10):
    n = load(spark, sf_dir, "lineitem").rdd.getNumPartitions()
print(f"rdd.getNumPartitions probe: {(time.perf_counter()-t0)/10*1000:.1f} ms each (n={n})")


def q1(fan):
    l = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1999-09-02").cast("timestamp")
    )
    if fan:
        l = l.repartition(PAR, "l_orderkey")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc * (1 + F.col("l_tax"))
    n = F.count(F.lit(1))
    return l.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(cents(F.col("l_quantity"))).alias("sum_qty_c"),
        F.sum(cents(F.col("l_extendedprice"))).alias("sum_base_c"),
        F.sum(cents(disc)).alias("sum_disc_c"),
        F.sum(cents(charge)).alias("sum_charge_c"),
        (F.sum(cents(F.col("l_quantity"))).cast("double") / n.cast("double") / F.lit(100.0)).alias("avg_qty"),
        (F.sum(cents(F.col("l_extendedprice"))).cast("double") / n.cast("double") / F.lit(100.0)).alias("avg_price"),
        n.cast("double").alias("count_order"),
    )


def q5(fan):
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    l = load(spark, sf_dir, "lineitem")
    if fan:
        l = l.repartition(PAR, "l_orderkey")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(cents(rev)).alias("revenue_c"))
    )


def langid(fan):
    d = load(spark, sf_dir, "documents")
    if fan:
        d = d.repartition(PAR, "doc_id")
    return d.select("doc_id", "lang", textstats.lang_id(F.col("text")).alias("lang_guess"))


def quality(fan):
    d = load(spark, sf_dir, "documents")
    if fan:
        d = d.repartition(PAR, "doc_id")
    return d.select("doc_id", textstats.quality_score(F.col("text")).alias("quality"))


def ann(fan):
    e = load(spark, sf_dir, "embeddings")
    qvec = [float(x) for x in e.filter(F.col("vec_id") == 0).first()["embedding"]]
    if fan:
        e = e.repartition(PAR, "vec_id")
    return similarity.ann_bruteforce(e, "embedding", "vec_id", qvec, k=10)


def having(fan):
    l = load(spark, sf_dir, "lineitem")
    if fan:
        l = l.repartition(PAR, "l_orderkey")
    return (
        l.groupBy("l_suppkey")
        .agg(
            F.count(F.lit(1)).cast("double").alias("cnt"),
            F.sum(cents(F.col("l_extendedprice"))).alias("rev_c"),
        )
        .filter(F.col("cnt") > 620)
    )


ab("q1", lambda: q1(False), lambda: q1(True))
ab("q5", lambda: q5(False), lambda: q5(True))
ab("langid", lambda: langid(False), lambda: langid(True))
ab("quality", lambda: quality(False), lambda: quality(True))
ab("ann_bruteforce", lambda: ann(False), lambda: ann(True))
ab("having", lambda: having(False), lambda: having(True))
