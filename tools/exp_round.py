"""Ad-hoc: is F.round(x,0) (BigDecimal path on doubles) the per-row cost of
the cents() aggregations? (not part of the suite)"""
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from csvtool_spark.queries import load
from csvtool_spark.session import get_spark

sf_dir = "/root/testdata/sf0.1"
spark = get_spark("exp_round")


def noop(df):
    df.write.mode("overwrite").format("noop").save()


def t(name, fn, reps=7):
    xs = []
    for _ in range(reps):
        t0 = time.perf_counter()
        noop(fn())
        xs.append(time.perf_counter() - t0)
    print(f"{name:40s} med {statistics.median(xs):6.3f}  min {min(xs):6.3f}")


noop(load(spark, sf_dir, "lineitem"))
l = load(spark, sf_dir, "lineitem")


def cents_round(col):
    return F.round(col * 100, 0).cast("long")


def cents_halfup(col):
    d = col * 100
    return (d + F.when(d >= 0, F.lit(0.5)).otherwise(F.lit(-0.5))).cast("long")


def agg(fn):
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc * (1 + F.col("l_tax"))
    return l.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(fn(F.col("l_quantity"))).alias("a"),
        F.sum(fn(F.col("l_extendedprice"))).alias("b"),
        F.sum(fn(disc)).alias("c"),
        F.sum(fn(charge)).alias("d"),
    )


t("agg with F.round cents", lambda: agg(cents_round))
t("agg with half-up cast cents", lambda: agg(cents_halfup))
t("agg raw double sums (floor ref)", lambda: agg(lambda c: c))
t("agg count only", lambda: l.groupBy("l_returnflag", "l_linestatus").count())

# verify value equality on the real data
a = agg(cents_round).collect()
b = agg(cents_halfup).collect()
print("equal on lineitem sf0.1:", sorted(map(tuple, a)) == sorted(map(tuple, b)))

# also events.value (can be negative)
e = load(spark, sf_dir, "events")
ea = e.agg(F.sum(cents_round(F.col("value")))).collect()
eb = e.agg(F.sum(cents_halfup(F.col("value")))).collect()
print("events equal:", [tuple(r) for r in ea] == [tuple(r) for r in eb], ea, eb)
print("events min value:", e.agg(F.min("value")).collect())
