"""Ad-hoc decomposition of q_kn_score wall time (not part of the suite).
Run on an idle box: where do the ~1.7 s warm go — model build (cb agg +
count-of-counts collect), the cx/cw model aggregates, or the score side?"""
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from csvtool_spark.operators import textstats
from csvtool_spark.queries import load
from csvtool_spark.session import get_spark

sf_dir = "/root/testdata/sf0.1"
spark = get_spark("exp_kn")


def noop(df):
    df.write.mode("overwrite").format("noop").save()


def t(name, fn, reps=5):
    xs = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        xs.append(time.perf_counter() - t0)
    print(f"{name:44s} med {statistics.median(xs):6.3f}  min {min(xs):6.3f}", flush=True)


d = load(spark, sf_dir, "documents")
noop(d)
train = d.filter(F.length("source") == 4)
score = d.filter(F.length("source") == 5)

# pieces
t("score-side tf (explode+agg)", lambda: noop(textstats._doc_bigram_tf(score, "text", "doc_id")))
t("train-side tf (explode+agg)", lambda: noop(textstats._doc_bigram_tf(train, "text", "doc_id")))


def model_build():
    m = textstats.kn_bigram_model(train, "text", "doc_id")
    m.release()


t("model build (cb persist + consts collect)", model_build)


def model_cxcw():
    m = textstats.kn_bigram_model(train, "text", "doc_id")
    noop(m.cx)
    noop(m.cw)
    m.release()


t("model build + cx + cw", model_cxcw)


def full():
    m = textstats.kn_bigram_model(train, "text", "doc_id")
    out = textstats.kn_score(score, m, "text", "doc_id")
    noop(out)
    m.release()


t("full q_kn_score", full)

# plan of the score side
m = textstats.kn_bigram_model(train, "text", "doc_id")
out = textstats.kn_score(score, m, "text", "doc_id")
out.explain("formatted")
m.release()
spark.stop()
