"""Ad-hoc A/B (not part of the suite): connected_components with the
round's localCheckpoint EAGER (two jobs per round: materialize, then the
signature agg) vs LAZY (the signature agg materializes the checkpoint —
one job and one fewer full pass over the edge set per round). Outputs
must be identical; run on an idle box."""
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from csvtool_spark.operators import dedup
from csvtool_spark.operators.components import (
    _canon,
    _large_star,
    _small_star,
    _sym,
    connected_components,
)
from csvtool_spark.queries import load
from csvtool_spark.session import get_spark

sf_dir = "/root/testdata/sf0.1"
spark = get_spark("exp_cc_lazyckpt")


def noop(df):
    df.write.mode("overwrite").format("noop").save()


def cc_lazy(edges, src="src", dst="dst", max_iter=20):
    e = _canon(
        edges.select(
            F.col(src).cast("long").alias("src"), F.col(dst).cast("long").alias("dst")
        )
    ).localCheckpoint()
    sig = None
    for _ in range(max_iter):
        e2 = _canon(_small_star(_large_star(e))).localCheckpoint(eager=False)
        row = e2.agg(
            F.count(F.lit(1)).alias("n"),
            F.bit_xor(F.xxhash64("src", "dst")).alias("x"),
        ).first()
        new_sig = (row["n"], row["x"])
        e = e2
        if new_sig == sig:
            break
        sig = new_sig
    else:
        raise RuntimeError(f"cc_lazy: no fixed point in {max_iter} rounds")
    s = _sym(e)
    return (
        s.groupBy("src")
        .agg(F.min("dst").alias("__mn"))
        .select(
            F.col("src").alias("node"),
            F.least("src", "__mn").alias("component"),
        )
    )


d = load(spark, sf_dir, "documents")
noop(d)
pairs = dedup.near_dup_pairs_minhash(d, "text", "doc_id", threshold=0.4)
pairs = pairs.select("id_a", "id_b").persist()
n_pairs = pairs.count()
print(f"pairs: {n_pairs}", flush=True)

# output equality first
a = connected_components(pairs, src="id_a", dst="id_b").collect()
b = cc_lazy(pairs, src="id_a", dst="id_b").collect()
assert sorted(map(tuple, a)) == sorted(map(tuple, b)), "OUTPUT MISMATCH"
print(f"outputs identical ({len(a)} rows)", flush=True)


def t(name, fn, reps=7):
    xs = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        xs.append(time.perf_counter() - t0)
    print(
        f"{name:34s} med {statistics.median(xs):6.3f}  min {min(xs):6.3f}  "
        f"max {max(xs):6.3f}",
        flush=True,
    )


t("cc eager (current)", lambda: noop(connected_components(pairs, src="id_a", dst="id_b")))
t("cc lazy ckpt", lambda: noop(cc_lazy(pairs, src="id_a", dst="id_b")))
t("cc eager (current) re", lambda: noop(connected_components(pairs, src="id_a", dst="id_b")))
t("cc lazy ckpt re", lambda: noop(cc_lazy(pairs, src="id_a", dst="id_b")))

pairs.unpersist()
spark.stop()
