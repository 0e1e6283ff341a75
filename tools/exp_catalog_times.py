"""Ad-hoc: time every window-catalog query at sf0.1 via the noop sink
(median of 3 warm reps, after one cold materialization pass). Not part of
the suite — builds the round-13 optimization checklist."""
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from csvtool_spark import queries as catalog
from csvtool_spark.queries import load
from csvtool_spark.session import get_spark

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
spark = get_spark("exp_catalog_times")


def noop(df):
    df.write.mode("overwrite").format("noop").save()


pool = {**catalog.SHADOW_QUERIES, **catalog.QUERIES}
names = sorted(catalog.QUERIES)
# expensive shadow rows that the headline bench / pipe sidecar also exercise
extra = ["q_dedup_minhash", "q_ann_bruteforce", "q_text_quality",
         "q_dialect_pipe_gopher", "q_dedup_simhash", "q_dedup_ngram"]
names += [n for n in extra if n in pool and n not in names]

for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    noop(load(spark, sf_dir, t))

out = {}
for name in names:
    spark.sparkContext.setJobDescription(f"cat: {name}")
    try:
        t0 = time.perf_counter()
        noop(pool[name](spark, sf_dir))
        cold = time.perf_counter() - t0
        xs = []
        for _ in range(3):
            t0 = time.perf_counter()
            noop(pool[name](spark, sf_dir))
            xs.append(time.perf_counter() - t0)
        out[name] = {"cold": round(cold, 3), "med": round(statistics.median(xs), 3),
                     "min": round(min(xs), 3)}
        print(f"{name:36s} cold {cold:7.3f}  med {statistics.median(xs):7.3f}  min {min(xs):7.3f}", flush=True)
    except Exception as e:
        out[name] = {"error": str(e)[:200]}
        print(f"{name:36s} ERROR {str(e)[:120]}", flush=True)
    finally:
        spark.sparkContext.setJobDescription(None)

total = sum(v.get("med", 0) for v in out.values())
print(f"TOTAL med {total:.3f}")
with open("/tmp/catalog_times.json", "w") as f:
    json.dump(out, f, indent=1)
