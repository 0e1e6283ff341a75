"""Round-over-round latency tracker for the pipe/curation surface.

The driver's headline list (bench.py) is FROZEN — the driver compares its
TOTAL against the round-1 baseline, so the 24-stage pipe surface that
grew after round 2 has no standing perf record. This sidecar times the
curation-pipe rows (the 15-stage ``q_pipeline_curate`` composition, the
dialect ``q_dialect_curate`` pipe, and every ``q_dialect_pipe_*`` row in
the driver window) at sf0.1 with bench.py's exact discipline (tiny-SF
codegen warmup, table-scan warmup, round-robin median-of-reps, noop sink)
and appends the result to ``BENCH_PIPES.json`` — one JSON object per
round, newest last, so the surface where most code now lives gets a
visible latency history.

Usage: python tools/bench_pipes.py [out.json]
  (default out: BENCH_PIPES.json at the repo root, committed per round)
Honors SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS / SPARK_GRAFT_BENCH_REPS.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import TABLES, run  # noqa: E402

#: the fixed non-pipe anchors; every q_dialect_pipe_* window row is added
#: dynamically so newly promoted pipe stages join the record automatically
#: (this list MAY grow round-over-round — unlike bench.py's frozen total,
#: the record here is PER-QUERY history, so additions don't skew anything)
ANCHORS = ["q_pipeline_curate", "q_dialect_curate"]


def pipe_names(catalog) -> list[str]:
    names = list(ANCHORS)
    names += sorted(
        n for n in catalog.QUERIES if n.startswith("q_dialect_pipe_")
    )
    return names


def main() -> int:
    from csvtool_spark import queries as catalog
    from csvtool_spark.session import get_spark
    from csvtool_spark.sources.parquet import read_table

    out_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_PIPES.json"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "5"))
    spark = get_spark("bench-pipes")

    pool = {**catalog.SHADOW_QUERIES, **catalog.QUERIES}
    names = pipe_names(catalog)
    missing = [n for n in names if n not in pool]
    if missing:
        raise SystemExit(f"pipe queries missing from catalog: {missing}")

    warm_dir = "/root/testdata/sf0.001"
    warm_dir = warm_dir if os.path.isdir(warm_dir) else sf_dir
    for name in names:
        run(pool[name](spark, warm_dir))
    for t in TABLES:
        run(read_table(spark, sf_dir, t))

    samples: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(reps):
        for name in names:
            t0 = time.perf_counter()
            run(pool[name](spark, sf_dir))
            samples[name].append(time.perf_counter() - t0)

    times = {n: round(statistics.median(s), 3) for n, s in samples.items()}
    rev = "unknown"
    try:
        rev = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, timeout=10,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ).stdout.strip() or "unknown"
    except Exception:  # noqa: BLE001 — provenance only
        pass
    entry = {
        "rev": rev,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "reps": reps,
        "total_sec": round(sum(times.values()), 3),
        "queries": times,
        "spread": {
            n: {"min": round(min(s), 3), "max": round(max(s), 3)}
            for n, s in samples.items()
        },
    }

    history: list[dict] = []
    if os.path.exists(out_path):
        try:
            with open(out_path) as f:
                history = json.load(f)
        except (OSError, ValueError):
            history = []
    history.append(entry)
    with open(out_path, "w") as f:
        json.dump(history, f, indent=1, sort_keys=True)
        f.write("\n")
    print(json.dumps(entry))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
