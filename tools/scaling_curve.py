"""Scaling-curve harness for the 15 bench headline queries.

Times every ``bench.HEADLINE`` query at each available scale factor
(sf0.001 / sf0.01 / sf0.1 — 1× / 10× / 100× data) with the same
warmup + round-robin median-of-reps discipline as ``bench.py``, then
reports the per-query growth ratio across the 100× data range.

Why this exists: the sf0.1 bench totals are overhead-dominated (plan
construction + task-scheduling floor, see ARCHITECTURE.md "Measured
scaling"), so a round-over-round total can drift ±7% on ambient machine
state without any plan change. The growth RATIO t(sf0.1)/t(sf0.001) is
the signal the plan-shape claims rest on: a query whose ratio
approaches 100 (linear in data at local scale, where per-partition
parallelism is already saturated) has a super-linear term a 1000×
scale-up would amplify; the repo's plans all sit far below it.

Usage: python tools/scaling_curve.py [out.json]
  (default out: SCALING.json at the repo root, committed per round)

The pytest twin (tests/test_scaling_curve.py) runs a 1-rep version of
this and asserts no query's 100× growth ratio is super-linear.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE, TABLES, run  # noqa: E402

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]


def measure(spark, pool, sf_dirs=None, reps: int = 3) -> dict:
    """{sf: {query: median_sec}} with bench.py's warmup discipline."""
    from csvtool_spark.sources.parquet import read_table

    sf_dirs = [d for d in (sf_dirs or SF_DIRS) if os.path.isdir(d)]
    # one warmup sweep at the smallest SF fills the codegen cache for
    # every plan (bench.py's rationale), then per-SF scan warmups fill
    # the file-listing/footer caches before that SF is timed
    for name in HEADLINE:
        run(pool[name](spark, sf_dirs[0]))
    out: dict[str, dict[str, float]] = {}
    for sf_dir in sf_dirs:
        for t in TABLES:
            run(read_table(spark, sf_dir, t))
        samples: dict[str, list[float]] = {n: [] for n in HEADLINE}
        for _ in range(reps):
            for name in HEADLINE:
                t0 = time.perf_counter()
                run(pool[name](spark, sf_dir))
                samples[name].append(time.perf_counter() - t0)
        sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
        out[sf] = {n: round(statistics.median(s), 3) for n, s in samples.items()}
    return out


def growth_ratios(curves: dict) -> dict[str, float]:
    """Per-query t(largest SF) / t(smallest SF) — the 100× data ratio."""
    sfs = sorted(curves, key=float)
    lo, hi = curves[sfs[0]], curves[sfs[-1]]
    return {n: round(hi[n] / max(lo[n], 1e-9), 2) for n in hi}


def main() -> None:
    from csvtool_spark import queries as catalog
    from csvtool_spark.session import get_spark

    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SCALING.json"
    )
    spark = get_spark("scaling-curve")
    pool = {**catalog.SHADOW_QUERIES, **catalog.QUERIES}
    curves = measure(spark, pool)
    ratios = growth_ratios(curves)
    sfs = sorted(curves, key=float)
    data_x = float(sfs[-1]) / float(sfs[0])
    report = {
        "sfs": sfs,
        "data_ratio": data_x,
        "queries": {n: {sf: curves[sf][n] for sf in sfs} for n in HEADLINE},
        "growth_ratio": ratios,
        "totals": {sf: round(sum(curves[sf].values()), 3) for sf in sfs},
        "max_growth": max(ratios.values()),
    }
    with open(out_path, "w") as f:
        json.dump(report, f, indent=2)
        f.write("\n")
    # human-readable table
    hdr = "query".ljust(24) + "".join(f"sf{sf:>8}" for sf in sfs) + "   x-growth"
    print(hdr)
    for n in HEADLINE:
        print(
            n.ljust(24)
            + "".join(f"{curves[sf][n]:10.3f}" for sf in sfs)
            + f"{ratios[n]:10.2f}"
        )
    print(
        "total".ljust(24)
        + "".join(f"{report['totals'][sf]:10.3f}" for sf in sfs)
        + f"{report['totals'][sfs[-1]] / report['totals'][sfs[0]]:10.2f}"
    )
    print(f"\n{data_x:.0f}x data -> max per-query growth {report['max_growth']:.2f}x")
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
