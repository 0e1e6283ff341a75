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

Every entry carries a same-session ``ab_control`` block (round-12
directive): the previous driver round's tree is checked out into a
detached worktree and ITS bench_pipes runs back-to-back with this one,
so the recorded ratio separates real pipe regressions from ambient
machine state (the raw r11 history swung 13.4->17.7->14.3 s on an
untouched pipe surface — exactly the hazard bench.py's A/B solved in
round 9). Ratios are computed over the queries common to both trees
(window rotations change the q_dialect_pipe_* set round to round).

Usage: python tools/bench_pipes.py [out.json]
  (default out: BENCH_PIPES.json at the repo root, committed per round)
Honors SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS / SPARK_GRAFT_BENCH_REPS;
set SPARK_GRAFT_BENCH_AB=0 to skip the control run (the control run
itself always does, so it can never recurse).
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


def pipes_rev(rev: str, timeout: int = 2400) -> dict:
    """Run the BASE tree's bench_pipes from a detached worktree and
    return its parsed entry (bench_ab.script_rev does the worktree /
    recursion-guard / parse mechanics; the control writes its history
    to a throwaway path inside the worktree tmp dir, never to ours)."""
    from bench_ab import script_rev

    return script_rev(
        rev, os.path.join("tools", "bench_pipes.py"), timeout=timeout,
        json_prefix='{"rev"',
        extra_args_of_tmp=lambda tmp: [os.path.join(tmp, "out.json")],
        what="bench_pipes",
    )


def pipes_ab_control(head_entry: dict) -> dict:
    """The control block: bench the previous driver round's pipe surface
    in this same session and ratio it against ``head_entry`` over the
    COMMON query set. Any failure degrades to {'error': ...} — the
    control must never break the primary record."""
    from bench_ab import find_base_rev

    try:
        rev = find_base_rev()
    except Exception as e:  # noqa: BLE001 — not a git checkout, etc.
        return {"error": str(e)[:300]}
    if rev is None:
        return {"error": "no prior 'round N:' commit to control against"}
    try:
        base = pipes_rev(rev)
    except Exception as e:  # noqa: BLE001
        return {"base_rev": rev[:9], "error": str(e)[:300]}
    bq = base.get("queries") or {}
    hq = head_entry.get("queries") or {}
    # membership, not truthiness — a base median that rounds to 0.0 is
    # still a common query (its per-query ratio is just undefined), and
    # 'ratio' is ALWAYS present (null when the base total is 0) so
    # consumers of the committed record never special-case a missing
    # key (round-13 ADVICE)
    common = sorted(n for n in hq if n in bq)
    out = {
        "base_rev": rev[:9],
        "base_total": base.get("total_sec"),
        "base_queries": bq,
        "common": common,
        "common_total_head": round(sum(hq[n] for n in common), 3),
        "common_total_base": round(sum(bq[n] for n in common), 3),
        "query_ratio": {
            n: round(hq[n] / bq[n], 3) if bq[n] else None
            for n in common
        },
        "ratio": None,
    }
    if out["common_total_base"]:
        out["ratio"] = round(
            out["common_total_head"] / out["common_total_base"], 3
        )
    return out


#: shadow pipe rows that KEEP their sidecar perf history after a window
#: rotation (the sidecar is a latency record, not the correctness
#: window): gopher rotated to shadow in r13 but remains the costliest
#: pipe path and the subject of its r13 work curve
PIPE_KEEP = ["q_dialect_pipe_gopher"]


def pipe_names(catalog) -> list[str]:
    names = list(ANCHORS)
    names += sorted(
        {n for n in catalog.QUERIES if n.startswith("q_dialect_pipe_")}
        | set(PIPE_KEEP)
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

    # cold pass at the bench SF (bench.py's round-12 discipline): the
    # neardup pipe rows persist signature/token stages a later rep's
    # identical plan silently reuses — materialize once (recorded) so
    # the timed reps are uniformly warm instead of cold-then-cached
    cold = {}
    for name in names:
        t0 = time.perf_counter()
        run(pool[name](spark, sf_dir))
        cold[name] = round(time.perf_counter() - t0, 3)

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
        "cold_sec": cold,
        "spread": {
            n: {"min": round(min(s), 3), "max": round(max(s), 3)}
            for n, s in samples.items()
        },
    }
    if os.environ.get("SPARK_GRAFT_BENCH_AB", "1") != "0":
        spark.stop()  # free the JVM so the control's own session gets
        # the same resources this one had (comparable measurements)
        try:
            entry["ab_control"] = pipes_ab_control(entry)
        except Exception as e:  # noqa: BLE001 — diagnostic block only
            entry["ab_control"] = {"error": str(e)[:300]}

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
