"""Same-session bench A/B: run bench.py for HEAD and for the previous
driver round's tree in one sitting, on the same box state, and report the
ratio.

Why: the headline total swings with ambient machine load (rounds 2, 6 and
7 each recorded >5% drift on untouched query paths — 8.6-13.3 s for
identical code), so a round-over-round comparison of two totals recorded
HOURS apart cannot distinguish a plan regression from a busy box. Benching
both trees back-to-back in the same session removes the box as a variable:
if HEAD/base ≈ 1.0 here, a recorded delta was ambient.

Used two ways:
- CLI: ``python tools/bench_ab.py [--base REV]`` — benches HEAD and the
  base rev (default: the latest ``round N:`` driver commit that is not
  HEAD), prints one JSON line with both results and ratios.
- From bench.py: ``ab_control(head_result)`` benches ONLY the base tree
  (the caller already measured HEAD) and returns the control block that
  rides inside bench.py's single JSON line as ``"ab_control"``.

The base tree runs from a detached git worktree under /tmp (removed
afterwards) with ``SPARK_GRAFT_BENCH_AB=0`` so it cannot recurse, and
inherits SPARK_GRAFT_SF_DIR / _CPUS / _BENCH_REPS so the two measurements
are comparable. Any failure degrades to an ``{"error": ...}`` block —
the A/B control must never break the primary bench output.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _git(repo: str, *args: str) -> str:
    r = subprocess.run(
        ["git", "-C", repo, *args], capture_output=True, text=True
    )
    if r.returncode != 0:
        raise RuntimeError(f"git {' '.join(args)}: {r.stderr.strip()[:300]}")
    return r.stdout


def find_base_rev(repo: str = REPO) -> str | None:
    """The latest driver round commit (message ``round N: ...``) that is
    not HEAD — i.e. the tree the previous round's BENCH_r{N}.json
    measured. None when no such commit exists (round 1)."""
    head = _git(repo, "rev-parse", "HEAD").strip()
    log = _git(
        repo, "log", "--grep", "^round [0-9]*:", "--format=%H", "-n", "5"
    )
    for h in log.split():
        if h != head:
            return h
    return None


def script_rev(
    rev: str,
    script_rel: str,
    repo: str = REPO,
    timeout: int = 2400,
    json_prefix: str = "{",
    extra_args_of_tmp=None,
    what: str = "bench",
) -> dict:
    """Run a repo script from a detached worktree of ``rev`` and return
    its last stdout line starting with ``json_prefix``, parsed. The
    worktree is always removed; ``SPARK_GRAFT_BENCH_AB=0`` is set so a
    control run can never recurse. ``extra_args_of_tmp``: optional
    callable tmp_dir -> [argv...] for scripts that need a throwaway
    output path (bench_pipes). Shared by bench.py's and bench_pipes.py's
    A/B controls (round-12 review: two hand-rolled copies had already
    drifted on the JSON-line match)."""
    tmp = tempfile.mkdtemp(prefix="bench_ab_")
    wt = os.path.join(tmp, "wt")
    try:
        _git(repo, "worktree", "add", "--detach", wt, rev)
        script = os.path.join(wt, script_rel)
        if not os.path.exists(script):
            raise RuntimeError(f"rev {rev[:9]} predates {script_rel}")
        env = dict(os.environ)
        env["SPARK_GRAFT_BENCH_AB"] = "0"  # the control run never recurses
        argv = [sys.executable, script]
        if extra_args_of_tmp is not None:
            argv += list(extra_args_of_tmp(tmp))
        r = subprocess.run(
            argv, capture_output=True, text=True, env=env,
            timeout=timeout, cwd=wt,
        )
        if r.returncode != 0:
            raise RuntimeError(
                f"{what} at {rev[:9]} rc={r.returncode}: {r.stderr[-400:]}"
            )
        lines = [
            ln for ln in r.stdout.splitlines() if ln.startswith(json_prefix)
        ]
        if not lines:
            raise RuntimeError(f"{what} at {rev[:9]} printed no JSON line")
        return json.loads(lines[-1])
    finally:
        subprocess.run(
            ["git", "-C", repo, "worktree", "remove", "--force", wt],
            capture_output=True,
        )
        shutil.rmtree(tmp, ignore_errors=True)


def bench_rev(
    rev: str, repo: str = REPO, timeout: int = 2400
) -> dict:
    """Run ``bench.py`` from a detached worktree of ``rev`` and return its
    parsed JSON line. The worktree is always removed."""
    return script_rev(
        rev, "bench.py", repo=repo, timeout=timeout,
        json_prefix='{"metric"', what="bench",
    )


def ab_control(
    head: dict, base_rev: str | None = None, repo: str = REPO
) -> dict:
    """The control block for bench.py's JSON line: bench the base tree and
    ratio it against the already-measured ``head`` result."""
    try:
        rev = base_rev or find_base_rev(repo)
    except Exception as e:  # not a git checkout, etc.
        return {"error": str(e)[:300]}
    if rev is None:
        return {"error": "no prior 'round N:' commit to control against"}
    try:
        base = bench_rev(rev, repo)
    except Exception as e:
        return {"base_rev": rev[:9], "error": str(e)[:300]}
    bq = base.get("queries") or {}
    out = {
        "base_rev": rev[:9],
        "base_total": base.get("value"),
        "base_queries": bq,
        "base_spread": base.get("spread"),
    }
    if base.get("value"):
        out["ratio"] = round(head["value"] / base["value"], 3)
    out["query_ratio"] = {
        n: round(t / bq[n], 3)
        for n, t in (head.get("queries") or {}).items()
        if bq.get(n)
    }
    return out


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--base", default=None, help="base rev (default: last "
                   "'round N:' driver commit that is not HEAD)")
    args = p.parse_args()
    env = dict(os.environ)
    env["SPARK_GRAFT_BENCH_AB"] = "0"  # we are the A/B harness
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, env=env, cwd=REPO,
    )
    if r.returncode != 0:
        raise SystemExit(f"HEAD bench failed: {r.stderr[-400:]}")
    head = json.loads(
        [ln for ln in r.stdout.splitlines() if ln.startswith('{"metric"')][-1]
    )
    control = ab_control(head, base_rev=args.base)
    verdict = None
    if control.get("ratio") is not None:
        ratio = control["ratio"]
        verdict = (
            "regression" if ratio > 1.05
            else "improvement" if ratio < 0.95
            else "parity"
        )
    print(json.dumps({
        "head_total": head["value"],
        "head_queries": head["queries"],
        "ab_control": control,
        "verdict": verdict,
    }))


if __name__ == "__main__":
    main()
