"""Funnel analysis over event streams: how many users progress through an
ordered sequence of step events (signup → click → purchase), each step
STRICTLY after the previous one in event time.

Beyond-reference extension (the reference has no event-sequence surface);
the operator every product-analytics engine ships and a training-data
pipeline reuses for session-quality filtering (keep users who completed a
real interaction funnel).

Semantics (pinned, engine-independent): a user reaches step ``k`` if
there exist events ``e_1 … e_k`` with ``type(e_i) = steps[i]`` and
``ts(e_1) < ts(e_2) < … < ts(e_k)`` — the greedy earliest-match chain
(take the MINIMUM timestamp for step 1, then the minimum strictly-later
timestamp for step 2, …), which is optimal: if any valid chain exists
the greedy one does. Strict ``<`` makes the result independent of how
same-timestamp events tie-break, so both engines agree without any
ordering convention.

Scale shape: events are filtered to the step types BEFORE the shuffle,
grouped once per user (sorted micro-arrays bounded by per-user step-event
activity — the standard funnel-state assumption), and the greedy chain is
ONE in-memory array fold per user. The step counts are a ≤|steps|-row
aggregate of the per-user depth. No joins, one Exchange (plan-tested).
The k-pass join form (one min-aggregate per step) would shuffle k times.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_NEG_INF = -(2**62)


def _check_steps(steps: list[str]) -> None:
    if not steps:
        raise ValueError("funnel: steps must be a non-empty ordered list")
    if len(set(steps)) != len(steps):
        raise ValueError(f"funnel: steps must be distinct, got {steps!r}")


def funnel_user_depths(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
) -> DataFrame:
    """(user, depth) — how many funnel steps each user completed (users
    with no step events are absent). The greedy chain fold described in
    the module docstring; shared by ``funnel`` and the streaming twin's
    batch-equality tests."""
    _check_steps(steps)
    steps_lit = F.array(*[F.lit(s) for s in steps])
    t_us = F.unix_micros(F.col(ts_col).cast("timestamp"))

    evs = (
        df.filter(F.col(type_col).isin(*steps))
        .groupBy(F.col(user_col).alias("user"))
        .agg(
            F.sort_array(
                F.collect_list(F.struct(t_us.alias("t"), F.col(type_col).alias("y")))
            ).alias("__evs")
        )
    )
    # greedy chain fold: state = (depth reached, ts of last matched step)
    init = F.struct(
        F.lit(0).cast("int").alias("k"), F.lit(_NEG_INF).cast("long").alias("t")
    )
    state = F.aggregate(
        F.col("__evs"),
        init,
        lambda acc, e: F.when(
            (acc["k"] < F.lit(len(steps)))
            & (e["y"] == F.element_at(steps_lit, acc["k"] + 1))
            & (e["t"] > acc["t"]),
            F.struct((acc["k"] + 1).alias("k"), e["t"].alias("t")),
        ).otherwise(acc),
    )
    return evs.select("user", state["k"].alias("depth"))


def funnel(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
) -> DataFrame:
    """(step, step_name, users) — users reaching each funnel step.

    ``steps`` is the ordered list of event types; every step row is
    emitted even when zero users reach it."""
    steps_lit = F.array(*[F.lit(s) for s in steps])
    reached = (
        funnel_user_depths(df, user_col, ts_col, type_col, steps)
        .select("depth")
        .filter(F.col("depth") > 0)
    )
    counts = (
        reached.select(F.explode(F.sequence(F.lit(1), F.col("depth"))).alias("step"))
        .groupBy("step")
        .agg(F.count(F.lit(1)).cast("long").alias("users"))
    )
    grid = df.sparkSession.range(1, len(steps) + 1).select(
        F.col("id").cast("int").alias("step")
    )
    return (
        grid.join(counts, "step", "left")
        .select(
            "step",
            F.element_at(steps_lit, F.col("step")).alias("step_name"),
            F.coalesce("users", F.lit(0)).cast("long").alias("users"),
        )
    )


def funnel_oracle_sql(
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
    table: str = "events",
) -> str:
    """DuckDB twin — the INDEPENDENT k-pass min-chain implementation of
    the same greedy semantics: ``t1 = min(ts | step1)``, ``t_k = min(ts |
    step_k, ts > t_{k-1})``; a user reaches step k iff ``t_k`` exists."""

    def esc(s: str) -> str:
        return s.replace("'", "''")

    ctes = [
        f"e AS (SELECT {user_col} AS u, {type_col} AS y, "
        f"epoch_us(CAST({ts_col} AS TIMESTAMP)) AS t FROM {table})"
    ]
    prev = None
    for i, s in enumerate(steps, start=1):
        if prev is None:
            # t IS NOT NULL: a user whose only step-1 events carry NULL
            # timestamps must not count (Spark's fold never advances on a
            # NULL t; without the guard min(t)=NULL still emits a group row)
            ctes.append(
                f"s{i} AS (SELECT u, min(t) AS t{i} FROM e "
                f"WHERE y = '{esc(s)}' AND t IS NOT NULL GROUP BY u)"
            )
        else:
            ctes.append(
                f"s{i} AS (SELECT e.u, min(t) AS t{i} FROM e "
                f"JOIN {prev} USING (u) WHERE y = '{esc(s)}' AND t > {prev}.t{i-1} "
                f"GROUP BY e.u)"
            )
        prev = f"s{i}"
    unions = "\n    UNION ALL ".join(
        f"SELECT {i} AS step, '{esc(s)}' AS step_name, "
        f"CAST(count(*) AS BIGINT) AS users FROM s{i}"
        for i, s in enumerate(steps, start=1)
    )
    return "WITH " + ",\n    ".join(ctes) + "\n    " + unions
