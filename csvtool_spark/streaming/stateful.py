"""Custom stateful streaming operator via applyInPandasWithState.

``user_error_monitor`` keeps a per-user running error count with a
processing-time timeout — the canonical "custom stateful operator" shape
(SURVEY.md §2.9: the reference has no streaming; this is the engine
extension demonstrating arbitrary state beyond windows/sessions).

State is one small tuple per key, bounded; the group-state store scales
horizontally with key partitioning. The update closure is self-contained
(workers must not import csvtool_spark — see sources/parquet docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, n_errors long, error_rate double"
STATE_SCHEMA = "n_events long, n_errors long"


def user_error_monitor(stream: DataFrame, idle_timeout_ms: int | None = None) -> DataFrame:
    """Per-user cumulative event/error counters over a micro-batch stream.

    Input columns: user_id, event_type. Emits one updated row per user per
    micro-batch. ``idle_timeout_ms`` enables ProcessingTimeTimeout state
    expiry for long-running production streams — leave None for bounded
    replays: a pending timeout keeps trigger=availableNow queries alive
    forever (the batch that would fire the timeout never becomes 'available').
    """
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if idle_timeout_ms
        else GroupStateTimeout.NoTimeout
    )

    def update(key, pdfs, state):
        import pandas as _pd

        if state.hasTimedOut:
            state.remove()
            return
        # GroupState.get is a PROPERTY in PySpark (calling the returned
        # tuple raised TypeError) — latent until a key carried state into
        # a second micro-batch; caught by the forced two-batch funnel test
        n_events, n_errors = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n_events += len(pdf)
            n_errors += int((pdf["event_type"] == "error").sum())
        state.update((n_events, n_errors))
        if idle_timeout_ms:
            state.setTimeoutDuration(idle_timeout_ms)
        rate = (n_errors / n_events) if n_events else 0.0
        yield _pd.DataFrame(
            [(key[0], n_events, n_errors, round(rate, 6))],
            columns=["user_id", "n_events", "n_errors", "error_rate"],
        )

    return (
        stream.select("user_id", "event_type")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=timeout,
        )
    )


FUNNEL_OUT_SCHEMA = "user_id long, depth int, last_t long"
FUNNEL_STATE_SCHEMA = "depth int, last_t long"


def funnel_monitor(
    stream: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    idle_timeout_ms: int | None = None,
) -> DataFrame:
    """Incremental funnel: per-user (depth, last step ts) state advanced
    by the same greedy strict-progression chain as the batch
    ``operators/funnel.py``, one emit per user per micro-batch.

    Equivalence contract: equals the batch funnel when each user's step
    events arrive in event-time order ACROSS micro-batches (the ingest
    norm — shards land chronologically; within one batch events are
    sorted before folding, so any within-batch order is fine). An
    out-of-order straggler that batch would have woven into an earlier
    chain position cannot retroactively advance streaming state — the
    inherent append-only trade-off of every incremental funnel; replaying
    the directory through the batch operator is the audit path.

    State: two small integers per user — bounded by the user population,
    with optional ProcessingTimeTimeout expiry for abandoned users
    (same caveat as ``user_error_monitor``: leave None for availableNow
    replays)."""
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupStateTimeout

    if not steps or len(set(steps)) != len(steps):
        raise ValueError(f"steps must be non-empty and distinct, got {steps!r}")
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if idle_timeout_ms
        else GroupStateTimeout.NoTimeout
    )
    steps_local = list(steps)
    neg_inf = -(2**62)

    def update(key, pdfs, state):
        import pandas as _pd

        if state.hasTimedOut:
            state.remove()
            return
        # NB: GroupState.get is a property, not a method (see above)
        depth, last_t = state.get if state.exists else (0, neg_inf)
        evs = []
        for pdf in pdfs:
            evs.extend(zip(pdf["t"].tolist(), pdf["y"].tolist()))
        evs.sort()
        for t, y in evs:
            if depth < len(steps_local) and y == steps_local[depth] and t > last_t:
                depth += 1
                last_t = t
        state.update((depth, last_t))
        if idle_timeout_ms:
            state.setTimeoutDuration(idle_timeout_ms)
        yield _pd.DataFrame(
            {"user_id": [key[0]], "depth": [depth], "last_t": [last_t]}
        )

    projected = stream.filter(F.col(type_col).isin(*steps)).select(
        F.col(user_col).alias("user_id"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("t"),
        F.col(type_col).alias("y"),
    )
    return projected.groupBy("user_id").applyInPandasWithState(
        update, FUNNEL_OUT_SCHEMA, FUNNEL_STATE_SCHEMA, "update", timeout
    )
