"""As-of (event-time) join: for each left row, the most recent right row
with ``right_ts <= left_ts`` (backward, inclusive) — or the earliest with
``right_ts >= left_ts`` (forward) — per key. The standard operator for
joining facts to slowly-changing state (prices, user profile versions,
feature snapshots) that Spark has no built-in for.

Scale design — the union+window formulation, NOT a range join:
a naive ``l JOIN r ON key AND r.ts <= l.ts`` + argmax explodes into
O(|l|·|r per key|) intermediate rows. Instead both sides are unioned into
one stream tagged by side, shuffled ONCE on the key, and sorted per key by
(ts, side); a running ``last(right_payload, ignorenulls=True)`` then gives
every left row its as-of match in a single window pass. Cost is one
shuffle + one per-key sort regardless of how many right rows precede each
left row. Right payloads travel inside a non-null STRUCT so genuinely-null
right fields can't make the window skip past a real match.

Hot keys concentrate in single window partitions (AQE cannot split a
window); ``asof_join_bucketed`` is the skew form — it pre-buckets time
into coarse ranges, runs the window per (key, bucket) so one hot key
spreads over many partitions, and resolves cross-bucket matches through a
carried-forward boundary-state table that is tiny (one row per non-empty
(key, bucket)) no matter how hot the key is.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    direction: str = "backward",
    tolerance: Column | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """Left as-of join. Every ``left`` column is kept; every non-key,
    non-timestamp ``right`` column is appended (suffixed on collision),
    plus ``{right_ts}{suffix}`` = the matched right timestamp (null when no
    match). ``tolerance`` (an interval Column, e.g. ``F.expr("INTERVAL 7
    DAYS")``) nulls out matches older (backward) / farther (forward) than
    the bound, like pandas.merge_asof.

    Ties: right rows sharing (key, ts) resolve to the LAST in the right
    DataFrame's sort order within the window — pre-aggregate the right side
    to one row per (key, ts) for deterministic results.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward or forward, got {direction!r}")

    lcols = list(left.columns)
    rcols = [c for c in right.columns if c not in (on, right_ts)]
    out_names = {
        c: (c + suffix if c in lcols else c) for c in rcols
    }
    matched_ts = right_ts + suffix

    l = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.struct(*lcols).alias("__l"),
        F.lit(None).cast(
            right.select(
                F.struct(
                    F.col(right_ts).alias(matched_ts),
                    *[F.col(c).alias(out_names[c]) for c in rcols],
                ).alias("s")
            ).schema["s"].dataType.simpleString()
        ).alias("__r"),
    )
    r = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(
            left.select(F.struct(*lcols).alias("s")).schema["s"].dataType.simpleString()
        ).alias("__l"),
        F.struct(
            F.col(right_ts).alias(matched_ts),
            *[F.col(c).alias(out_names[c]) for c in rcols],
        ).alias("__r"),
    )
    u = l.unionByName(r)

    ts_order = F.col("__ts").asc() if direction == "backward" else F.col("__ts").desc()
    w = (
        Window.partitionBy("__k")
        .orderBy(ts_order, F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.withColumn("__m", F.last("__r", ignorenulls=True).over(w)).filter(
        F.col("__side") == 1
    )

    m = F.col("__m")
    if tolerance is not None:
        in_bound = (
            (F.col("__ts") - tolerance <= m[matched_ts])
            if direction == "backward"
            else (F.col("__ts") + tolerance >= m[matched_ts])
        )
        m = F.when(in_bound, F.col("__m"))

    return matched.select(
        *[F.col(f"__l.{c}").alias(c) for c in lcols],
        m[matched_ts].alias(matched_ts),
        *[m[out_names[c]].alias(out_names[c]) for c in rcols],
    )


def asof_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    bucket_width: float,
    suffix: str = "_r",
) -> DataFrame:
    """Skew-resistant backward as-of join (semantics identical to
    ``asof_join(direction="backward")`` — differential-tested).

    Three bounded pieces instead of one per-key window:

    1. **Within-bucket pass**: both sides bucket by ``floor(ts/width)``;
       the union+window runs per (key, bucket), so a key with N rows
       spreads over N·width/span partitions instead of one.
    2. **Boundary state**: per non-empty (key, bucket), the latest right
       row — ONE row per bucket regardless of how many rows the bucket
       holds (``max_by`` aggregate, bounded state).
    3. **State lookup**: each left (key, bucket) needs the latest state
       from any EARLIER bucket (gaps allowed) — itself a tiny as-of,
       solved with the same union+window over the per-bucket tables.

    A left row takes its within-bucket match when one exists, else the
    carried boundary state. Ties at identical (key, ts): pre-aggregate
    the right side to one row per (key, ts), as with ``asof_join``.
    """
    w = float(bucket_width)
    lcols = list(left.columns)
    rcols = [c for c in right.columns if c not in (on, right_ts)]
    out_names = {c: (c + suffix if c in lcols else c) for c in rcols}
    matched_ts = right_ts + suffix

    def payload(df: DataFrame):
        return F.struct(
            F.col(right_ts).alias(matched_ts),
            *[F.col(c).alias(out_names[c]) for c in rcols],
        )

    pay_type = right.select(payload(right).alias("s")).schema["s"].dataType.simpleString()
    l_type = left.select(F.struct(*lcols).alias("s")).schema["s"].dataType.simpleString()

    lb = left.withColumn("__b", F.floor(F.col(left_ts) / w).cast("long"))
    rb = right.withColumn("__b", F.floor(F.col(right_ts) / w).cast("long"))

    # (2) one row per non-empty right (key, bucket): the latest payload
    latest = rb.groupBy(F.col(on).alias("__k"), "__b").agg(
        F.max_by(payload(rb), F.col(right_ts)).alias("__pay")
    )

    # (3) state carried into each LEFT bucket from strictly-earlier right
    # buckets: union left-bucket probes (side 1) with per-bucket sources
    # (side 0 — ordered AFTER probes at the same bucket, since a same-
    # bucket source is within-bucket, not before its start)
    probes = lb.select(F.col(on).alias("__k"), "__b").distinct()
    pu = probes.select(
        "__k", "__b", F.lit(1).alias("__side"), F.lit(None).cast(pay_type).alias("__pay")
    )
    su = latest.select("__k", "__b", F.lit(0).alias("__side"), "__pay")
    ws = (
        Window.partitionBy("__k")
        .orderBy(F.col("__b").asc(), F.col("__side").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    states = (
        pu.unionByName(su)
        .withColumn("__state", F.last("__pay", ignorenulls=True).over(ws))
        .filter(F.col("__side") == 1)
        .select("__k", "__b", "__state")
    )

    # (1) within-bucket union+window, partitioned by (key, bucket)
    l = lb.select(
        F.col(on).alias("__k"),
        "__b",
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.struct(*lcols).alias("__l"),
        F.lit(None).cast(pay_type).alias("__r"),
    )
    r = rb.select(
        F.col(on).alias("__k"),
        "__b",
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(l_type).alias("__l"),
        payload(rb).alias("__r"),
    )
    wb = (
        Window.partitionBy("__k", "__b")
        .orderBy(F.col("__ts").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    inbucket = (
        l.unionByName(r)
        .withColumn("__m", F.last("__r", ignorenulls=True).over(wb))
        .filter(F.col("__side") == 1)
    )

    m = F.coalesce(F.col("__m"), F.col("__state"))
    return (
        inbucket.join(states, ["__k", "__b"], "left")
        .select(
            *[F.col(f"__l.{c}").alias(c) for c in lcols],
            m[matched_ts].alias(matched_ts),
            *[m[out_names[c]].alias(out_names[c]) for c in rcols],
        )
    )
