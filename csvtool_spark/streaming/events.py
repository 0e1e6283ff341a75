"""Structured Streaming operators over the events stream.

The reference has no streaming at all (SURVEY.md §2.9 — its "realtime"
pieces are UI plumbing); this module is the engine extension that gives the
batch operators streaming twins:

- ``windowed_agg_stream``: tumbling event-time windows + watermark for late
  data — the streaming twin of the batch ``q_events_window``;
- ``sessionized_stream``: native ``session_window`` gap sessionization —
  the streaming twin of the batch lag/cumsum ``q_sessionize``.

Tests drive these with the file source → memory sink +
``processAllAvailable()`` so a bounded batch flows through the real
streaming engine (incremental execution, state store, watermarks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

def _events_schema(ts_type: T.DataType) -> T.StructType:
    return T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", ts_type),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )


def _parquet_ts_unit(path: str) -> str:
    """Time unit ('s'|'ms'|'us'|'ns') of events.ts from the parquet footer.

    One driver-side footer read (O(KB)) — the streaming file source needs a
    declared schema up front, and the right declaration depends on the
    writer's physical type: Spark reads second/milli/microsecond timestamps
    natively but TIMESTAMP(NANOS) only as a raw long behind the
    ``nanosAsLong`` legacy conf. Generated data has shipped both ways, so
    detect instead of assuming.
    """
    import pyarrow.parquet as pq

    schema = pq.ParquetFile(path).schema_arrow
    if schema.get_field_index("ts") < 0:
        raise ValueError(
            f"events shard {path!r} has no 'ts' field (columns: "
            f"{schema.names}) — cannot build the event-time stream from it"
        )
    ts_type = schema.field("ts").type
    unit = getattr(ts_type, "unit", None)
    if unit is None:
        raise ValueError(
            f"events.ts in {path!r} is {ts_type}, not a parquet timestamp — "
            "cannot build the event-time stream from it"
        )
    return unit


def stream_events_dir(spark: SparkSession, stream_dir: str) -> DataFrame:
    """File-source stream over a directory of events parquet shards, with
    ``ts`` normalized to a proper (micros) timestamp whatever the writer's
    physical unit. New files dropped into the directory become
    micro-batches — the production ingest shape."""
    import glob

    shards = sorted(glob.glob(f"{stream_dir}/*.parquet"))
    if not shards:
        # The declared schema depends on the writer's timestamp unit, which
        # only a file can reveal — fail clearly instead of IndexError.
        # (Production starts the stream AFTER the first shard lands, or
        # builds the reader from the writer's known schema directly.)
        raise ValueError(
            f"no parquet shards in {stream_dir!r} to detect the timestamp "
            "unit from; write one first or construct the stream with an "
            "explicit schema"
        )
    # A file-source stream has ONE declared schema, so mixed-unit shard
    # dirs are unsupported — route a unit migration through a new directory
    # (new stream) instead. Every currently-present shard footer must
    # agree (cheap O(KB) driver reads); detecting from only the first
    # would declare a wrong schema for later shards and fail mid-stream
    # with a read error instead of this message. Shards that land AFTER
    # the stream starts are necessarily unchecked — that is inherent to
    # the one-schema contract.
    units = {s: _parquet_ts_unit(s) for s in shards}
    if len(set(units.values())) > 1:
        raise ValueError(
            f"events shards in {stream_dir!r} disagree on the ts unit: "
            f"{units} — a stream needs one schema; migrate units via a "
            "new directory"
        )
    if units[shards[0]] == "ns":
        # read epoch-nanos as long, truncate to micros with integer
        # arithmetic (nanos exceed 2^53 — double math would corrupt them).
        # The conf is scoped: the stream source captures it at load()
        # time, so micro-batches planned after the restore still read
        # nanos correctly (verified; pinned by
        # test_nanos_conf_is_scoped_for_streams).
        from csvtool_spark.sources.parquet import scoped_nanos_as_long

        with scoped_nanos_as_long(spark):
            raw = (
                spark.readStream.schema(_events_schema(T.LongType()))
                .format("parquet")
                .load(stream_dir)
            )
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    raw = (
        spark.readStream.schema(_events_schema(T.TimestampNTZType()))
        .format("parquet")
        .load(stream_dir)
    )
    # Watermarks demand TIMESTAMP (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE on
    # NTZ). The NTZ→LTZ cast keeps the wall-clock reading in the session
    # zone, so collected values agree with the batch twin's NTZ values.
    return raw.withColumn("ts", F.col("ts").cast("timestamp"))


def event_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream of the events table with proper timestamps.

    The file source watches a DIRECTORY; the testdata ships one parquet
    file, so stage it into a per-session stream dir (production points at
    the ingest directory and new files become micro-batches)."""
    import shutil
    import tempfile

    stream_dir = tempfile.mkdtemp(prefix="events_stream_")
    shutil.copy(f"{sf_dir}/events.parquet", f"{stream_dir}/events.parquet")
    return stream_events_dir(spark, stream_dir)


def windowed_agg_stream(
    stream: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling-window counts/sums with a late-data watermark. At scale the
    state store holds one row per (window, event_type) until the watermark
    passes — bounded state."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).start.alias("ws"), "event_type")
        .agg(
            F.count(F.lit(1)).cast("double").alias("n"),
            F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("sum_v_c"),
        )
    )


def sessionized_stream(
    stream: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Gap-based sessions via the native session_window operator (dynamic
    window merge in the state store)."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("sw"), "user_id")
        .agg(
            F.count(F.lit(1)).cast("double").alias("n_events"),
            F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("sum_v_c"),
        )
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
            "sum_v_c",
        )
    )


def deduped_stream(
    stream: DataFrame,
    keys: list[str] | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming exact dedup: keep the first event per key, holding each
    seen key in the state store only until the watermark passes
    (``dropDuplicatesWithinWatermark`` — bounded state, unlike plain
    ``dropDuplicates`` whose key set grows forever). The streaming twin of
    the batch ``dedup.exact_dedup``; ingest-side dedup for at-least-once
    sources replaying the same document shard."""
    return stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        keys or ["event_id"]
    )


def enriched_stream(
    stream: DataFrame, dim: DataFrame, on: str | list[str], how: str = "left",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Stream-static join: every micro-batch joins against the static
    dimension. Streaming plans don't get AQE's runtime broadcast decision,
    so fixed-size dims are hinted explicitly (``broadcast_dim=True``, the
    default — right for user/tier/geo lookups); pass False for dims that
    scale with the data and accept the per-batch shuffle."""
    d = F.broadcast(dim) if broadcast_dim else dim
    return stream.join(d, on, how)


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    key: str,
    upper: str = "30 minutes",
    left_wm: str = "1 hour",
    right_wm: str = "1 hour",
) -> DataFrame:
    """Watermarked stream-stream interval join: for each left event, the
    right events with the same ``key`` whose timestamp falls in
    ``[left.ts, left.ts + upper]`` (the click→conversion / click→error
    attribution shape).

    Right-side columns come back prefixed ``r_``. Both sides carry
    watermarks AND the join condition bounds the time difference — that
    pair is what lets the state store evict: a buffered left row can be
    dropped once the right watermark passes ``l.ts + upper``, so state is
    bounded by (watermark + interval) × arrival rate instead of growing
    forever. Without the interval bounds Spark would have to keep every
    row of both streams."""
    l = left.withWatermark("ts", left_wm)
    r = right.select(
        *[F.col(c).alias(f"r_{c}") for c in right.columns]
    ).withWatermark("r_ts", right_wm)
    cond = (
        (F.col(key) == F.col(f"r_{key}"))
        & (F.col("r_ts") >= F.col("ts"))
        & (F.col("r_ts") <= F.col("ts") + F.expr(f"INTERVAL {upper}"))
    )
    return l.join(r, cond, "inner")


def run_to_memory(df: DataFrame, name: str, output_mode: str = "complete") -> None:
    """Drive a bounded stream to completion into an in-memory table."""
    q = (
        df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
