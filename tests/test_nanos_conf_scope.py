"""The ``nanosAsLong`` session conf must never leak (VERDICT r3 #5): both
the batch reader and the streaming source set it inside a save/restore
scope, and reads constructed inside the scope stay bit-correct AFTER the
restore — Spark 4 captures the conf into the relation at read()/load()
time, which these tests pin (if a Spark upgrade changes that capture
semantics, the value assertions here fail loudly)."""

from __future__ import annotations

import tempfile

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tests.conftest import SF_SMALL

CONF = "spark.sql.legacy.parquet.nanosAsLong"


@pytest.fixture()
def nanos_dir():
    """sf0.001 events rewritten with a TIMESTAMP(NANOS) ts column."""
    src = pq.read_table(f"{SF_SMALL}/events.parquet")
    cols = {n: src[n] for n in src.schema.names}
    cols["ts"] = src["ts"].cast(pa.timestamp("ns"))
    d = tempfile.mkdtemp(prefix="nanos_scope_")
    pq.write_table(pa.table(cols), f"{d}/events.parquet")
    return d


def test_nanos_conf_is_scoped_for_batch(spark, nanos_dir):
    from csvtool_spark.sources.parquet import read_table

    assert spark.conf.get(CONF, None) is None
    df = read_table(spark, nanos_dir, "events")
    assert spark.conf.get(CONF, None) is None  # restored before any action
    got = {r.event_id: r.ts for r in df.select("event_id", "ts").collect()}
    want = {
        r.event_id: r.ts
        for r in read_table(spark, SF_SMALL, "events")
        .select("event_id", "ts")
        .collect()
    }
    assert got == want  # bit-correct micros AFTER the restore


def test_nanos_conf_restored_on_exception(spark):
    from csvtool_spark.sources.parquet import scoped_nanos_as_long

    spark.conf.set(CONF, "false")
    try:
        with scoped_nanos_as_long(spark):
            assert spark.conf.get(CONF) == "true"
            raise RuntimeError("boom")
    except RuntimeError:
        pass
    assert spark.conf.get(CONF) == "false"  # prior value restored
    spark.conf.unset(CONF)


def test_nanos_conf_is_scoped_for_streams(spark, nanos_dir):
    from csvtool_spark.sources.parquet import read_table
    from csvtool_spark.streaming.events import stream_events_dir

    assert spark.conf.get(CONF, None) is None
    stream = stream_events_dir(spark, nanos_dir)
    assert spark.conf.get(CONF, None) is None  # restored before start()
    q = (
        stream.select("event_id", "ts")
        .writeStream.format("memory")
        .queryName("nanos_scope_mem")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(120)
    finally:
        q.stop()
    got = {
        r.event_id: r.ts.replace(tzinfo=None)
        for r in spark.sql("select event_id, ts from nanos_scope_mem").collect()
    }
    want = {
        r.event_id: r.ts
        for r in read_table(spark, SF_SMALL, "events")
        .select("event_id", "ts")
        .collect()
    }
    assert got == want  # micro-batches planned after restore read nanos right
