"""Range-join semantics and plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from csvtool_spark.operators.rangejoin import range_join


def _frames(spark):
    pts = spark.createDataFrame(
        [(1, 5.0), (2, 10.0), (3, 25.0), (4, 99.0), (5, None)],
        "pid long, v double",
    )
    iv = spark.createDataFrame(
        [(10, 0.0, 10.0), (20, 5.0, 15.0), (30, 15.0, 15.0), (40, 90.0, 200.0)],
        "iid long, lo double, hi double",
    )
    return pts, iv


def test_range_join_halfopen_and_overlap(spark):
    pts, iv = _frames(spark)
    out = sorted(
        (r.pid, r.iid) for r in range_join(pts, iv, "v", "lo", "hi", 10.0).collect()
    )
    # v=5 hits both overlapping bands; v=10 excluded from [0,10) (half-open)
    # but included in [5,15); empty interval [15,15) matches nothing;
    # v=25 matches nothing; null v drops out
    assert out == [(1, 10), (1, 20), (2, 20), (4, 40)]


def test_range_join_left_keeps_unmatched(spark):
    pts, iv = _frames(spark)
    out = {r.pid: r.iid for r in range_join(
        pts, iv, "v", "lo", "hi", 10.0, how="left"
    ).collect() if r.pid in (3, 5)}
    assert out == {3: None, 5: None}


def test_range_join_wide_interval_spans_buckets(spark):
    pts = spark.createDataFrame([(1, 155.0)], "pid long, v double")
    iv = spark.createDataFrame([(9, 90.0, 200.0)], "iid long, lo double, hi double")
    # interval spans buckets 9..20 at width 10 — point in bucket 15 matches
    assert range_join(pts, iv, "v", "lo", "hi", 10.0).count() == 1


def test_range_join_plan_is_equi_not_nested_loop(spark):
    pts, iv = _frames(spark)
    plan = range_join(pts, iv, "v", "lo", "hi", 10.0)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "__bucket" in plan          # equi-join key is the grid bucket


def test_range_join_negative_values(spark):
    pts = spark.createDataFrame([(1, -5.0), (2, -25.0)], "pid long, v double")
    iv = spark.createDataFrame([(7, -10.0, 0.0)], "iid long, lo double, hi double")
    out = [r.pid for r in range_join(pts, iv, "v", "lo", "hi", 10.0).collect()]
    assert out == [1]


def test_range_join_ip_geolocation_demo(spark):
    # the canonical production use: IPv4 (as uint32) → CIDR-block owner.
    # /24 blocks are 256-wide intervals; bucket_width=256 aligns the grid
    # to block boundaries so each block explodes to ≤2 buckets.
    def ip(a, b, c, d):
        return (a << 24) | (b << 16) | (c << 8) | d

    blocks = spark.createDataFrame(
        [
            ("net-a", ip(10, 0, 0, 0), ip(10, 0, 1, 0)),      # 10.0.0.0/24
            ("net-b", ip(10, 0, 1, 0), ip(10, 0, 2, 0)),      # 10.0.1.0/24
            ("net-wide", ip(192, 168, 0, 0), ip(192, 169, 0, 0)),  # /16
        ],
        "owner string, lo long, hi long",
    )
    hits = spark.createDataFrame(
        [
            (1, ip(10, 0, 0, 7)),
            (2, ip(10, 0, 1, 255)),
            (3, ip(192, 168, 44, 1)),
            (4, ip(172, 16, 0, 1)),  # unassigned
        ],
        "hit_id long, ip long",
    )
    out = {
        r.hit_id: r.owner
        for r in range_join(hits, blocks, "ip", "lo", "hi", 256.0, how="left").collect()
    }
    assert out == {1: "net-a", 2: "net-b", 3: "net-wide", 4: None}
