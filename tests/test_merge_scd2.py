"""merge_upsert / scd2_apply behavior."""

from __future__ import annotations

from pyspark.sql import functions as F

from csvtool_spark.operators.merge import merge_upsert, scd2_apply


def _target(spark):
    return spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)],
        "id long, name string, v long",
    )


def test_upsert_update_insert(spark):
    updates = spark.createDataFrame(
        [(2, "B", 200), (4, "d", 40)], "id long, name string, v long"
    )
    out = {r.id: (r.name, r.v) for r in merge_upsert(
        _target(spark), updates, "id"
    ).collect()}
    assert out == {1: ("a", 10), 2: ("B", 200), 3: ("c", 30), 4: ("d", 40)}


def test_upsert_partial_columns_carry_target(spark):
    updates = spark.createDataFrame([(2, 999)], "id long, v long")
    out = {r.id: (r.name, r.v) for r in merge_upsert(
        _target(spark), updates, "id"
    ).collect()}
    assert out[2] == ("b", 999)          # name carried from target


def test_upsert_matched_null_wins(spark):
    # a matched update row replaces the column even with NULL (true MERGE
    # semantics, not coalesce)
    updates = spark.createDataFrame([(1, None, 11)], "id long, name string, v long")
    out = {r.id: r.name for r in merge_upsert(_target(spark), updates, "id").collect()}
    assert out[1] is None


def test_upsert_delete_flag(spark):
    updates = spark.createDataFrame(
        [(3, "x", 0, True), (4, "d", 40, False), (9, "zz", 0, True)],
        "id long, name string, v long, is_deleted boolean",
    )
    out = merge_upsert(_target(spark), updates, "id", delete_col="is_deleted")
    ids = sorted(r.id for r in out.collect())
    assert ids == [1, 2, 4]              # 3 deleted, 9's delete ignored


def test_upsert_single_join_plan(spark):
    updates = spark.createDataFrame([(2, "B", 200)], "id long, name string, v long")
    plan = merge_upsert(_target(spark), updates, "id")._jdf.queryExecution() \
        .executedPlan().toString()
    assert plan.count("Join") == 1


def _dim(spark):
    return spark.createDataFrame(
        [
            (1, "bronze", 0, 5, False),
            (1, "silver", 5, None, True),
            (2, "bronze", 0, None, True),
        ],
        "user long, tier string, valid_from long, valid_to long, is_current boolean",
    )


def test_scd2_new_version_closes_current(spark):
    ch = spark.createDataFrame([(1, "gold", 10)], "user long, tier string, ts long")
    out = scd2_apply(_dim(spark), ch, "user", "ts", ["tier"])
    rows = sorted(
        ((r.user, r.tier, r.valid_from, r.valid_to, r.is_current) for r in out.collect())
    )
    assert (1, "bronze", 0, 5, False) in rows          # history untouched
    assert (1, "silver", 5, 10, False) in rows         # closed at change ts
    assert (1, "gold", 10, None, True) in rows         # new current
    assert (2, "bronze", 0, None, True) in rows        # unrelated key open


def test_scd2_noop_change_dropped(spark):
    ch = spark.createDataFrame([(1, "silver", 10)], "user long, tier string, ts long")
    out = scd2_apply(_dim(spark), ch, "user", "ts", ["tier"])
    rows = {(r.user, r.tier, r.valid_to, r.is_current) for r in out.collect()}
    # current silver row stays open; no new version created
    assert (1, "silver", None, True) in rows
    assert len([r for r in rows if r[0] == 1]) == 2


def test_scd2_multiple_changes_sequence(spark):
    ch = spark.createDataFrame(
        [(1, "gold", 10), (1, "gold", 12), (1, "plat", 15)],
        "user long, tier string, ts long",
    )
    out = scd2_apply(_dim(spark), ch, "user", "ts", ["tier"])
    rows = sorted(
        (r.tier, r.valid_from, r.valid_to, r.is_current)
        for r in out.collect() if r.user == 1
    )
    assert ("gold", 10, 15, False) in rows             # dup at ts=12 dropped
    assert ("plat", 15, None, True) in rows
    assert ("silver", 5, 10, False) in rows


def test_scd2_brand_new_key(spark):
    ch = spark.createDataFrame([(7, "bronze", 3)], "user long, tier string, ts long")
    out = scd2_apply(_dim(spark), ch, "user", "ts", ["tier"])
    rows = [(r.tier, r.valid_from, r.valid_to, r.is_current)
            for r in out.collect() if r.user == 7]
    assert rows == [("bronze", 3, None, True)]


def test_upsert_null_key_update_inserts(spark):
    # a null-key update row can never equi-match — it must INSERT its own
    # values, not fabricate an all-null row
    updates = spark.createDataFrame([(None, "x", 5)], "id long, name string, v long")
    rows = merge_upsert(_target(spark), updates, "id").collect()
    assert len(rows) == 4
    nk = [r for r in rows if r.id is None]
    assert len(nk) == 1 and nk[0].name == "x" and nk[0].v == 5


def test_upsert_unmatched_delete_does_not_insert(spark):
    updates = spark.createDataFrame(
        [(9, "zz", 0, True)], "id long, name string, v long, is_deleted boolean"
    )
    out = merge_upsert(_target(spark), updates, "id", delete_col="is_deleted")
    assert sorted(r.id for r in out.collect()) == [1, 2, 3]
