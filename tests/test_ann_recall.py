"""ann_recall_eval behavior (cross-engine exactness rides the
q_ann_recall catalog gate): recall bounds, the full-coverage identity,
and the persist-release contract."""

from __future__ import annotations

from pyspark.sql import functions as F

from csvtool_spark.operators.similarity import ann_recall_eval
from tests.conftest import SF_SMALL


def _emb(spark):
    return spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")


def _queries(e, n=3):
    return {
        int(r["vec_id"]): [float(x) for x in r["embedding"]]
        for r in e.filter(F.col("vec_id") < n).collect()
    }


def test_recall_bounded_and_consistent(spark):
    e = _emb(spark)
    rows = ann_recall_eval(e, "embedding", "vec_id", _queries(e), k=10).collect()
    assert len(rows) == 3
    for r in rows:
        assert 0 <= r["n_hits"] <= 10
        assert abs(r["recall"] - r["n_hits"] / 10) < 1e-12
        assert 0.0 <= r["recall"] <= 1.0


def test_recall_is_one_when_probe_covers_every_bucket(spark):
    # n_planes=1 → 2 buckets per table; multiprobe=1 flips the only bit,
    # so the probe set covers BOTH buckets — every vector is a candidate
    # and the LSH top-k equals the exact top-k exactly
    e = _emb(spark)
    rows = ann_recall_eval(
        e, "embedding", "vec_id", _queries(e), k=10, n_planes=1, n_tables=1
    ).collect()
    assert all(r["recall"] == 1.0 for r in rows)


def test_recall_release_contract(spark):
    from csvtool_spark.functions.caching import release_stages

    e = _emb(spark)
    out = ann_recall_eval(e, "embedding", "vec_id", _queries(e, 2), k=5)
    out.collect()
    assert release_stages(out) == 1  # the persisted scored stage
    assert release_stages(out) == 0  # idempotent
