"""Dual-lane sampling coins (round-6, VERDICT r5 #3).

``priority_sample`` / ``dsir_sample`` default to the vectorized JVM
``F.log`` lane (whole-stage codegen — the 100 TB path) and keep the
glibc ``functions.libm`` kernels as the ORACLE-PAIRED lane.  These
tests pin (a) the lanes produce identical rows on the catalog corpus,
(b) the default plan contains no Python evaluation node at all, and
(c) unknown lanes fail loudly.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def _docs(spark):
    return spark.read.parquet(f"{SF_SMALL}/documents.parquet")


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_priority_sample_lanes_agree_on_catalog(spark):
    from csvtool_spark.operators.sampling import priority_sample

    d = _docs(spark)
    jvm = priority_sample(d, "n_chars", "doc_id", k=100, coin_lane="jvm")
    lib = priority_sample(d, "n_chars", "doc_id", k=100, coin_lane="libm")
    assert _rows(jvm) == _rows(lib)


def test_dsir_sample_lanes_agree_on_catalog(spark):
    from csvtool_spark.operators.importance import dsir_sample

    d = _docs(spark)
    out = {}
    for lane in ("jvm", "libm"):
        out[lane] = _rows(
            dsir_sample(
                d, "text", "doc_id", "lang = 'en'", k=80, n_buckets=64,
                hash_family="md5", coin_lane=lane,
            )
        )
    assert out["jvm"] == out["libm"]


def test_priority_sample_default_lane_is_pure_jvm(spark):
    """The default plan must be a fused projection + TakeOrderedAndProject
    with NO Python evaluation (Arrow or row-at-a-time) — per-element
    Python math.log on the per-row hot path was the round-5 scale
    regression this lane split removes."""
    from csvtool_spark.operators.sampling import priority_sample

    d = _docs(spark)
    plan = (
        priority_sample(d, "n_chars", "doc_id", k=100)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_dsir_default_lane_no_python_eval(spark):
    from csvtool_spark.operators.importance import dsir_sample

    d = _docs(spark)
    lazy = dsir_sample(
        d, "text", "doc_id", "lang = 'en'", k=40, n_buckets=64,
        materialize=False,
    )
    plan = lazy._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    getattr(lazy, "_dsir_staged", None)  # cache released by caller contract


def test_libm_lane_still_uses_kernel(spark):
    from csvtool_spark.operators.sampling import priority_sample

    d = _docs(spark)
    plan = (
        priority_sample(d, "n_chars", "doc_id", k=10, coin_lane="libm")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "ArrowEvalPython" in plan or "BatchEvalPython" in plan


def test_unknown_coin_lane_rejected(spark):
    from csvtool_spark.operators.importance import dsir_sample
    from csvtool_spark.operators.sampling import priority_sample

    d = _docs(spark)
    with pytest.raises(ValueError, match="coin_lane"):
        priority_sample(d, "n_chars", "doc_id", k=5, coin_lane="numpy").collect()
    with pytest.raises(ValueError, match="coin_lane"):
        dsir_sample(d, "text", "doc_id", "lang = 'en'", k=5,
                    coin_lane="numpy")
    # validated BEFORE the gumbel branch: gumbel=False must reject too
    with pytest.raises(ValueError, match="coin_lane"):
        dsir_sample(d, "text", "doc_id", "lang = 'en'", k=5,
                    gumbel=False, coin_lane="numpy")
