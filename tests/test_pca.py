"""Fixed-point PCA power iteration: direction recovery, determinism,
degenerate inputs."""

from __future__ import annotations

import math
import random

from csvtool_spark.operators import pca


def _aniso(spark, n=300, dim=8, seed=7):
    """Synthetic cloud stretched 20x along a known direction u."""
    rng = random.Random(seed)
    u = [1.0 / math.sqrt(dim)] * dim
    rows = []
    for i in range(n):
        t = rng.gauss(0, 20.0)
        noise = [rng.gauss(0, 1.0) for _ in range(dim)]
        vec = [t * u[j] + noise[j] for j in range(dim)]
        rows.append((i, [float(x) for x in vec]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>"), u


def test_power_iteration_recovers_dominant_direction(spark):
    df, u = _aniso(spark)
    mean, v = pca.power_iteration(df, "embedding", dim=8, scale=1000, vscale=10000)
    nv = math.sqrt(sum(x * x for x in v))
    cos = abs(sum(vi * ui for vi, ui in zip(v, u)) / nv)
    assert cos > 0.95  # aligned with the planted stretched axis


def test_pca_project_deterministic(spark):
    df, _ = _aniso(spark)
    a = {r.vec_id: r.proj for r in pca.pca_project(df, "embedding", dim=8).collect()}
    b = {r.vec_id: r.proj for r in pca.pca_project(df, "embedding", dim=8).collect()}
    assert a == b
    assert all(isinstance(x, int) for x in a.values())


def test_pca_projection_separates_extremes(spark):
    df, u = _aniso(spark)
    out = pca.pca_project(df, "embedding", dim=8).collect()
    projs = [r.proj for r in out]
    # the stretched axis has std ~20*scale*vscale/|u|: spread must be wide
    assert max(projs) - min(projs) > 10_000_000


def test_pca_constant_data_does_not_crash(spark):
    rows = [(i, [1.0] * 4) for i in range(10)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    mean, v = pca.power_iteration(df, "embedding", dim=4, scale=1000, vscale=10000)
    assert mean == [1000] * 4
    assert v == [10000, 0, 0, 0]  # degenerate: start direction kept
    out = pca.project(df, "embedding", mean, v).collect()
    assert all(r.proj == 0 for r in out)  # centered constant data → zero


def test_pca_wrong_dim_raises(spark):
    rows = [(i, [1.0, 2.0]) for i in range(5)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    try:
        pca.power_iteration(df, "embedding", dim=4)
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "4-dim" in str(e)


def test_pca_oracle_zero_norm_guard_matches_spark():
    """Degenerate (constant) data: the oracle must carry the start
    direction exactly like the Spark break — not emit NULLs."""
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT i AS vec_id, 0 AS label, "
        "[1.0, 1.0, 1.0, 1.0]::FLOAT[] AS embedding FROM range(10) t(i)"
    )
    sql = pca.pca_oracle_sql(dim=4, scale=1000, vscale=10000, iters=2)
    rows = con.execute(sql).fetchall()
    assert len(rows) == 10
    assert all(r[2] == 0 for r in rows)  # proj = 0, never NULL


def test_pca_ragged_input_raises(spark):
    """One short vector among full-dim ones must be rejected up front —
    it would silently shift per-position counts vs the oracle (ADVICE r3)."""
    rows = [(0, [1.0, 2.0, 3.0]), (1, [1.0, 2.0, 3.0]), (2, [1.0, 2.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    try:
        pca.power_iteration(df, "embedding", dim=3)
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "ragged" in str(e)


def test_pca_null_vector_raises(spark):
    rows = [(0, [1.0, 2.0]), (1, None)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    try:
        pca.power_iteration(df, "embedding", dim=2)
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "null vector" in str(e)


def test_pca_overflow_envelope_raises(spark):
    """Huge values put N·(2Xs)·(dim·2Xs·vs) past 2^63 even with few rows —
    the precheck must refuse rather than wrap (VERDICT r3 #2)."""
    rows = [(i, [1.0e6, -1.0e6]) for i in range(10)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    try:
        pca.power_iteration(df, "embedding", dim=2)
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "overflow envelope" in str(e)
        assert "sample" in str(e)


def test_pca_envelope_boundary_is_tight(spark):
    """Just inside the envelope fits fine; the same data with vscale bumped
    past the bound raises — the check is the documented formula, not a
    vibe."""
    dim, scale = 2, 1000
    rows = [(i, [1.0, -1.0]) for i in range(8)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    # x_q = ceil(1.0*1000)+1 = 1001; comp=2002; bound = N*comp*(dim*comp*vs)
    # fits iff 8*2002*2*2002*vs < 2^63  →  vs < ~1.44e11
    mean, v = pca.power_iteration(df, "embedding", dim=dim, scale=scale,
                                  vscale=100_000_000_000, iters=1)
    assert len(v) == dim
    try:
        pca.power_iteration(df, "embedding", dim=dim, scale=scale,
                            vscale=200_000_000_000, iters=1)
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "overflow envelope" in str(e)


def test_pca_nonfinite_value_raises(spark):
    rows = [(0, [1.0, float("nan")]), (1, [1.0, 2.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    try:
        pca.power_iteration(df, "embedding", dim=2)
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "non-finite" in str(e)


def test_pca_null_element_raises(spark):
    """[1.0, NULL, 2.0] passes the size check (array_max skips nulls) —
    the element-level null count must still reject it (review r4)."""
    rows = [(0, [1.0, None, 2.0]), (1, [1.0, 2.0, 3.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    try:
        pca.power_iteration(df, "embedding", dim=3)
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "null ELEMENTS" in str(e)
