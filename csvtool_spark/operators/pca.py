"""Fixed-point PCA power iteration over embedding columns: the top
principal direction and per-vector projections, computed with exact
integer aggregation so every run — and the DuckDB oracle — produces
bit-identical results.

Real pipelines use the top principal components for embedding whitening,
ABBA-style outlier pruning, and the SemDeDup preprocessing step. Spark has
no distributed eigensolver in `pyspark.sql`; power iteration *is* the
scalable algorithm: each step is one linear pass (a dot product per row +
a per-dimension column sum), and only the dim-sized direction vector ever
reaches the driver.

Determinism strategy (the repo's fixed-point pattern, cf. integer
PageRank in ``operators/graph.py``):

- embeddings quantize to int64 on a ``scale`` grid (round-half-away, the
  shared Spark/DuckDB semantics);
- centering subtracts the rounded integer mean (exact int sums → identical
  double division → identical rounding);
- per-iteration sums ``s_j = Σ_i c_ij · (c_i · v)`` are exact int64
  arithmetic — invariant to partitioning/aggregation order;
- the driver renormalizes ``s`` to an integer direction on a ``vscale``
  grid using an explicit ``floor(|x| + 0.5)`` half-away formula (NOT
  Python's banker's ``round``), the same formula the oracle SQL uses.

Value-range bound (ENFORCED, not just documented): with ``|x| ≤ X`` a
centered component is ≤ ``2·X·scale``, the int64 row dot is
≤ ``dim · 2·X·scale · vscale`` and the per-dimension sum is
≤ ``N · 2·X·scale · dim·2·X·scale·vscale`` — for X=1, scale=1e3,
vscale=1e4, dim=64 that stays inside int64 up to N ≈ 3.6e6 rows (half
that envelope at X=1 without the centering factor is the ≈1.4e7 figure
earlier rounds documented). ``power_iteration`` now measures ``N`` and
``X`` in its validation pass and raises a clear ``ValueError`` before
fitting when the envelope is exceeded (silent wraparound — or an ANSI
overflow error mid-job — is what a 100× scale-up would otherwise hit);
the caller's remedies are sampling the direction fit (pass
``df.sample(...)`` to ``power_iteration`` and the full corpus to
``project`` — the projection pass itself cannot overflow its
``dim · 2·X·scale · vscale`` bound without the N factor) or lowering
``scale``/``vscale``.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from csvtool_spark.functions.fixedpoint import half_away




def _quantized(vec_col: str, scale: int):
    return F.transform(
        F.col(vec_col),
        lambda x: F.round(x.cast("double") * scale, 0).cast("long"),
    )


def _dot(arr, lit_vec: list[int]):
    vlit = F.array(*[F.lit(int(v)) for v in lit_vec])
    return F.aggregate(
        F.zip_with(arr, vlit, lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def power_iteration(
    df: DataFrame,
    vec_col: str,
    dim: int,
    scale: int = 1000,
    vscale: int = 10000,
    iters: int = 2,
) -> tuple[list[int], list[int]]:
    """Fit: returns ``(mean, direction)`` — the integer mean vector on the
    ``scale`` grid and the top-direction vector on the ``vscale`` grid.

    Passes over the data: one cheap validation agg (shape + overflow
    envelope), one for the mean, one per iteration for the per-dimension
    sums. Each collect is dim-sized (64 longs) or a single row, never rows.

    Raises ``ValueError`` on ragged/null vectors (a short vector among
    full-dim ones would silently shift per-position counts and diverge
    from the oracle's NULL-slot counting) and when ``N``/``max|x|`` exceed
    the int64 envelope documented in the module docstring (beyond it the
    exact-integer guarantee is void — sample the fit or lower the grids).
    """
    chk = df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(vec_col).alias("n_vecs"),
        F.min(F.size(F.col(vec_col))).alias("d_min"),
        F.max(F.size(F.col(vec_col))).alias("d_max"),
        F.max(
            F.array_max(F.transform(F.col(vec_col), lambda x: F.abs(x.cast("double"))))
        ).alias("x_max"),
        # array_max SKIPS null elements, so [1.0, NULL, 2.0] would sail
        # through the size check — count element-level nulls explicitly
        F.sum(
            F.when(
                F.exists(F.col(vec_col), lambda x: x.isNull()), 1
            ).otherwise(0)
        ).alias("n_null_elem"),
    ).collect()[0]
    n_rows = int(chk["n_rows"])
    if n_rows == 0:
        raise ValueError("power_iteration: empty input")
    if chk["n_vecs"] != n_rows:
        raise ValueError(
            f"power_iteration: {n_rows - int(chk['n_vecs'])} null vector(s) in "
            f"'{vec_col}' — drop or impute them before fitting"
        )
    if chk["d_min"] != dim or chk["d_max"] != dim:
        raise ValueError(
            f"power_iteration: expected uniform {dim}-dim vectors, saw sizes "
            f"[{chk['d_min']}, {chk['d_max']}] — ragged input would diverge "
            f"from the oracle's per-position counts"
        )
    if int(chk["n_null_elem"]) > 0:
        raise ValueError(
            f"power_iteration: {int(chk['n_null_elem'])} vector(s) contain "
            f"null ELEMENTS — quantization would silently drop their "
            f"positions; impute or drop those rows first"
        )
    # int64 envelope: centered component ≤ 2·X·scale, row dot ≤ dim·that·vscale,
    # per-dimension sum ≤ N·that·dot — all exact-int math, so enforce exactly.
    x_max = float(chk["x_max"])
    if not math.isfinite(x_max):
        raise ValueError(
            f"power_iteration: non-finite value in '{vec_col}' (max|x|={x_max}) "
            f"— quantization to the int64 grid is undefined for NaN/Infinity"
        )
    x_q = math.ceil(x_max * scale) + 1  # +1 rounding headroom
    comp_bound = 2 * x_q
    dot_bound = dim * comp_bound * vscale
    sum_bound = n_rows * comp_bound * dot_bound
    if sum_bound >= 2**63:
        max_n = (2**63 - 1) // (comp_bound * dot_bound)
        raise ValueError(
            f"power_iteration: int64 overflow envelope exceeded "
            f"(N={n_rows}, max|x|≈{float(chk['x_max']):.4g}, scale={scale}, "
            f"vscale={vscale}, dim={dim} → bound {sum_bound:.3e} ≥ 2^63). "
            f"Fit on a sample (≤{max_n} rows at this value range, e.g. "
            f"df.sample(...), then project the full corpus) or lower "
            f"scale/vscale."
        )

    q = df.select(_quantized(vec_col, scale).alias("__q"))
    comp = q.select(F.posexplode("__q").alias("__j", "__x"))
    stats = (
        comp.groupBy("__j").agg(F.sum("__x").alias("s"), F.count("*").alias("n"))
    ).collect()
    by_j = {r["__j"]: r for r in stats}
    if len(by_j) != dim:
        raise ValueError(f"expected {dim}-dim vectors, saw positions {sorted(by_j)}")
    mean = [half_away(float(by_j[j]["s"]) / by_j[j]["n"]) for j in range(dim)]

    mlit = F.array(*[F.lit(int(m)) for m in mean])
    centered = q.select(
        F.zip_with(F.col("__q"), mlit, lambda a, b: a - b).alias("__c")
    ).persist()
    try:
        v = [vscale] + [0] * (dim - 1)  # deterministic start: e1 on the grid
        for _ in range(iters):
            d = centered.select(F.col("__c"), _dot(F.col("__c"), v).alias("__d"))
            rows = (
                d.select(F.posexplode("__c").alias("__j", "__x"), "__d")
                .groupBy("__j")
                .agg(F.sum(F.col("__x") * F.col("__d")).alias("s"))
            ).collect()
            s = [0] * dim
            for r in rows:
                s[r["__j"]] = r["s"]
            nrm = math.sqrt(float(sum(x * x for x in s)))
            if nrm == 0.0:
                break  # degenerate (constant data): keep current direction
            v = [half_away(float(x) / nrm * vscale) for x in s]
    finally:
        centered.unpersist()
    return mean, v


def project(
    df: DataFrame,
    vec_col: str,
    mean: list[int],
    direction: list[int],
    scale: int = 1000,
    out_col: str = "proj",
) -> DataFrame:
    """One linear pass: exact int64 projection of every (centered,
    quantized) vector onto the fitted direction — appended as ``out_col``."""
    mlit = F.array(*[F.lit(int(m)) for m in mean])
    c = F.zip_with(_quantized(vec_col, scale), mlit, lambda a, b: a - b)
    return df.withColumn(out_col, _dot(c, direction))


def pca_project(
    df: DataFrame,
    vec_col: str,
    dim: int,
    scale: int = 1000,
    vscale: int = 10000,
    iters: int = 2,
    out_col: str = "proj",
) -> DataFrame:
    """Fit + project in one call (the catalog entry's shape)."""
    mean, v = power_iteration(df, vec_col, dim, scale, vscale, iters)
    return project(df, vec_col, mean, v, scale, out_col)


def pca_oracle_sql(
    dim: int,
    scale: int = 1000,
    vscale: int = 10000,
    iters: int = 2,
    table: str = "embeddings",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    extra_cols: str = "label",
) -> str:
    """DuckDB CTE twin: the same quantize → center → unrolled power
    iteration → project pipeline, with the identical half-away floor
    formula at each renormalization. All sums exact (HUGEINT), cast back
    to BIGINT at the edges."""

    def half_away(expr: str) -> str:
        return (
            f"CAST(CASE WHEN {expr} >= 0 THEN floor(({expr}) + 0.5) "
            f"ELSE -floor(-({expr}) + 0.5) END AS BIGINT)"
        )

    its = []
    prev_v = None
    for t in range(1, iters + 1):
        if prev_v is None:
            d_expr = f"sum(CASE WHEN j = 1 THEN cx * {vscale} ELSE 0 END)"
            d_src = "c"
            its.append(
                f"d{t} AS (SELECT {id_col}, {d_expr} AS d FROM {d_src} GROUP BY {id_col})"
            )
        else:
            its.append(
                f"d{t} AS (SELECT {id_col}, sum(cx * vj) AS d "
                f"FROM c JOIN {prev_v} USING (j) GROUP BY {id_col})"
            )
        its.append(
            f"s{t} AS (SELECT j, CAST(sum(cx * d) AS BIGINT) AS s "
            f"FROM c JOIN d{t} USING ({id_col}) GROUP BY j)"
        )
        its.append(
            # s*s overflows INT64 — square in HUGEINT, exact, then to DOUBLE
            f"n{t} AS (SELECT sqrt(CAST(sum(CAST(s AS HUGEINT) * s) AS DOUBLE)) AS nrm FROM s{t})"
        )
        ratio = f"CAST(s AS DOUBLE) / nrm * {vscale}"
        # zero-norm guard mirrors the Spark break-and-keep-direction: carry
        # the previous direction forward (a zero s is a fixed point, so
        # continuing ≡ breaking)
        if prev_v is None:
            keep = f"CASE WHEN j = 1 THEN {vscale} ELSE 0 END"
            src = f"FROM s{t}, n{t}"
        else:
            keep = f"{prev_v}.vj"
            src = f"FROM s{t} JOIN {prev_v} USING (j), n{t}"
        its.append(
            f"v{t} AS (SELECT j, CASE WHEN nrm = 0 THEN {keep} "
            f"ELSE {half_away(ratio)} END AS vj {src})"
        )
        prev_v = f"v{t}"
    iter_sql = ",\n    ".join(its)
    sel_extra = f", {extra_cols}" if extra_cols else ""
    return f"""
    WITH q AS (
      SELECT {id_col}{sel_extra},
             list_transform({vec_col}, x -> CAST(round(CAST(x AS DOUBLE) * {scale}) AS BIGINT)) AS qv
      FROM {table}
    ),
    comp AS (
      SELECT {id_col}, unnest(range(1, {dim} + 1)) AS j, qv FROM q
    ),
    xs AS (SELECT {id_col}, j, qv[j] AS x FROM comp),
    m AS (
      SELECT j, {half_away("CAST(sum(x) AS DOUBLE) / count(*)")} AS mj
      FROM xs GROUP BY j
    ),
    c AS (SELECT xs.{id_col}, xs.j, x - mj AS cx FROM xs JOIN m USING (j)),
    {iter_sql},
    pr AS (
      SELECT c.{id_col}, CAST(sum(cx * vj) AS BIGINT) AS proj
      FROM c JOIN {prev_v} USING (j) GROUP BY c.{id_col}
    )
    SELECT q.{id_col}{sel_extra}, pr.proj FROM q JOIN pr USING ({id_col})
    """
