"""Naive Bayes text classification: train by aggregation, score by
broadcast join — the distributed analog of the fastText-style quality /
language classifiers real pre-training pipelines run over every document
(CCNet, GPT-3 quality filtering).

Design for 100 TB:

- **Train** is two linear passes over the corpus: one explode + hash
  aggregation on ``token`` (map-side partial combine, one shuffle) to get
  per-class token counts, then a corpus top-V vocabulary via
  ``TakeOrderedAndProject`` (no global window).  The resulting model is a
  bounded artifact — V rows × C classes — independent of corpus size.
- **Score** is one linear pass: explode + broadcast join against the model
  (the model never shuffles the corpus side) + one hash aggregation on
  ``doc_id``.  Per-occurrence OOV handling is a ``coalesce`` with the
  per-class default, so no second pass is needed.
- All log-probabilities are scaled to **fixed-point int64**
  (``round(ln(p) * 1e6)``), so score sums are exact integer arithmetic —
  invariant to aggregation order, reproducible bit-for-bit in DuckDB, and
  immune to float-summation non-determinism across partitionings.
- The log itself is computed **driver-side** (Python ``math.log`` +
  ``half_away``) from the collected integer counts and shipped into the
  model as literal int64s — never via Spark's ``F.log``.  This is a
  determinism HARDENING measure: JVM ``Math.log`` is only 1-ulp-accurate
  and could in principle round a half-grid-adjacent value differently
  from the glibc ``log`` DuckDB and Python share (the BM25 ``idf6``
  pattern).  Causal record (round-6 correction): the rounds-4/5
  ``q_nb_classify`` gate failures attributed to this were in fact a
  TYPE leak — ``nb_oracle_sql``'s uncast ``sum()`` returned DuckDB
  HUGEINT/decimal128 where Spark emits int64, mismatching a
  type-sensitive hash on identical values; measured boundary distances
  on the catalog grids are ~1e6 ulps, so no real libm pair flips them.

Per-doc score magnitude is bounded by ``n_tokens * |min logp| * 1e6``
(≈ 5e9 for 500-token docs) — far inside int64 even for million-token
documents.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from csvtool_spark.functions.fixedpoint import half_away

#: Fixed-point scale for log-probabilities.
LOGP_SCALE = 1_000_000


def _logp_fixed(num: int, den: int) -> int:
    """``round(ln(num/den) * 1e6)`` as int — driver-side fixed-point
    log-prob on the glibc-libm / half-away grid shared with DuckDB."""
    return half_away(math.log(num / den) * LOGP_SCALE)


@dataclass
class NBModel:
    """A trained model: bounded, broadcastable.

    ``tokens`` has one row per vocabulary token with a ``lp_<class>``
    int64 column per class; ``priors``/``defaults`` map class → fixed-point
    prior / unseen-token log-prob.
    """

    classes: list[str]
    tokens: DataFrame
    priors: dict[str, int]
    defaults: dict[str, int]


def nb_train(
    df: DataFrame,
    text_col: str = "text",
    label_col: str = "lang",
    vocab_size: int = 2000,
) -> NBModel:
    """Train multinomial Naive Bayes with Laplace smoothing.

    Vocabulary is the corpus top-``vocab_size`` whitespace tokens by total
    count (ties broken by token string — deterministic).  Class-conditional
    probabilities use add-one smoothing over the *in-vocabulary* token
    totals: ``p(t|c) = (cnt_tc + 1) / (tok_c + V)``; unseen/OOV tokens get
    ``1 / (tok_c + V)``.
    """
    # one corpus pass yields both the class list and the prior counts
    by_class = {
        r["_lbl"]: r["n"]
        for r in df.groupBy(F.col(label_col).alias("_lbl"))
        .agg(F.count("*").alias("n"))
        .collect()
        if r["_lbl"] is not None
    }
    classes = sorted(by_class)

    tok = df.select(
        F.col(label_col).alias("_lbl"),
        F.explode(F.split(F.col(text_col), " ")).alias("token"),
    )
    counts = tok.groupBy("token").agg(
        F.count("*").alias("c_all"),
        *[
            F.count(F.when(F.col("_lbl") == c, 1)).alias(f"c_{i}")
            for i, c in enumerate(classes)
        ],
    )
    vocab = counts.orderBy(F.desc("c_all"), F.asc("token")).limit(vocab_size).persist()
    try:
        totals = vocab.agg(
            F.count("*").alias("v"),
            *[F.sum(f"c_{i}").alias(f"t_{i}") for i in range(len(classes))],
        ).collect()[0]
        v = totals["v"]
        tok_c = [totals[f"t_{i}"] or 0 for i in range(len(classes))]
        # oracle-parity precondition: int/int == DOUBLE/DOUBLE only while
        # both operands are exact doubles (see nb_oracle_sql docstring)
        if any(t + v >= 2**53 for t in tok_c) or sum(by_class.values()) >= 2**53:
            raise ValueError(
                "nb_train: token/doc counts exceed 2^53 — fixed-point "
                "log-prob grid no longer bit-matches the DOUBLE-division "
                "oracle; shard the corpus or rescale"
            )

        # materialize the bounded model locally (scoring must never re-run
        # the training aggregation) and compute every lp_i DRIVER-SIDE:
        # only the integer counts leave Spark; the log + rounding happen in
        # Python so the Spark model and the DuckDB oracle consume identical
        # int64 literals (JVM Math.log is NOT ulp-identical to glibc log)
        count_rows = vocab.select(
            "token", *[f"c_{i}" for i in range(len(classes))]
        ).collect()
        model_rows = [
            tuple(
                [r["token"]]
                + [
                    _logp_fixed(int(r[f"c_{i}"]) + 1, tok_c[i] + v)
                    for i in range(len(classes))
                ]
            )
            for r in count_rows
        ]
        schema = "token string" + "".join(
            f", lp_{i} long" for i in range(len(classes))
        )
        model_tokens = df.sparkSession.createDataFrame(model_rows, schema)
    finally:
        vocab.unpersist()

    n_total = sum(by_class.values())

    # half_away, not round(): priors/defaults must round exactly like the
    # Spark/DuckDB fixed-point log-probs
    priors = {c: _logp_fixed(by_class[c], n_total) for c in classes}
    defaults = {c: _logp_fixed(1, tok_c[i] + v) for i, c in enumerate(classes)}
    return NBModel(classes=classes, tokens=model_tokens, priors=priors, defaults=defaults)


def nb_score(
    df: DataFrame,
    model: NBModel,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score every document: per-class fixed-point log-posterior + argmax.

    One explode, one broadcast join, one hash agg on ``id_col``.  Documents
    with no tokens (null/empty text) fall back to the prior-only argmax via
    the left join from ``df``.  Ties in the argmax break toward the
    lexicographically first class — same rule as the oracle SQL.
    """
    k = len(model.classes)
    occ = df.select(
        id_col, F.explode(F.split(F.col(text_col), " ")).alias("token")
    )
    joined = occ.join(F.broadcast(model.tokens), "token", "left")
    sums = joined.groupBy(id_col).agg(
        *[
            F.sum(
                F.coalesce(F.col(f"lp_{i}"), F.lit(model.defaults[model.classes[i]]))
            ).alias(f"s_{i}")
            for i in range(k)
        ]
    )
    out = df.join(sums, id_col, "left")
    score_cols = [
        (F.coalesce(F.col(f"s_{i}"), F.lit(0)) + F.lit(model.priors[c])).alias(
            f"score_{c}"
        )
        for i, c in enumerate(model.classes)
    ]
    out = out.select(id_col, *[c for c in df.columns if c != id_col], *score_cols)
    # greatest() needs ≥2 columns — a one-class model (degenerate but legal:
    # an all-one-label shard) short-circuits to its only score
    if k == 1:
        best = F.col(f"score_{model.classes[0]}")
    else:
        best = F.greatest(*[F.col(f"score_{c}") for c in model.classes])
    pred = F.lit(None).cast("string")
    # first class (sorted order) matching the max wins — fold from the last
    # class backward so earlier classes override on ties
    for c in reversed(model.classes):
        pred = F.when(F.col(f"score_{c}") == best, F.lit(c)).otherwise(pred)
    return out.withColumn("pred", pred).withColumn("score_pred", best)


def _nb_scored_ctes(
    cls: list[str],
    vocab_size: int,
    table: str,
    text_col: str,
    label_col: str,
    id_col: str,
) -> tuple[str, str, str]:
    """The shared train+score CTE chain ending at ``scored`` (one row per
    doc with per-class ``score_<c>`` int64 columns), plus the ``greatest``
    argument list and the first-class-wins ``pred`` CASE body — consumed
    by ``nb_oracle_sql`` and ``nb_calibration_oracle_sql``."""
    c_cols = ",\n             ".join(
        f"count(*) FILTER (_lbl = '{c}') AS c_{i}" for i, c in enumerate(cls)
    )
    t_cols = ", ".join(f"sum(c_{i}) AS t_{i}" for i in range(len(cls)))
    lp_cols = ",\n             ".join(
        f"CAST(round(ln(CAST(c_{i} + 1 AS DOUBLE) / CAST(t_{i} + v AS DOUBLE))"
        f" * {LOGP_SCALE}) AS BIGINT) AS lp_{i}"
        for i in range(len(cls))
    )
    d_cols = ", ".join(
        f"CAST(round(ln(CAST(1 AS DOUBLE) / CAST(t_{i} + v AS DOUBLE))"
        f" * {LOGP_SCALE}) AS BIGINT) AS d_{i}"
        for i in range(len(cls))
    )
    # denominator counts labeled docs only — matches nb_train's sum(by_class)
    p_cols = ", ".join(
        f"CAST(round(ln(CAST(count(*) FILTER ({label_col} = '{c}') AS DOUBLE) / "
        f"CAST(count(*) FILTER ({label_col} IS NOT NULL) AS DOUBLE))"
        f" * {LOGP_SCALE}) AS BIGINT) AS p_{i}"
        for i, c in enumerate(cls)
    )
    # CAST back to BIGINT: DuckDB sum() over BIGINT returns HUGEINT, which
    # surfaces as decimal128 in the result schema — a type-sensitive hash
    # then mismatches Spark's int64 even though every VALUE is identical.
    # This exact leak kept q_nb_classify red in rounds 4-5 (the repo rule:
    # cast sums back to BIGINT at CTE edges).
    s_cols = ",\n             ".join(
        f"CAST(sum(coalesce(m.lp_{i}, d.d_{i})) AS BIGINT) AS s_{i}"
        for i in range(len(cls))
    )
    score_cols = ",\n           ".join(
        f"coalesce(s.s_{i}, 0) + p.p_{i} AS score_{c}" for i, c in enumerate(cls)
    )
    greatest = ", ".join(f"score_{c}" for c in cls)
    pred_case = "\n                ".join(
        f"WHEN score_{c} = greatest({greatest}) THEN '{c}'" for c in cls
    )
    with_body = f"""
    WITH tok AS (
      SELECT {id_col}, {label_col} AS _lbl, unnest(string_split({text_col}, ' ')) AS token
      FROM {table}
    ),
    counts AS (
      SELECT token, count(*) AS c_all,
             {c_cols}
      FROM tok GROUP BY token
    ),
    vocab AS (
      SELECT * FROM counts ORDER BY c_all DESC, token ASC LIMIT {vocab_size}
    ),
    tot AS (SELECT count(*) AS v, {t_cols} FROM vocab),
    model AS (
      SELECT token,
             {lp_cols}
      FROM vocab, tot
    ),
    defaults AS (SELECT {d_cols} FROM tot),
    priors AS (SELECT {p_cols} FROM {table}),
    sums AS (
      SELECT t.{id_col},
             {s_cols}
      FROM tok t LEFT JOIN model m USING (token), defaults d
      GROUP BY t.{id_col}
    ),
    scored AS (
      SELECT doc.{id_col}, doc.{label_col},
           {score_cols}
      FROM {table} doc LEFT JOIN sums s USING ({id_col}), priors p
    )"""
    return with_body, greatest, pred_case


def nb_oracle_sql(
    classes: list[str],
    vocab_size: int = 2000,
    table: str = "documents",
    text_col: str = "text",
    label_col: str = "lang",
    id_col: str = "doc_id",
) -> str:
    """DuckDB CTE twin of ``nb_train`` + ``nb_score`` — same vocabulary
    tie-break, same fixed-point rounding, same coalesce-per-occurrence OOV
    rule, same first-class-wins argmax.  Integer score sums make the
    comparison exact.

    Every ``ln`` argument is an explicit DOUBLE/DOUBLE division — DuckDB
    parses bare decimal literals as DECIMAL and a DECIMAL quotient can
    differ from IEEE double division in the last ulp, which flips the
    rounded grid.  With the casts, DuckDB feeds glibc ``log`` the exact
    double Python's ``int / int`` produces in ``nb_train``, so the
    engine's driver-computed literal grid and this oracle agree
    bit-for-bit — PROVIDED every count stays below 2^53: Python's
    ``int / int`` rounds the exact rational once, while the oracle's
    ``DOUBLE / DOUBLE`` rounds each operand first, and the two only
    coincide while the operands are exactly representable.  ``nb_train``
    asserts the precondition (token totals < 2^53 ≈ 9e15 — ~18 PB of
    single-byte tokens, comfortably above the 100 TB design point)."""
    with_body, greatest, pred_case = _nb_scored_ctes(
        sorted(classes), vocab_size, table, text_col, label_col, id_col
    )
    return f"""{with_body}
    SELECT {id_col}, {label_col},
           CASE {pred_case} END AS pred,
           CAST(greatest({greatest}) AS BIGINT) AS score_pred
    FROM scored
    """


def nb_score_map(
    df: DataFrame,
    model: NBModel,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Map-only scoring twin of ``nb_score``: the bounded model becomes a
    LITERAL map (token → per-class log-prob array) and each row folds its
    tokens through it — no explode, no join, no aggregation shuffle, so
    the plan is a pure projection. That makes it legal in a stateless
    streaming micro-batch (no watermark needed) and fusable into any scan.

    Trade-off vs ``nb_score``: the fold runs on Spark's interpreted HOF
    path, so for huge BATCH corpora the explode+broadcast-join form wins;
    this form wins where a shuffle is unavailable (streams) or unwanted.
    Same fixed-point integer arithmetic — results are identical."""
    rows = model.tokens.collect()
    k = len(model.classes)
    keys = [r["token"] for r in rows]
    vals = [[int(r[f"lp_{i}"]) for i in range(k)] for r in rows]
    lp_map = F.map_from_arrays(F.lit(keys), F.lit(vals))
    defaults = F.array(*[F.lit(model.defaults[c]).cast("long") for c in model.classes])
    priors = F.array(*[F.lit(model.priors[c]).cast("long") for c in model.classes])
    folded = F.aggregate(
        F.split(F.col(text_col), " "),
        priors,
        lambda acc, t: F.zip_with(
            acc, F.coalesce(lp_map[t], defaults), lambda a, b: a + b
        ),
    )
    scores = F.coalesce(folded, priors)  # null text → prior-only
    best = F.array_max(scores)
    pred = F.element_at(
        F.lit(model.classes), F.array_position(scores, best).cast("int")
    )
    out = df.withColumn("__scores", scores)
    for i, c in enumerate(model.classes):
        out = out.withColumn(f"score_{c}", F.col("__scores")[i])
    return (
        out.withColumn("pred", pred)
        .withColumn("score_pred", best)
        .drop("__scores")
    )


def save_model(model: NBModel, path: str) -> None:
    """Persist a trained model as a parquet dataset (works on any Hadoop
    filesystem — local, HDFS, object stores): ``<path>/tokens`` holds the
    vocabulary log-probs, ``<path>/meta`` one row per class with its prior
    and default. Train-once/score-many across jobs needs the artifact on
    shared storage, not in a driver's memory."""
    spark = model.tokens.sparkSession
    # materialize BEFORE writing: a load_model-loaded tokens DataFrame lazily
    # reads from this very path — mode("overwrite") would truncate it mid-scan
    # (save-back-to-own-path crashes and destroys the artifact otherwise)
    local = spark.createDataFrame(model.tokens.collect(), model.tokens.schema)
    # bounded artifacts: one part file, not one per default-parallelism slot
    local.coalesce(1).write.mode("overwrite").parquet(f"{path}/tokens")
    meta = spark.createDataFrame(
        [
            (i, c, model.priors[c], model.defaults[c])
            for i, c in enumerate(model.classes)
        ],
        "idx int, class string, prior long, dflt long",
    )
    meta.coalesce(1).write.mode("overwrite").parquet(f"{path}/meta")


def load_model(spark, path: str) -> NBModel:
    """Inverse of ``save_model`` — scoring-ready (token table re-read from
    parquet is bounded; it broadcasts/collects exactly like a fresh one)."""
    meta = sorted(
        ((r["idx"], r["class"], r["prior"], r["dflt"])
         for r in spark.read.parquet(f"{path}/meta").collect())
    )
    classes = [c for _, c, _, _ in meta]
    return NBModel(
        classes=classes,
        tokens=spark.read.parquet(f"{path}/tokens"),
        priors={c: p for _, c, p, _ in meta},
        defaults={c: d for _, c, _, d in meta},
    )


# --- calibration report ----------------------------------------------------


def nb_calibration(
    df: DataFrame,
    model: NBModel,
    text_col: str = "text",
    id_col: str = "doc_id",
    label_col: str = "lang",
    n_buckets: int = 8,
    width: int = LOGP_SCALE,
) -> DataFrame:
    """Margin-bucketed accuracy report — the calibration check a
    classifier-driven filtering pipeline owes its operators (is a
    high-margin prediction actually more reliable on THIS corpus, and
    where should the keep/drop margin cut sit?).

    Each labeled document lands in bucket ``min(margin // width,
    n_buckets-1)`` where ``margin = score_pred - second_best_score`` —
    an exact int64 difference of fixed-point log-posteriors (``width``
    defaults to ``LOGP_SCALE`` = one nat).  Per bucket: document count,
    correct-prediction count, and accuracy.  All arithmetic is integer
    until the final accuracy division, so the DuckDB twin is hash-exact.

    One extra projection over ``nb_score``'s plan (explode + broadcast
    model join + one hash agg) plus one bounded ``n_buckets``-row
    aggregation — no new corpus shuffle beyond the score itself.
    """
    k = len(model.classes)
    if k < 2:
        raise ValueError("nb_calibration: needs >= 2 classes for a margin")
    if n_buckets < 1 or width < 1:
        raise ValueError("nb_calibration: n_buckets and width must be >= 1")
    scored = nb_score(df, model, text_col, id_col)
    arr = F.array_sort(
        F.array(*[F.col(f"score_{c}") for c in model.classes])
    )
    second = F.element_at(arr, k - 1)  # ascending sort: k-1 = second best
    lab = scored.filter(F.col(label_col).isNotNull()).select(
        (F.col("score_pred") - second).alias("__m"),
        (F.col("pred") == F.col(label_col)).cast("long").alias("__ok"),
    )
    # integer `div`, not double `/`+floor: a double quotient can round
    # across an integer boundary for extreme widths; the oracle's `//` is
    # exact integer arithmetic and this must match it bit-for-bit
    # (margins are >= 0, so truncating div == floor div)
    bucket = F.least(
        F.expr(f"__m div {int(width)}"),
        F.lit(int(n_buckets) - 1).cast("long"),
    )
    return (
        lab.select(
            bucket.alias("bucket"),
            "__ok",
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("__ok").alias("n_correct"),
        )
        .select(
            "bucket",
            F.col("n").cast("long").alias("n"),
            F.col("n_correct").cast("long").alias("n_correct"),
            (F.col("n_correct").cast("double") / F.col("n").cast("double")).alias(
                "acc"
            ),
        )
    )


def nb_calibration_oracle_sql(
    classes: list[str],
    vocab_size: int = 2000,
    n_buckets: int = 8,
    width: int = LOGP_SCALE,
    table: str = "documents",
    text_col: str = "text",
    label_col: str = "lang",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of ``nb_calibration``: the shared train+score CTE
    chain, the same ascending-sort second-best margin, integer floor-div
    bucketing with the same cap, and BIGINT-cast counts (the HUGEINT
    rule)."""
    cls = sorted(classes)
    k = len(cls)
    if k < 2:
        raise ValueError("nb_calibration_oracle_sql: needs >= 2 classes")
    with_body, greatest, pred_case = _nb_scored_ctes(
        cls, vocab_size, table, text_col, label_col, id_col
    )
    arr = "list_sort([" + ", ".join(f"score_{c}" for c in cls) + "])"
    return f"""{with_body},
    cal AS (
      SELECT least(CAST((greatest({greatest}) - {arr}[{k - 1}]) // {int(width)} AS BIGINT),
                   {int(n_buckets) - 1}) AS bucket,
             CASE WHEN (CASE {pred_case} END) = {label_col}
                  THEN 1 ELSE 0 END AS ok
      FROM scored WHERE {label_col} IS NOT NULL
    )
    SELECT bucket, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(ok) AS BIGINT) AS n_correct,
           CAST(sum(ok) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS acc
    FROM cal GROUP BY bucket
    """
