"""DSIR-style importance resampling: select pretraining documents whose
hashed-n-gram distribution looks like a TARGET corpus (Xie et al. 2023,
"Data Selection for Language Models via Importance Resampling" — public
method; this is an original Spark-first implementation).

Pipeline (all corpus passes linear, all model state bounded):

1. **Features**: unigrams + bigrams of the whitespace tokens, hashed into
   ``n_buckets`` buckets with the repo's cross-engine md5 prefix hash.
2. **Bucket models**: ONE pass counts every bucket twice — raw (all docs)
   and target (docs matching ``target_sql``) — collected as ≤``n_buckets``
   rows (the only driver artifact; 1024 longs by default).
3. **Log-ratio weights**: add-one-smoothed
   ``lr_b = ln((t_b+1)/(T+B)) - ln((r_b+1)/(R+B))`` on a 1e-6 fixed-point
   grid → a bucket-indexed int64 literal array shipped in the task
   closure. Per-doc log-weight is then a ZERO-SHUFFLE array fold:
   exact integer sums, order-invariant, streaming-legal (the
   ``nb_score_map`` shape).
4. **Resampling**: top-k by Gumbel-perturbed log-weight
   (``logw + g``, ``g = -ln(-ln(u))`` with a key-derived md5 coin —
   samples ∝ exp(logw) without replacement, the Gumbel-top-k identity),
   or deterministic top-k with ``gumbel=False``. Either way the plan is
   ``TakeOrderedAndProject`` — no full sort, no body shuffle.

Cross-engine exactness: integer counts → identical double formulas
(same parenthesization) → half-away 1e-6 grid → int64 sums; the DuckDB
oracle reproduces every stage from the same table.

Hash families (the ``dedup`` convention): ``hash_family='xx64'`` is the
throughput default — one JVM ``xxhash64`` per feature; ``'md5'`` is the
cross-engine determinism lane the DuckDB oracle reproduces (the catalog
entry uses it). The bucket arrays are computed ONCE into a persisted
projection shared by the counting pass and the scoring fold — without
it the feature hashing (the dominant cost) runs twice; at extreme scale
where the persist won't fit, pass ``persist_buckets=False`` to trade
the second hashing pass for zero cache footprint.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from csvtool_spark.functions.fixedpoint import half_away

from csvtool_spark.functions.hashing import md5_prefix_long
from csvtool_spark.operators.dedup import normalized
from csvtool_spark.operators.textstats import tokens

_SCALE = 1_000_000.0




def _features(toks):
    """Unigrams + space-joined bigrams (null tokens array → null).

    Bigrams pair the array with its own 1-shifted slice via ``zip_with``
    instead of indexing ``element_at(toks, i+1/i+2)`` from a position
    ``sequence``: the HOF body runs interpreted, where each element_at
    pays per-call bounds/boxing work — the slice/zip form produces the
    identical strings at ~12× less per-row cost (round-13 A/B: 3.15 s →
    0.27 s over sf0.1 documents, outputs equal)."""
    bigrams = F.zip_with(
        F.slice(toks, 1, F.size(toks) - 1),
        F.slice(toks, 2, F.size(toks) - 1),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    return F.when(
        F.size(toks) >= 2, F.concat(toks, bigrams)
    ).otherwise(toks)


def _bucket(feat, n_buckets: int, hash_family: str = "md5"):
    if hash_family == "md5":
        return md5_prefix_long(feat) % F.lit(int(n_buckets))
    if hash_family == "xx64":
        return F.pmod(F.xxhash64(feat), F.lit(int(n_buckets)))
    raise ValueError(f"hash_family must be 'xx64' or 'md5', got {hash_family!r}")


def dsir_logweights(
    df: DataFrame,
    text_col: str,
    id_col: str,
    target_sql: str,
    n_buckets: int = 1024,
    hash_family: str = "xx64",
    persist_buckets: bool = True,
) -> DataFrame:
    """Per-document fixed-point log importance weight ``logw_fp``
    (×1e-6): positive → the doc's feature mix resembles the target
    corpus more than the raw pool. ``target_sql`` is a boolean SQL
    predicate over the input columns (e.g. ``"lang = 'en'"``) defining
    the target subset — mirrored verbatim in the oracle.

    Returns all input columns plus ``logw_fp`` (long). Null/empty text
    → 0 (no evidence). ``hash_family``/``persist_buckets``: see module
    docstring — and note the PAIRING RULE: only ``hash_family='md5'``
    is reproducible by ``dsir_oracle_sql`` (which refuses 'xx64');
    the xx64 default is the throughput lane for production use.

    Persist lifecycle: with ``persist_buckets=True`` the staged plan
    stays cached for the life of the returned (lazy, corpus-sized)
    DataFrame — there is no safe in-function unpersist point. Callers
    that loop over many corpora should pass ``persist_buckets=False``
    (recompute trade) or unpersist via the blocks' natural LRU eviction;
    ``dsir_sample`` — whose output is bounded — materializes and
    releases the cache itself."""
    toks = tokens(normalized(F.col(text_col)))
    feats = _features(toks)
    is_t = F.expr(target_sql)

    # bucket arrays computed ONCE (hashing is the dominant cost) and
    # shared by the counting pass and the scoring fold
    staged = df.withColumn(
        "__buckets",
        F.transform(feats, lambda f: _bucket(f, n_buckets, hash_family)),
    )
    if persist_buckets:
        staged = staged.persist()

    # ONE counting pass for both models: ≤n_buckets rows to the driver
    counts = (
        staged.select(is_t.alias("__t"), F.explode("__buckets").alias("__b"))
        .groupBy("__b")
        .agg(
            F.count(F.lit(1)).alias("r"),
            F.sum(F.when(F.col("__t"), 1).otherwise(0)).alias("t"),
        )
        .collect()
    )
    by_b = {int(r["__b"]): (int(r["t"]), int(r["r"])) for r in counts}
    t_total = sum(t for t, _ in by_b.values())
    r_total = sum(r for _, r in by_b.values())
    lr6 = [
        half_away(
            (
                math.log((by_b.get(b, (0, 0))[0] + 1.0) / (t_total + n_buckets))
                - math.log((by_b.get(b, (0, 0))[1] + 1.0) / (r_total + n_buckets))
            )
            * _SCALE
        )
        for b in range(n_buckets)
    ]
    lr_lit = F.array(*[F.lit(v).cast("long") for v in lr6])

    # zero-shuffle scoring fold over the SAME staged bucket arrays
    logw = F.aggregate(
        F.col("__buckets"),
        F.lit(0).cast("long"),
        lambda acc, b: acc + F.element_at(lr_lit, (b + F.lit(1)).cast("int")),
    )
    out = staged.withColumn(
        "logw_fp", F.coalesce(logw, F.lit(0).cast("long"))
    ).drop("__buckets")
    out._dsir_staged = staged  # handle for dsir_sample's eager release
    return out


def dsir_sample(
    df: DataFrame,
    text_col: str,
    id_col: str,
    target_sql: str,
    k: int,
    n_buckets: int = 1024,
    gumbel: bool = True,
    salt: str = "dsir",
    hash_family: str = "xx64",
    materialize: bool = True,
    coin_lane: str = "jvm",
) -> DataFrame:
    """Importance-resample ``k`` documents toward the target distribution.

    ``materialize=True`` (default) runs the bounded top-k eagerly and
    releases the staged bucket cache (long-lived sessions must not
    accumulate corpus-sized cached plans); ``materialize=False`` returns
    the lazy TakeOrderedAndProject plan and leaves the cache to the
    caller (plan inspection / further composition).

    ``gumbel=True`` (default): priority = ``logw + g`` with the standard
    Gumbel noise ``g = -ln(-ln(u))`` from a key-derived md5 coin — the
    Gumbel-top-k identity makes the draw ∝ exp(logw) without
    replacement, yet fully deterministic and oracle-reproducible.
    ``gumbel=False``: plain top-k by weight (mode selection, no
    sampling). Priorities round to 6 dp with an id tie-break (the
    ``priority_sample`` boundary rule). Returns (id, logw_fp, priority).

    ``coin_lane``: ``'jvm'`` (default) computes the Gumbel noise with
    codegen-fused ``F.log`` — the throughput lane; ``'libm'`` routes it
    through the glibc ``functions.libm.gumbel_coin`` kernel, the lane
    ``dsir_oracle_sql`` reproduces bit-for-bit (pairing rule, like
    ``hash_family``).  The lanes agree everywhere off the 6-dp rounding
    boundaries (a differential pins them on the catalog corpora).
    """
    if coin_lane not in ("jvm", "libm"):
        raise ValueError(
            f"coin_lane must be 'jvm' or 'libm', got {coin_lane!r}"
        )
    spark = df.sparkSession
    w = dsir_logweights(df, text_col, id_col, target_sql, n_buckets,
                        hash_family=hash_family)
    logw_d = F.col("logw_fp").cast("double") / F.lit(_SCALE)
    if gumbel:
        m = md5_prefix_long(
            F.concat_ws("#", F.lit(salt), F.col(id_col).cast("string"))
        )
        # offset 0.5 keeps u strictly inside (0,1): no ±inf Gumbel
        if coin_lane == "jvm":
            u = (m.cast("double") + F.lit(0.5)) / F.lit(4294967296.0)
            g = -F.log(-F.log(u))
        else:  # 'libm' (validated above)
            from csvtool_spark.functions.libm import gumbel_coin

            g = gumbel_coin(m, 0.5)
        priority = F.round(logw_d + g, 6)
    else:
        priority = F.round(logw_d, 6)
    lazy = (
        w.select(F.col(id_col), "logw_fp", priority.alias("priority"))
        .orderBy(F.desc("priority"), F.asc(id_col))
        .limit(int(k))
    )
    if not materialize:
        return lazy
    # the output is BOUNDED (k rows): materialize it, then release the
    # staged bucket cache — a long-lived session (the HTTP server) calling
    # this repeatedly must not accumulate corpus-sized cached plans
    rows = lazy.collect()
    staged = getattr(w, "_dsir_staged", None)
    if staged is not None:
        staged.unpersist()
    return spark.createDataFrame(rows, schema=lazy.schema)


def dsir_oracle_sql(
    target_sql: str,
    k: int,
    n_buckets: int = 1024,
    gumbel: bool = True,
    salt: str = "dsir",
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_family: str = "md5",
) -> str:
    """DuckDB twin of ``dsir_sample``: identical features, md5 buckets,
    smoothing formula (same parenthesization), 1e-6 grid, integer sums,
    Gumbel coin and tie-break.

    PAIRING RULE: only the md5 bucket lane is engine-reproducible — pass
    ``hash_family='md5'`` to the Spark side when comparing against this
    oracle. Requesting 'xx64' here raises instead of silently generating
    SQL that can never match (xxhash64 has no DuckDB twin)."""
    if hash_family != "md5":
        raise ValueError(
            f"dsir_oracle_sql reproduces only the md5 bucket lane; got "
            f"{hash_family!r} — run dsir_sample(..., hash_family='md5') "
            f"for oracle comparison (xx64 is the non-reproducible "
            f"throughput lane)"
        )

    def d(x: float) -> str:
        return f"CAST({x!r} AS DOUBLE)"

    salt_sql = salt.replace("'", "''")  # quote-doubled into the md5 literal
    return f"""
    WITH t AS (
      SELECT {id_col}, ({target_sql}) AS is_t,
             string_split(lower(trim({text_col})), ' ') AS toks
      FROM {table}
    ),
    f AS (
      SELECT {id_col}, is_t, unnest(
        CASE WHEN len(toks) >= 2 THEN
          list_concat(toks, list_transform(range(1, len(toks)),
                                           i -> toks[i] || ' ' || toks[i+1]))
        ELSE toks END) AS feat
      FROM t WHERE toks IS NOT NULL
    ),
    fb AS (
      SELECT {id_col}, is_t,
             CAST(concat('0x', substr(md5(feat), 1, 8)) AS BIGINT) % {n_buckets} AS b
      FROM f
    ),
    cnt AS (
      SELECT b, count(*) AS r,
             sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS tc
      FROM fb GROUP BY b
    ),
    tot AS (SELECT sum(r) AS rt, sum(tc) AS tt FROM cnt),
    lr AS (
      SELECT g.b,
             CAST(floor(abs((ln((coalesce(cnt.tc, 0) + {d(1.0)}) / (tot.tt + {n_buckets}))
                           - ln((coalesce(cnt.r, 0) + {d(1.0)}) / (tot.rt + {n_buckets})))
                          * {d(1_000_000.0)}) + {d(0.5)}) AS BIGINT)
             * CASE WHEN (ln((coalesce(cnt.tc, 0) + {d(1.0)}) / (tot.tt + {n_buckets}))
                        - ln((coalesce(cnt.r, 0) + {d(1.0)}) / (tot.rt + {n_buckets}))) >= 0
                    THEN 1 ELSE -1 END AS lr6
      FROM (SELECT unnest(range(0, {n_buckets})) AS b) g
      LEFT JOIN cnt ON cnt.b = g.b, tot
    ),
    docw AS (
      SELECT t.{id_col},
             CAST(coalesce(sum(lr.lr6), 0) AS BIGINT) AS logw_fp
      FROM t LEFT JOIN fb ON fb.{id_col} = t.{id_col}
             LEFT JOIN lr ON lr.b = fb.b
      GROUP BY t.{id_col}
    ),
    pr AS (
      SELECT {id_col}, logw_fp,
             round((logw_fp / {d(1_000_000.0)})
                   {"+ (-ln(-ln((CAST(concat('0x', substr(md5('" + salt_sql + "#' || CAST(" + id_col + " AS VARCHAR)), 1, 8)) AS BIGINT) + " + d(0.5) + ") / " + d(4294967296.0) + ")))" if gumbel else ""},
                   6) AS priority
      FROM docw
    )
    SELECT {id_col}, logw_fp, priority
    FROM pr ORDER BY priority DESC, {id_col} ASC LIMIT {int(k)}
    """
