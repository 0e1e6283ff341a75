"""Connected components over an edge list + near-dup cluster dedup.

The missing last mile of every dedup pipeline: MinHash/SimHash/n-gram
operators emit near-duplicate *pairs*, but training-data curation needs
*clusters* — transitive closure of the pair graph — and one survivor per
cluster. (The reference engine has no graph operators at all; this is a
beyond-reference scale operator per SURVEY.md §7 M7.)

Algorithm: alternating large-star / small-star contraction (Kiveris,
Lattanzi, Mirrokni, Rastogi, Vassilvitskii — "Connected Components in
MapReduce and Beyond", ACM SoCC 2014). Why this one at 100 TB:

- Each half-round is ONE min-aggregate plus ONE equi-join — per-node
  reduce state is a single long (the running minimum), never a collected
  neighbor list, so a degenerate hub (every page pairing with the same
  boilerplate doc) cannot blow up executor memory the way a
  ``collect_set``-based label propagation does.
- Converges in O(log n) rounds regardless of component diameter; plain
  min-label propagation needs O(diameter) rounds, which an adversarial
  duplicate *chain* (a1~a2~a3~...) turns into thousands of shuffles.
- Every round's result is ``localCheckpoint``-ed: lineage is truncated so
  the plan does not grow exponentially across iterations, and the
  convergence test doubles as the materializing action.

Convergence detection is an order-insensitive edge-set signature
``(count, bit_xor(xxhash64(src,dst)))`` — contraction is monotone, so an
unchanged signature is a fixed point (and bit_xor cannot overflow, unlike
an ANSI-mode SUM of hashes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import IntegralType


def _require_integral_id(df: DataFrame, col: str, where: str) -> None:
    """The component algebra keys on LONG ids (min-contraction, min-id
    survivor). A string/UUID id would silently cast to NULL — every
    join misses and the caller sees zero survivors, not an error
    (round-8 ADVICE). Reject non-integral id columns loudly instead."""
    dt = df.schema[col].dataType
    if not isinstance(dt, IntegralType):
        raise TypeError(
            f"{where}: id column '{col}' must be an integral type "
            f"(tinyint/smallint/int/bigint), got {dt.simpleString()}; "
            f"map string/UUID ids to a surrogate long (e.g. xxhash64) "
            f"before clustering, or use the non-transitive pair surface"
        )


def _sym(e: DataFrame) -> DataFrame:
    """Both orientations of every undirected edge."""
    return e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))


def _canon(e: DataFrame) -> DataFrame:
    """Canonical undirected form: (lo, hi), loop-free, distinct."""
    return (
        e.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
        )
        .distinct()
    )


def _large_star(e: DataFrame) -> DataFrame:
    """Connect every strictly-larger neighbor of u to m(u) = min(N(u) ∪ {u})."""
    s = _sym(e)
    m = (
        s.groupBy("src")
        .agg(F.min("dst").alias("__mn"))
        .select("src", F.least("src", "__mn").alias("__m"))
    )
    return (
        s.filter(F.col("dst") > F.col("src"))
        .join(m, "src")
        .select(F.col("dst").alias("src"), F.col("__m").alias("dst"))
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Orient edges toward the smaller endpoint; connect every in-neighbor
    of u (and u itself) to u's minimum in-neighbor."""
    s = _sym(e).filter(F.col("dst") < F.col("src"))
    m = s.groupBy("src").agg(F.min("dst").alias("__m"))
    return (
        s.join(m, "src")
        .select(F.col("dst").alias("src"), F.col("__m").alias("dst"))
        .union(m.select("src", F.col("__m").alias("dst")))
    )


def connected_components(
    edges: DataFrame, src: str = "src", dst: str = "dst", max_iter: int = 20
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``; component is
    the minimum node id of the connected component. Isolated nodes (no
    edges) do not appear — callers union them back (see dedup_clusters).
    Raises RuntimeError if max_iter rounds don't converge (20 rounds covers
    > 2^20-node path graphs; real dup graphs converge in 3-5)."""
    _require_integral_id(edges, src, "connected_components")
    _require_integral_id(edges, dst, "connected_components")
    e = _canon(
        edges.select(
            F.col(src).cast("long").alias("src"), F.col(dst).cast("long").alias("dst")
        )
    ).localCheckpoint()
    sig = None
    for _ in range(max_iter):
        # lazy checkpoint: the signature agg right below is the round's
        # materializing action, so it computes the round AND writes the
        # checkpoint blocks in ONE job — an eager checkpoint here would
        # run a second job (and a second full pass over the edge set)
        # per round just to re-read the blocks for the signature
        # (round-13 A/B: identical components, ~5-10% faster per call)
        e2 = _canon(_small_star(_large_star(e))).localCheckpoint(eager=False)
        row = e2.agg(
            F.count(F.lit(1)).alias("n"),
            F.bit_xor(F.xxhash64("src", "dst")).alias("x"),
        ).first()
        new_sig = (row["n"], row["x"])
        e = e2
        if new_sig == sig:
            break
        sig = new_sig
    else:
        raise RuntimeError(f"connected_components: no fixed point in {max_iter} rounds")
    s = _sym(e)
    return (
        s.groupBy("src")
        .agg(F.min("dst").alias("__mn"))
        .select(
            F.col("src").alias("node"),
            F.least("src", "__mn").alias("component"),
        )
    )


def dedup_clusters(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Assign every row of ``df`` to a duplicate cluster given near-dup
    ``pairs``, keeping the minimum id as the survivor.

    Returns (id, component, cluster_size, is_survivor). Rows with no pair
    are singleton clusters of themselves. The component map is NOT
    broadcast — its size tracks the duplicate count, which scales with the
    corpus; the id-keyed left join lets AQE pick the strategy."""
    _require_integral_id(df, id_col, "dedup_clusters")
    comp = connected_components(pairs, src=id_a, dst=id_b)
    ids = df.select(F.col(id_col).cast("long").alias(id_col))
    out = ids.join(comp, ids[id_col] == comp["node"], "left").select(
        id_col, F.coalesce("component", F.col(id_col)).alias("component")
    )
    w = Window.partitionBy("component")
    return out.select(
        id_col,
        "component",
        F.count(F.lit(1)).over(w).cast("long").alias("cluster_size"),
        (F.col(id_col) == F.col("component")).alias("is_survivor"),
    )


def canonical_select(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    score_col: str,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Keep the BEST document per duplicate cluster — the curation policy
    real pipelines want instead of ``dedup_clusters``' min-id survivor:
    given near-dup ``pairs`` and a per-row ``score_col`` (quality score,
    length, recency…), each cluster keeps its highest-scoring member
    (ties → lowest id). Returns every input row as
    ``(id, component, score, keep_id, is_kept)`` — the ``id → keep_id``
    mapping is exactly what a downstream join needs to redirect
    references from dropped duplicates to their canonical survivor.

    Scale shape: O(log n) alternating-star closure (``connected_
    components``), one id-keyed join (AQE picks the strategy — the
    component map tracks duplicate count, not corpus size), then ONE
    window pass per component computing the arg-max as a struct-max
    fold: (score, -id) max ≡ score DESC, id ASC, no per-cluster sort.
    Null scores lose to every real score (coalesced to -Infinity on both
    engines)."""
    _require_integral_id(df, id_col, "canonical_select")
    comp = connected_components(pairs, src=id_a, dst=id_b)
    ids = df.select(
        F.col(id_col).cast("long").alias(id_col),
        F.coalesce(
            F.col(score_col).cast("double"), F.lit(float("-inf"))
        ).alias("__score"),
    )
    out = ids.join(comp, ids[id_col] == comp["node"], "left").select(
        id_col,
        "__score",
        F.coalesce("component", F.col(id_col)).alias("component"),
    )
    w = Window.partitionBy("component")
    best = F.max(
        F.struct(F.col("__score").alias("s"), (-F.col(id_col)).alias("nid"))
    ).over(w)
    return out.select(
        id_col,
        "component",
        F.col("__score").alias("score"),
        (-best["nid"]).cast("long").alias("keep_id"),
        (F.col(id_col) == -best["nid"]).alias("is_kept"),
    )


def cluster_size_stats(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Duplicate-structure datasheet: the cluster-size histogram of the
    near-dup graph — (cluster_size, n_clusters, n_docs) per size, with
    singletons at size 1.  The single number pipelines watch (dup-doc
    rate) is ``1 - n_clusters/n_docs`` summed over sizes ≥ 2; the full
    histogram additionally exposes pathological mega-clusters (boiler-
    plate explosions) that a scalar rate hides.

    Output is bounded by the number of DISTINCT cluster sizes (≤ √(2N)
    for N docs — sizes sum to N), so it collects safely at any corpus
    scale; the cost is ``dedup_clusters``' component pass plus one
    aggregation."""
    cl = dedup_clusters(df, pairs, id_col, id_a=id_a, id_b=id_b)
    return (
        cl.groupBy("cluster_size")
        .agg(
            F.countDistinct("component").alias("n_clusters"),
            F.count(F.lit(1)).alias("n_docs"),
        )
        .select(
            F.col("cluster_size").cast("long").alias("cluster_size"),
            F.col("n_clusters").cast("long").alias("n_clusters"),
            F.col("n_docs").cast("long").alias("n_docs"),
        )
    )


def cluster_safe_split(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    fractions: dict[str, float],
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Leakage-safe train/val/test assignment: the split coin is tossed on
    the near-dup CLUSTER id, not the row id, so every member of a
    duplicate cluster lands on the same side — the split-time complement
    of ``split_leakage`` (which only *audits* a row-keyed split after the
    fact). Without this, a train/test split of a deduplicated-but-not-
    clustered corpus leaks near-copies of eval documents into training
    (the contamination mechanism Lee et al. 2022, "Deduplicating Training
    Data Makes Language Models Better", measure).

    Returns ``(id, component, cluster_size, split)``. The coin is the
    repo's deterministic md5 bucket (``sampling.split_label``) applied to
    ``component`` — reproducible on any engine, and stable under corpus
    growth for unchanged clusters. Fractions hold over CLUSTERS, not
    rows; a mega-cluster drags its whole mass to one side (by design —
    that is what leakage-safety means).

    Scale shape: ``dedup_clusters``' O(log n) closure + one pure
    projection — the coin is a column expression, no extra shuffle."""
    from csvtool_spark.operators.sampling import split_label

    cl = dedup_clusters(df, pairs, id_col, id_a=id_a, id_b=id_b)
    return cl.select(
        id_col,
        "component",
        "cluster_size",
        split_label(F.col("component"), fractions).alias("split"),
    )
