"""The named query catalog: one entry per operator in SURVEY.md §2 (plus the
beyond-reference scale operators registered from ``csvtool_spark.operators``).

Every builder takes ``(spark, sf_dir)`` and returns a DataFrame; ``ORACLES``
holds the DuckDB-ANSI-SQL equivalent keyed by the same name. The driver
hash-compares both at sf=0.01 (row count + schema + order-insensitive value
hash), so the two sides are written to be *bitwise* comparable:

- Aggregated monetary/float sums go through exact int64 "cents" arithmetic
  (``round(x*100) → BIGINT → SUM``) on BOTH sides — immune to float summation
  order differences between Spark's partial aggregation and DuckDB.
- Averages / stddevs are derived from those exact integer sums with the same
  double expression shape on both sides (IEEE754 ops on identical inputs are
  deterministic across engines).
- Per-row double arithmetic (no aggregation) is emitted raw — identical
  inputs + identical expression tree ⇒ identical doubles.
- Top-k queries carry explicit unique tie-breaks.

Reference quirks reproduced (citations in csvtool_spark.functions.scalar):
count()→float, week()=dayofyear/7, half-open BETWEEN, truncating int
division, null-safe ``=``, default-DESC ORDER BY, first-row DISTINCT,
last-value-per-group for bare grouped columns.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from csvtool_spark.functions.scalar import (
    between_halfopen,
    csv_div,
    csv_like,
    csv_week,
    dayname,
    monthname,
)

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}

#: Oracle-paired queries NOT exposed to the driver (its correctness window
#: is the first 50 registered entries) — the local pytest gate runs these.
SHADOW_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
SHADOW_ORACLES: dict[str, str] = {}

#: Invariant oracles for the few entries whose OUTPUT depends on an
#: engine-local hash family (xxhash64 perf lanes) and therefore has no
#: exact cross-engine SQL twin: a checker ``(sdf, con) -> str | None``
#: that verifies every sound cross-engine property of the result in
#: DuckDB (emitted values re-derived exactly, structural contracts,
#: completeness on the subsets where completeness IS engine-independent).
#: The local gate runs these wherever it runs SQL oracles, so no catalog
#: entry is ever rows-only. (Containment of the xx64 pair sets in the
#: md5-lane pair sets was measured and does NOT hold — different hash
#: families find different true-pair subsets — so these check exactness
#: of what IS claimed instead; the md5 twins + recall evals pin the
#: completeness dimension.)
INVARIANT_ORACLES: dict[str, Callable] = {}


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from csvtool_spark.sources.parquet import read_table

    return read_table(spark, sf_dir, name)


def cents(col, scale: int = 100):
    """Exact integer representation of a fixed-decimal double (see module doc).

    HALF_UP rounding is spelled ``cast(d ± 0.5 as long)`` instead of
    ``F.round(d, 0)``: Spark's Round on DoubleType allocates a BigDecimal
    per value (measured round 13: the q1-shaped 4-sum aggregation drops
    1.57 s → 0.77 s at sf0.1 when the BigDecimal path goes away — guide
    §1.2 "per-task work"). Bit-equal to HALF_UP for |d| < 2⁵¹ (d ± 0.5 is
    exact there — double ulp ≤ 0.5 — and truncation toward zero of the
    shifted value reproduces half-away-from-zero for either sign); the
    catalog's monetary/value columns are fixed-magnitude (≪ 2⁵¹) at every
    SF, and the DuckDB oracles keep computing round(d, 0) so the gate
    re-proves value equality each run. NULL/NaN/Inf behave as before
    (NULL propagates; NaN/Inf reach the ANSI cast and fail identically).
    """
    d = col * scale
    return (d + F.when(d >= 0, F.lit(0.5)).otherwise(F.lit(-0.5))).cast("long")


def register(name: str, oracle: str | None = None, registered: bool = True,
             invariant: Callable | None = None):
    def deco(fn):
        q, o = (QUERIES, ORACLES) if registered else (SHADOW_QUERIES, SHADOW_ORACLES)
        q[name] = fn
        if oracle is not None:
            o[name] = oracle
        if invariant is not None:
            INVARIANT_ORACLES[name] = invariant
        return fn

    return deco


# ---------------------------------------------------------------------------
# Flagship: TPC-H Q1-style pricing summary (scan → filter → hash agg → sort)
# ---------------------------------------------------------------------------


@register(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(round(l_quantity*100,0) AS BIGINT)) AS BIGINT) AS sum_qty_c,
           CAST(SUM(CAST(round(l_extendedprice*100,0) AS BIGINT)) AS BIGINT) AS sum_base_c,
           CAST(SUM(CAST(round(l_extendedprice*(1-l_discount)*100,0) AS BIGINT)) AS BIGINT) AS sum_disc_c,
           CAST(SUM(CAST(round(l_extendedprice*(1-l_discount)*(1+l_tax)*100,0) AS BIGINT)) AS BIGINT) AS sum_charge_c,
           CAST(SUM(CAST(round(l_quantity*100,0) AS BIGINT)) AS DOUBLE)
             / CAST(count(*) AS DOUBLE) / 100.0 AS avg_qty,
           CAST(SUM(CAST(round(l_extendedprice*100,0) AS BIGINT)) AS DOUBLE)
             / CAST(count(*) AS DOUBLE) / 100.0 AS avg_price,
           CAST(count(*) AS DOUBLE) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1999-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1999-09-02").cast("timestamp")
    )
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc * (1 + F.col("l_tax"))
    n = F.count(F.lit(1))
    return l.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(cents(F.col("l_quantity"))).alias("sum_qty_c"),
        F.sum(cents(F.col("l_extendedprice"))).alias("sum_base_c"),
        F.sum(cents(disc)).alias("sum_disc_c"),
        F.sum(cents(charge)).alias("sum_charge_c"),
        (F.sum(cents(F.col("l_quantity"))).cast("double") / n.cast("double") / F.lit(100.0)).alias("avg_qty"),
        (F.sum(cents(F.col("l_extendedprice"))).cast("double") / n.cast("double") / F.lit(100.0)).alias("avg_price"),
        n.cast("double").alias("count_order"),
    )


# ---------------------------------------------------------------------------
# §2.2 projection / filter / predicates
# ---------------------------------------------------------------------------


@register(
    "q_proj_arith",
    """
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS net_price,
           l_quantity * 2.0 AS qty2,
           l_extendedprice + l_tax AS px,
           CAST(trunc(CAST(l_orderkey AS DOUBLE) / nullif(l_suppkey, 0)) AS BIGINT) AS q_trunc,
           l_orderkey % 7 AS md,
           pow(2, 10) AS p,
           CASE WHEN l_discount >= 0.08 THEN l_discount < 0.02 ELSE l_discount >= 0.02 END AS rev_between
    FROM lineitem
    WHERE l_orderkey < 5000
      AND CASE WHEN l_quantity >= 10.0 THEN l_quantity < 20.0 ELSE l_quantity >= 20.0 END
    """,
)
def q_proj_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Projection + the full §2.3 arithmetic battery in one driver row:
    # int/int division truncates (value.go:425-435); div-by-zero → null
    # (value.go:406-423); `%` int-only (utils.go:240-243); `^` is pow;
    # reference BETWEEN is upper-exclusive with bound-reversal handling
    # (selector.go:480-495) — exercised in both WHERE and projection.
    l = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_orderkey") < 5000)
        & between_halfopen(F.col("l_quantity"), F.lit(10.0), F.lit(20.0))
    )
    return l.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net_price"),
        (F.col("l_quantity") * F.lit(2.0)).alias("qty2"),
        (F.col("l_extendedprice") + F.col("l_tax")).alias("px"),
        csv_div(
            F.col("l_orderkey").cast("double"), F.col("l_suppkey"), int_result=True
        ).alias("q_trunc"),
        (F.col("l_orderkey") % 7).alias("md"),
        F.pow(F.lit(2), F.lit(10)).alias("p"),
        between_halfopen(F.col("l_discount"), F.lit(0.08), F.lit(0.02)).alias(
            "rev_between"
        ),
    )


@register(
    "q_filter_bool",
    """
    SELECT l_orderkey, l_linenumber FROM lineitem
    WHERE (l_discount > 0.05 AND l_tax < 0.04)
       OR (NOT (l_returnflag = 'A') AND ((l_quantity > 30.0) <> (l_discount < 0.02)))
    """,
)
def q_filter_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    # and / or / xor / not — reference parsePredicates (parser.go:552-570);
    # xor on booleans is inequality.
    l = load(spark, sf_dir, "lineitem")
    cond = ((F.col("l_discount") > 0.05) & (F.col("l_tax") < 0.04)) | (
        (~(F.col("l_returnflag") == "A"))
        & ((F.col("l_quantity") > 30.0) != (F.col("l_discount") < 0.02))
    )
    return l.filter(cond).select("l_orderkey", "l_linenumber")


@register(
    "q_like_in",
    """
    SELECT p_partkey, p_type, p_brand FROM part
    WHERE p_type ILIKE '%con%' AND p_brand NOT IN ('Brand#1', 'Brand#2')
      AND p_partkey NOT IN (1, 2, 3)
    """,
    registered=False,  # shadow (r7 swap: slot given to q_minhash_recall);
    # LIKE/IN stay oracle-gated here and via q_dialect_predicates
)
def q_like_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Reference LIKE → case-insensitive anchored regex (parser.go:672-680);
    # IN list with expression elements, null-safe per element
    # (selector.go:497-516). One driver row for both predicate forms.
    p = load(spark, sf_dir, "part")
    return p.filter(
        csv_like(F.col("p_type"), "%con%")
        & ~F.col("p_brand").isin("Brand#1", "Brand#2")
        & ~F.col("p_partkey").isin(1, 2, 3)
    ).select("p_partkey", "p_type", "p_brand")


@register(
    "q_null_semantics",
    """
    SELECT event_id, user_id FROM (
      SELECT event_id, user_id,
             CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v
      FROM events
    ) WHERE v IS NULL
    """,
    registered=False,  # shadow (r7 swap: slot given to q_nb_calibration);
    # null-safe '=' stays driver-evidenced via q_dialect_filter's
    # IS NOT DISTINCT FROM row
)
def q_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Dialect `where c = null` is the idiomatic null test (value.go:282-287);
    # compiled to isNull / eqNullSafe.
    e = load(spark, sf_dir, "events")
    v = F.when(F.col("event_type") == "error", F.lit(None).cast("double")).otherwise(
        F.col("value")
    )
    return e.withColumn("v", v).filter(F.col("v").isNull()).select("event_id", "user_id")


@register(
    "q_distinct_first",
    """
    SELECT c_mktsegment, c_custkey, c_name FROM (
      SELECT c_mktsegment, c_custkey, c_name,
             row_number() OVER (PARTITION BY c_mktsegment ORDER BY c_custkey) AS rn
      FROM customer
    ) WHERE rn = 1
    """,
)
def q_distinct_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Reference DISTINCT keeps the FIRST row per distinct expression value
    # (evaluator.go:105-111). Deterministic variant: first by c_custkey.
    c = load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_custkey")
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("c_mktsegment", "c_custkey", "c_name")
    )


# ---------------------------------------------------------------------------
# §2.3 expressions
# ---------------------------------------------------------------------------


@register(
    "q_dates_case",
    """
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS BIGINT) AS y,
           CAST(month(o_orderdate) AS BIGINT) AS m,
           monthname(o_orderdate) AS mname,
           CAST(dayofyear(o_orderdate) // 7 AS INTEGER) AS wk,
           CAST(dayofmonth(o_orderdate) AS BIGINT) AS dom,
           CAST(dayofyear(o_orderdate) AS BIGINT) AS doy,
           CAST(isodow(o_orderdate) AS BIGINT) AS dow_iso,
           dayname(o_orderdate) AS dname,
           o_orderdate + INTERVAL 30 DAY AS due,
           CAST(date_diff('second', TIMESTAMP '1995-01-01', o_orderdate) AS BIGINT) AS age_s,
           CASE WHEN o_totalprice > 300000 THEN 'big'
                WHEN o_totalprice > 100000 THEN 'mid'
                ELSE 'small' END AS bucket,
           CASE o_orderstatus WHEN 'F' THEN 'finished'
                              WHEN 'O' THEN 'open'
                              ELSE 'other' END AS status_word
    FROM orders WHERE o_orderkey < 3000
    """,
)
def q_dates_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    # One driver row for the §2.3 date battery: date-part set from
    # scanner.go:192-216; week() is dayofyear/7 integer division
    # (selector.go:225), NOT ISO week; date ± duration → date and
    # date - date → duration (value.go:290-360, surfaced as seconds);
    # searched CASE (selector.go:394-411) and simple CASE
    # (selector.go:413-431).
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 3000)
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(d).cast("long").alias("y"),
        F.month(d).cast("long").alias("m"),
        monthname(d).alias("mname"),
        csv_week(d).alias("wk"),
        F.dayofmonth(d).cast("long").alias("dom"),
        F.dayofyear(d).cast("long").alias("doy"),
        # ISO day-of-week 1=Mon..7=Sun on both engines (F.weekday is 0=Mon).
        (F.weekday(d) + F.lit(1)).cast("long").alias("dow_iso"),
        dayname(d).alias("dname"),
        (d + F.expr("INTERVAL 30 DAYS")).alias("due"),
        (
            F.unix_timestamp(d)
            - F.unix_timestamp(F.lit("1995-01-01").cast("timestamp"))
        ).alias("age_s"),
        F.when(F.col("o_totalprice") > 300000, "big")
        .when(F.col("o_totalprice") > 100000, "mid")
        .otherwise("small")
        .alias("bucket"),
        F.when(F.col("o_orderstatus") == "F", "finished")
        .when(F.col("o_orderstatus") == "O", "open")
        .otherwise("other")
        .alias("status_word"),
    )


@register(
    "q_epoch_dates",
    # Epoch-timestamp inference end to end (dateparse.ParseAny numeric
    # breadth, utils.go:393): the Spark side round-trips events through a
    # REAL CSV file whose ts column is bare epoch seconds, relying on the
    # reader's column-level epoch promotion to get DATE back, then computes
    # date parts. The oracle reads the parquet directly — if promotion
    # failed, year()/hour() of a BIGINT column would error or drift.
    """
    SELECT event_id,
           date_trunc('second', ts) AS edate,
           CAST(year(ts) AS BIGINT) AS y,
           CAST(month(ts) AS BIGINT) AS m,
           CAST(hour(ts) AS BIGINT) AS h
    FROM events WHERE event_id < 2000
    """,
    registered=False,  # shadow: driver window full; locally gated
)
def q_epoch_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    from csvtool_spark.sources.csv import read_csv

    ev = load(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    out = os.path.join(tempfile.mkdtemp(prefix="csvtool_epoch_"), "events_epoch")
    ev.select(
        "event_id",
        F.unix_seconds(F.col("ts").cast("timestamp")).alias("edate"),
    ).write.mode("overwrite").option("header", True).csv(out)
    df, _names, types = read_csv(spark, out)
    from csvtool_spark.dialect.types import T_DATE

    if types[1] != T_DATE:
        raise AssertionError(f"epoch column did not promote to DATE: {types}")
    d = F.col("edate")
    return df.select(
        F.col("event_id").cast("long").alias("event_id"),
        d.alias("edate"),
        F.year(d).cast("long").alias("y"),
        F.month(d).cast("long").alias("m"),
        F.hour(d).cast("long").alias("h"),
    )


@register(
    "q_scalar_misc",
    """
    SELECT c_custkey,
           abs(c_acctbal - 5000.0) AS dist,
           coalesce(nullif(c_mktsegment, 'BUILDING'), 'B') AS seg,
           c_name || '-' || c_mktsegment AS tag
    FROM customer
    """,
    registered=False,  # 50-entry window: abs/coalesce/concat also ride the
    # dialect left-join scalar battery and the fuzz pool; slot funds
    # q_range_join. Shadow keeps the oracle pair checked locally.
)
def q_scalar_misc(spark: SparkSession, sf_dir: str) -> DataFrame:
    # abs (utils.go:179-182), coalesce (selector.go:156-162), `+` string
    # concatenation (value.go:330-335).
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.abs(F.col("c_acctbal") - F.lit(5000.0)).alias("dist"),
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("B")).alias("seg"),
        F.concat(F.col("c_name"), F.lit("-"), F.col("c_mktsegment")).alias("tag"),
    )


# ---------------------------------------------------------------------------
# §2.4 aggregation
# ---------------------------------------------------------------------------


@register(
    "q_agg_groupby",
    """
    SELECT o_orderpriority,
           CAST(count(*) AS DOUBLE) AS cnt,
           min(o_totalprice) AS min_p,
           max(o_totalprice) AS max_p,
           CAST(SUM(CAST(round(o_totalprice*100,0) AS BIGINT)) AS BIGINT) AS sum_p_c,
           sqrt((CAST(SUM(CAST(round(o_totalprice,0) AS BIGINT) * CAST(round(o_totalprice,0) AS BIGINT)) AS DOUBLE)
                 - CAST(SUM(CAST(round(o_totalprice,0) AS BIGINT)) AS DOUBLE)
                   * CAST(SUM(CAST(round(o_totalprice,0) AS BIGINT)) AS DOUBLE) / CAST(count(*) AS DOUBLE))
                / (CAST(count(*) AS DOUBLE) - 1.0)) AS sd_samp,
           sqrt((CAST(SUM(CAST(round(o_totalprice,0) AS BIGINT) * CAST(round(o_totalprice,0) AS BIGINT)) AS DOUBLE)
                 - CAST(SUM(CAST(round(o_totalprice,0) AS BIGINT)) AS DOUBLE)
                   * CAST(SUM(CAST(round(o_totalprice,0) AS BIGINT)) AS DOUBLE) / CAST(count(*) AS DOUBLE))
                / CAST(count(*) AS DOUBLE)) AS sd_pop,
           max_by(o_orderstatus, o_orderkey) AS last_status
    FROM orders GROUP BY o_orderpriority
    """,
)
def q_agg_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    # count() returns FLOAT in the reference dialect (treeProcess.go:81-84).
    # stdev / stdevp (value.go:30-68): production path is F.stddev_samp /
    # F.stddev_pop (verified equivalent in tests); the harness variant
    # derives both from exact integer sums so the value hash is
    # engine-independent. Whole-dollar (not cents) basis: sum of squared
    # values must stay under 2^63 through sf≈10 in ANSI mode — squared
    # cents overflow at sf0.1.
    o = load(spark, sf_dir, "orders")
    w = cents(F.col("o_totalprice"), scale=1)
    n = F.count(F.lit(1)).cast("double")
    s = F.sum(w).cast("double")
    ss = F.sum(w * w).cast("double")
    return o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("double").alias("cnt"),
        F.min("o_totalprice").alias("min_p"),
        F.max("o_totalprice").alias("max_p"),
        F.sum(cents(F.col("o_totalprice"))).alias("sum_p_c"),
        F.sqrt((ss - s * s / n) / (n - F.lit(1.0))).alias("sd_samp"),
        F.sqrt((ss - s * s / n) / n).alias("sd_pop"),
        # bare-columns-last (§2.4, selector.go:54-63) deterministically:
        # "last" keyed by the unique o_orderkey — the q_agg_last rule,
        # folded here in round 8 so the quirk keeps in-window evidence
        F.max_by("o_orderstatus", F.col("o_orderkey")).alias("last_status"),
    )


@register(
    "q_agg_implicit",
    """
    SELECT CAST(count(*) AS DOUBLE) AS cnt,
           CAST(SUM(CAST(round(l_quantity*100,0) AS BIGINT)) AS BIGINT) AS sum_qty_c,
           min(l_shipdate) AS first_ship,
           max(l_shipdate) AS last_ship
    FROM lineitem
    """,
    registered=False,  # shadow (r5 swap: slot given to q_dataset_report)
)
def q_agg_implicit(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Aggregates without GROUP BY collapse to one row (evaluator.go:209-214).
    l = load(spark, sf_dir, "lineitem")
    return l.agg(
        F.count(F.lit(1)).cast("double").alias("cnt"),
        F.sum(cents(F.col("l_quantity"))).alias("sum_qty_c"),
        F.min("l_shipdate").alias("first_ship"),
        F.max("l_shipdate").alias("last_ship"),
    )


@register(
    "q_agg_distinct",
    """
    SELECT l_returnflag,
           CAST(count(DISTINCT l_suppkey) AS DOUBLE) AS n_supp,
           CAST(SUM(DISTINCT CAST(round(l_quantity*100,0) AS BIGINT)) AS BIGINT) AS sum_dq_c
    FROM lineitem GROUP BY l_returnflag
    """,
    registered=False,  # shadow (r6 swap: slot given to q_group_quantiles);
    # §2.4 distinct-agg semantics stay locally gated + pytest; the agg
    # family keeps 4 in-window rows (groupby/having/expr/last)
)
def q_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    # count/sum (distinct e) — per-aggregate dedup (selector.go:259-263). The
    # reference forbids combining with GROUP BY (parser.go:1042-1044); we lift
    # that restriction (documented divergence).
    l = load(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").cast("double").alias("n_supp"),
        F.sum_distinct(cents(F.col("l_quantity"))).alias("sum_dq_c"),
    )


@register(
    "q_having",
    """
    SELECT l_suppkey, CAST(count(*) AS DOUBLE) AS cnt,
           CAST(SUM(CAST(round(l_extendedprice*100,0) AS BIGINT)) AS BIGINT) AS rev_c
    FROM lineitem GROUP BY l_suppkey HAVING count(*) > 620
    """,
)
def q_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    # HAVING over aggregates (parser.go:916-925); Catalyst hoists natively.
    l = load(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_suppkey")
        .agg(
            F.count(F.lit(1)).cast("double").alias("cnt"),
            F.sum(cents(F.col("l_extendedprice"))).alias("rev_c"),
        )
        .filter(F.col("cnt") > 620)
    )


@register(
    "q_agg_expr",
    """
    SELECT o_orderstatus,
           CAST(count(o_orderkey) AS DOUBLE) + CAST(count(o_custkey) AS DOUBLE) AS cc,
           CAST(SUM(CAST(round(o_totalprice*100,0) AS BIGINT)) AS DOUBLE)
             / CAST(count(*) AS DOUBLE) AS avg_c,
           max(o_totalprice) - min(o_totalprice) AS range_p
    FROM orders GROUP BY o_orderstatus
    """,
)
def q_agg_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Expressions OF aggregates (treeProcess.go:313-380): agg+agg, agg/agg,
    # agg-agg all legal as long as no nesting.
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        (
            F.count("o_orderkey").cast("double") + F.count("o_custkey").cast("double")
        ).alias("cc"),
        (
            F.sum(cents(F.col("o_totalprice"))).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("avg_c"),
        (F.max("o_totalprice") - F.min("o_totalprice")).alias("range_p"),
    )


@register(
    "q_agg_last",
    registered=False,  # shadow (round-7 swap for q_span_removal): the
    # bare-columns-last quirk stays oracle-gated locally; agg family keeps
    # q1/q_agg_groupby/q_agg_expr/q_having/q_dialect_agg in the window
    oracle="""
    SELECT l_orderkey,
           max_by(l_returnflag,
                  lpad(CAST(l_linenumber AS VARCHAR), 4, '0')
                  || lpad(CAST(l_partkey AS VARCHAR), 12, '0')
                  || lpad(CAST(l_suppkey AS VARCHAR), 12, '0')
                  || l_returnflag) AS last_flag,
           CAST(SUM(CAST(round(l_quantity*100,0) AS BIGINT)) AS BIGINT) AS sum_qty_c
    FROM lineitem WHERE l_orderkey < 7500 GROUP BY l_orderkey
    """,
)
def q_agg_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Bare (non-aggregate) selections under grouping return the LAST row seen
    # per group (selector.go:54-63). Deterministic variant: "last" ordered by
    # a packed unique key (l_linenumber alone has ties in the synthetic data;
    # the key embeds the value so equal keys imply equal results).
    l = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 7500)
    key = F.concat(
        F.lpad(F.col("l_linenumber").cast("string"), 4, "0"),
        F.lpad(F.col("l_partkey").cast("string"), 12, "0"),
        F.lpad(F.col("l_suppkey").cast("string"), 12, "0"),
        F.col("l_returnflag"),
    )
    return l.groupBy("l_orderkey").agg(
        F.max_by("l_returnflag", key).alias("last_flag"),
        F.sum(cents(F.col("l_quantity"))).alias("sum_qty_c"),
    )


# ---------------------------------------------------------------------------
# §2.5 joins
# ---------------------------------------------------------------------------


@register(
    "q_join_left",
    """
    SELECT c.c_custkey, c.c_name, o.o_orderkey
    FROM customer c LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 450000) o
      ON c.c_custkey = o.o_custkey
    """,
)
def q_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Left outer join: unmatched base rows null-fill join-side columns
    # (evaluator.go:380-390). Null join keys never match (evaluator.go:423-427).
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 450000)
    return c.join(o, c.c_custkey == o.o_custkey, "left").select(
        "c_custkey", "c_name", "o_orderkey"
    )


@register(
    "q_join_chain",
    """
    SELECT c_custkey, c_name, n_name, r_name
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    """,
    registered=False,  # 50-entry window: chained joins stay driver-checked
    # through q3/q5 (3-table joins w/ aggregation) and q_dialect_join; the
    # slot funds q_heavy_hitters. Pytest still oracle-checks this entry.
)
def q_join_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    # N-file join chain (parser.go:812-901 allows any number). Dimension
    # tables are broadcast — no shuffle of the fact side at any scale.
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("c_custkey", "c_name", "n_name", "r_name")
    )


@register(
    "q3_shipping_priority",
    """
    SELECT l_orderkey,
           CAST(SUM(CAST(round(l_extendedprice*(1-l_discount)*100,0) AS BIGINT)) AS BIGINT) AS revenue_c,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01'
      AND l_shipdate > TIMESTAMP '1998-01-01'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue_c DESC, l_orderkey LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q3 shape: selective dim filter → two joins → agg → top-k.
    # customer GROWS with SF, so no forced broadcast hint: AQE observes the
    # filtered size at runtime and picks broadcast at bench SF, shuffle join
    # at cluster scale (a forced hint would OOM the driver at 100 TB).
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    l = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(cents(rev)).alias("revenue_c"))
        .select("l_orderkey", "revenue_c", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue_c").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@register(
    "q5_local_suppliers",
    """
    SELECT n_name,
           CAST(SUM(CAST(round(l_extendedprice*(1-l_discount)*100,0) AS BIGINT)) AS BIGINT) AS revenue_c
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name
    """,
)
def q5_local_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q5 shape: 6-table join. Beyond the reference's single-equality
    # joins: the supplier join carries a second equality (c_nationkey =
    # s_nationkey). Only the fixed-size dims (nation: 25 rows, region: 5 —
    # constant at every SF) carry an explicit broadcast hint; supplier and
    # customer GROW with SF, so AQE picks the join strategy at runtime
    # (broadcast at bench SF, shuffle join at cluster scale — never an
    # OOM-sized forced broadcast).
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    l = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            s,
            (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(cents(rev)).alias("revenue_c"))
    )


# ---------------------------------------------------------------------------
# §2.6 ordering / top-k  +  §2.7-2.8 beyond-reference set ops & windows
# ---------------------------------------------------------------------------


@register(
    "q_orderby_topk",
    """
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey DESC LIMIT 25
    """,
    # shadow: TakeOrdered top-k stays driver-evidenced through
    # q_heavy_hitters and q_ann_bruteforce; slot freed for q_lm_score
    registered=False,
)
def q_orderby_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Reference ORDER BY is default-DESC (parser.go:938-941); orderBy+limit
    # compiles to TakeOrderedAndProject (no global sort).
    o = load(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").desc())
        .limit(25)
    )


@register(
    "q_union",
    """
    SELECT o_custkey AS key, 'o' AS src FROM orders WHERE o_totalprice > 450000
    UNION ALL
    SELECT c_custkey AS key, 'c' AS src FROM customer WHERE c_acctbal < 0
    """,
    registered=False,  # shadow (r6 swap: slot given to q_kmeans); set ops
    # (§2.7, engine-exceeds) stay oracle-gated locally alongside q_setops,
    # and the windows/streaming §2.7-2.10 evidence (q_sessionize,
    # q_events_window) remains in-window
)
def q_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Set ops are absent from the reference (§2.7) — engine extension.
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 450000)
    c = load(spark, sf_dir, "customer").filter(F.col("c_acctbal") < 0)
    return o.select(F.col("o_custkey").alias("key"), F.lit("o").alias("src")).unionAll(
        c.select(F.col("c_custkey").alias("key"), F.lit("c").alias("src"))
    )


@register(
    "q_setops",
    # INTERSECT (distinct) + EXCEPT ALL (multiset difference) — completes
    # the §2.7 beyond-reference set-op family next to q_union. Shadow:
    # driver window is full; the local gate oracle-checks it.
    """
    SELECT 'intersect' AS op, nk FROM (
      SELECT c_nationkey AS nk FROM customer
      INTERSECT
      SELECT s_nationkey FROM supplier
    )
    UNION ALL
    SELECT 'except_all' AS op, nk FROM (
      SELECT c_nationkey AS nk FROM customer WHERE c_acctbal < 1000
      EXCEPT ALL
      SELECT s_nationkey FROM supplier
    )
    """,
    registered=False,
)
def q_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    inter = (
        c.select(F.col("c_nationkey").alias("nk"))
        .intersect(s)
        .select(F.lit("intersect").alias("op"), "nk")
    )
    exc = (
        c.filter(F.col("c_acctbal") < 1000)
        .select(F.col("c_nationkey").alias("nk"))
        .exceptAll(s)
        .select(F.lit("except_all").alias("op"), "nk")
    )
    return inter.unionAll(exc)


@register(
    "q_window_running",
    """
    SELECT event_id, user_id,
           CAST(SUM(CAST(round(value*100,0) AS BIGINT))
             OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS run_c,
           row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
    FROM events WHERE user_id < 20
    """,
    registered=False,  # shadow (round-3 swap for q_ann_sq): windows stay
    # driver-evidenced via q_sessionize + q_events_window; this running-sum
    # twin remains oracle-checked in the local gate.
)
def q_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Window functions are absent from the reference (§2.8) — engine
    # extension; also the deterministic basis for the dialect's inc().
    e = load(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id",
        "user_id",
        F.sum(cents(F.col("value"))).over(w).alias("run_c"),
        # cast: DuckDB row_number() is BIGINT, Spark's is int — the driver
        # hash is type-sensitive (the round-6 dtype-parity rule)
        F.row_number().over(w).cast("long").alias("rn"),
    )


@register(
    "q_sessionize",
    """
    WITH g AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    OR date_diff('second', lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id), ts) > 1800
                  THEN 1 ELSE 0 END AS new_s
      FROM events
    )
    SELECT user_id, CAST(SUM(new_s) AS BIGINT) AS n_sessions FROM g GROUP BY user_id
    """,
)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Sessionization: gap > 30 min starts a new session. Batch analogue of the
    # streaming session_window operator in csvtool_spark.streaming.
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    gap = F.unix_timestamp("ts") - F.unix_timestamp(prev)
    new_s = F.when(prev.isNull() | (gap > 1800), 1).otherwise(0)
    return (
        e.withColumn("new_s", new_s)
        .groupBy("user_id")
        .agg(F.sum("new_s").cast("long").alias("n_sessions"))
    )


@register(
    "q_events_window",
    """
    SELECT date_trunc('hour', ts) AS ws, event_type,
           CAST(count(*) AS DOUBLE) AS n,
           CAST(SUM(CAST(round(value*100,0) AS BIGINT)) AS BIGINT) AS sum_v_c
    FROM events GROUP BY date_trunc('hour', ts), event_type
    """,
)
def q_events_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Tumbling event-time window aggregation — the batch shape of the
    # streaming pipeline in csvtool_spark.streaming (F.window(ts, '1 hour')
    # start == date_trunc('hour') for aligned tumbling windows).
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").start.alias("ws"), "event_type")
        .agg(
            F.count(F.lit(1)).cast("double").alias("n"),
            F.sum(cents(F.col("value"))).alias("sum_v_c"),
        )
    )


@register(
    "q_topk_per_group",
    """
    SELECT c_mktsegment, c_custkey, c_acctbal, rk FROM (
      SELECT c_mktsegment, c_custkey, c_acctbal,
             row_number() OVER (PARTITION BY c_mktsegment
                                ORDER BY c_acctbal DESC, c_custkey) AS rk
      FROM customer
    ) WHERE rk <= 3
    """,
    # shadow: same rank-and-filter plan shape is driver-checked through
    # q_source_quota (window slot freed for the packing/quota ops)
    registered=False,
)
def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Top-K per group via ranking window (beyond-reference §2.8 extension);
    # the unique c_custkey tie-break keeps the row set deterministic. At
    # scale this is one shuffle on the partition key, no global sort.
    c = load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return (
        # cast: DuckDB row_number() is BIGINT (dtype-parity rule)
        c.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 3)
        .select("c_mktsegment", "c_custkey", "c_acctbal", "rk")
    )


@register(
    "q_percentile",
    """
    SELECT o_orderstatus,
           quantile_cont(o_totalprice, 0.5) AS p50,
           quantile_cont(o_totalprice, 0.9) AS p90,
           quantile_cont(o_totalprice, 0.99) AS p99
    FROM orders GROUP BY o_orderstatus
    """,
    # shadow: windows/§2.8 stay driver-checked via q_window_running and
    # q_sessionize (slot freed for q_pack_sequences)
    registered=False,
)
def q_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Exact interpolated quantiles (beyond-reference §2.4 extension). Spark
    # `percentile` and DuckDB `quantile_cont` share the continuous
    # order-statistic definition → bit-identical from identical inputs.
    # At very large groups prefer approx_percentile (t-digest, mergeable).
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.expr("percentile(o_totalprice, 0.5)").alias("p50"),
        F.expr("percentile(o_totalprice, 0.9)").alias("p90"),
        F.expr("percentile(o_totalprice, 0.99)").alias("p99"),
    )


# Scale-operator and dialect-front-end catalog entries register themselves
# through the same decorator. Scale operators register FIRST so they sit
# well inside the driver's 50-entry correctness window (the dialect entries
# that would spill past 50 duplicate semantics already checked above).
from csvtool_spark import scale_queries  # noqa: E402,F401
from csvtool_spark import dialect_queries  # noqa: E402,F401
