"""Snapshot maintenance without a table format: MERGE-style upsert and
SCD2 (slowly-changing-dimension) history application as pure DataFrame
plans. The output is the NEW snapshot — write it wherever snapshots live
(parquet dir, bucketed table); no transaction log is assumed or needed.

Scale shape:
- ``merge_upsert`` is ONE full-outer join on the key — AQE broadcasts the
  update side when it is small (the common case: a trickle of updates into
  a huge snapshot) and falls back to a shuffle join when it isn't.
- ``scd2_apply`` is one join (current rows ↔ changes) plus two per-key
  window passes over the CHANGES only — the history partition of the
  dimension is never shuffled, just unioned back in.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_upsert(
    target: DataFrame,
    updates: DataFrame,
    key: str | Sequence[str],
    delete_col: str | None = None,
) -> DataFrame:
    """MERGE INTO semantics as a full-outer join:

    - matched → the update row replaces the target row (columns absent from
      ``updates`` carry the target's value — partial updates);
    - not matched by target → insert (including null-key update rows, which
      can never equi-match);
    - ``delete_col`` (boolean column in ``updates``) → matched rows with a
      true flag are dropped, unmatched delete rows are ignored.

    Output schema = target schema.

    Contract: ``updates`` must hold at most ONE row per key (SQL MERGE
    raises on multiple matches; this operator would instead fan the target
    row out). Pre-aggregate the batch — e.g. ``max_by(struct(*), ts)`` per
    key — when the source can replay.
    """
    keys = [key] if isinstance(key, str) else list(key)
    ucols = [c for c in updates.columns if c not in keys and c != delete_col]
    t = target.withColumn("__t_present", F.lit(True)).alias("t")
    u = updates.withColumn("__u_present", F.lit(True)).alias("u")
    cond = [t[k] == u[k] for k in keys]
    joined = t.join(u, cond, "full_outer")
    # presence sentinels, not key-null checks: an update row with a null
    # key never equi-matches but must still INSERT, not fabricate nulls
    has_u = F.coalesce(u["__u_present"], F.lit(False))
    has_t = F.coalesce(t["__t_present"], F.lit(False))

    if delete_col is not None:
        # a delete row removes its matched target (the joined pair drops)
        # and never inserts when unmatched
        joined = joined.filter(~(has_u & F.coalesce(u[delete_col], F.lit(False))))

    out = []
    for c in target.columns:
        if c in keys:
            out.append(F.when(has_t, t[c]).otherwise(u[c]).alias(c))
        elif c in ucols:
            out.append(F.when(has_u, u[c]).otherwise(t[c]).alias(c))
        else:
            out.append(t[c].alias(c))
    return joined.select(*out)


def scd2_apply(
    dim: DataFrame,
    changes: DataFrame,
    key: str,
    ts_col: str,
    attrs: Sequence[str],
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    is_current: str = "is_current",
) -> DataFrame:
    """Apply a batch of (key, attrs, ts) changes to an SCD2 dimension whose
    rows carry ``valid_from``/``valid_to`` (null = open) and ``is_current``.

    Per key, changes are sequenced by ``ts_col``; a change whose attrs equal
    the previous state (the preceding change, or the dimension's current row
    for the first change) is a no-op and is dropped. Surviving changes
    become versions valid [ts, next ts); the key's previously-current row is
    closed at the first surviving change's ts. Batches are assumed to be
    later than every open ``valid_from`` (the normal incremental case).
    """
    attrs = list(attrs)
    cur = dim.filter(F.col(is_current))
    hist = dim.filter(~F.col(is_current))

    state = F.struct(*[F.col(a) for a in attrs])
    cur_state = cur.select(
        F.col(key),
        F.struct(*[F.col(a) for a in attrs]).alias("__cur"),
    )

    w = Window.partitionBy(key).orderBy(ts_col)
    seeded = (
        changes.join(cur_state, key, "left")
        .withColumn("__prev", F.coalesce(F.lag(state).over(w), F.col("__cur")))
    )
    # survivors: first-ever change for a new key (__prev null) or a real
    # attribute transition (null-safe struct compare)
    kept = seeded.filter(
        F.col("__prev").isNull() | ~state.eqNullSafe(F.col("__prev"))
    )

    w2 = Window.partitionBy(key).orderBy(ts_col)
    versions = kept.select(
        F.col(key),
        *[F.col(a) for a in attrs],
        F.col(ts_col).alias(valid_from),
        F.lead(ts_col).over(w2).alias(valid_to),
    ).withColumn(is_current, F.col(valid_to).isNull())

    first_kept = kept.groupBy(key).agg(F.min(ts_col).alias("__close_ts"))
    closed = (
        cur.join(first_kept, key, "left")
        .withColumn(
            valid_to,
            F.when(F.col("__close_ts").isNotNull(), F.col("__close_ts")).otherwise(
                F.col(valid_to)
            ),
        )
        .withColumn(is_current, F.col("__close_ts").isNull() & F.col(is_current))
        .drop("__close_ts")
    )

    cols = [key, *attrs, valid_from, valid_to, is_current]
    return (
        hist.select(*cols)
        .unionByName(closed.select(*cols))
        .unionByName(versions.select(*cols))
    )
