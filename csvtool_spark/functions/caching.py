"""Persist-lifecycle handles for operators that return LAZY results over
persisted staging tables (fuzzy linkage grams, BM25 tf, cross-corpus
banded signatures).

Those stages must stay cached while the caller composes/executes the
returned plan, so the operator cannot unpersist them itself — but a
long-lived session (the HTTP server) calling such operators repeatedly
would otherwise accumulate corpus-sized cached blocks until LRU
eviction (round-4 ADVICE).  The convention: the operator attaches its
persisted stages to the result with ``attach_stages``; when the caller
is done with the result (collected it, wrote it out), it calls
``release_stages(result)``.  Releasing is idempotent and optional —
short-lived jobs can keep relying on LRU/teardown.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_ATTR = "_persisted_stages"


def attach_stages(df: DataFrame, stages: list[DataFrame]) -> DataFrame:
    """Record ``stages`` (persisted DataFrames the plan of ``df`` reads)
    on the result for a later ``release_stages`` call."""
    setattr(df, _ATTR, list(stages))
    return df


def carried_stages(df: DataFrame) -> list[DataFrame]:
    """The stages attached to ``df``, or [] — for operators that DERIVE a
    new frame from an attach_stages result (join/groupBy drop the Python
    attribute) and must re-attach them so the release contract survives
    composition."""
    return list(getattr(df, _ATTR, None) or [])


def release_stages(df: DataFrame) -> int:
    """Unpersist every staging table attached to ``df``; returns how many
    were released.  Safe to call on any DataFrame, safe to call twice.
    Only call once the result has been fully consumed — the lazy plan
    re-computes its stages from scratch afterwards."""
    stages = getattr(df, _ATTR, None) or []
    for s in stages:
        s.unpersist()
    if stages:
        setattr(df, _ATTR, [])
    return len(stages)
