"""Every catalog query must exactly match its DuckDB oracle at sf0.001.

This is the same check the driver runs at sf0.01 — running it at the
smallest SF keeps the suite fast while catching semantic drift.
"""

from __future__ import annotations

import pytest

from csvtool_spark import queries as catalog
from csvtool_spark.oracle import compare
from tests.conftest import SF_SMALL


def _check(spark, duck, name, fn, oracles):
    sdf = fn(spark, SF_SMALL)
    if name not in oracles:
        # xx64-family entries: invariant oracle instead of SQL equality —
        # every catalog entry must have one or the other, never rows-only
        inv = catalog.INVARIANT_ORACLES.get(name)
        assert inv is not None, f"{name}: neither SQL nor invariant oracle"
        err = inv(sdf, duck)
        assert err is None, f"{name}: {err}"
        return
    err = compare(sdf, duck, oracles[name])
    assert err is None, f"{name}: {err}"


@pytest.mark.parametrize("name", sorted(catalog.QUERIES))
def test_query_matches_oracle(spark, duck, name):
    _check(spark, duck, name, catalog.QUERIES[name], catalog.ORACLES)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(e.oracle_sql()) <= set(e.queries())


@pytest.mark.parametrize("name", sorted(catalog.SHADOW_QUERIES))
def test_shadow_query_matches_oracle(spark, duck, name):
    # oracle- or invariant-paired entries outside the driver's window
    _check(spark, duck, name, catalog.SHADOW_QUERIES[name],
           catalog.SHADOW_ORACLES)
