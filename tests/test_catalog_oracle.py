"""Every catalog query must exactly match its DuckDB oracle at sf0.001.

This is the same check the driver runs at sf0.01 — running it at the
smallest SF keeps the suite fast while catching semantic drift.
"""

from __future__ import annotations

import pytest

from csvtool_spark import queries as catalog
from csvtool_spark.oracle import compare
from tests.conftest import SF_SMALL


@pytest.mark.parametrize("name", sorted(catalog.QUERIES))
def test_query_matches_oracle(spark, duck, name):
    sdf = catalog.QUERIES[name](spark, SF_SMALL)
    if name not in catalog.ORACLES:
        assert sdf.count() >= 0  # rows-only check
        return
    err = compare(sdf, duck, catalog.ORACLES[name])
    assert err is None, f"{name}: {err}"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(e.oracle_sql()) <= set(e.queries())


@pytest.mark.parametrize("name", sorted(catalog.SHADOW_QUERIES))
def test_shadow_query_matches_oracle(spark, duck, name):
    # oracle-paired entries outside the driver's 50-slot window
    sdf = catalog.SHADOW_QUERIES[name](spark, SF_SMALL)
    if name not in catalog.SHADOW_ORACLES:
        assert sdf.count() >= 0
        return
    err = compare(sdf, duck, catalog.SHADOW_ORACLES[name])
    assert err is None, f"{name}: {err}"
