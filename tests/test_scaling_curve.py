"""Scaling-curve gate: across the 100× data range (sf0.001 → sf0.1), no
bench headline query may grow super-linearly in SF.

This is the standing evidence behind the "would survive a 100× scale-up"
plan claims: the plan tests pin SHAPE (pushdown, broadcast, banded join,
no cartesian products), this pins the measured consequence — wall-clock
growth far below the data growth. A query whose time scaled ~linearly
(ratio ≈ 100) at local[32], where per-core parallelism is already
saturated, would carry a data-proportional serial or shuffle term that a
1000-executor scale-up multiplies; everything in the repo sits well
under the asserted bound (observed ratios ≤ ~4 with a fixed-overhead
floor; the bound leaves headroom for box noise, not for regressions).

1-rep per SF to keep suite time down — the committed SCALING.json from
tools/scaling_curve.py carries the median-of-3 numbers.
"""

from __future__ import annotations

#: 100× data may cost at most this growth factor per query. Far above
#: the observed ≤~4× (so ambient noise can't flake it), far below
#: linear 100× (so a data-proportional regression — a lost pushdown, an
#: all-pairs join, a driver-side loop — still trips it).
MAX_GROWTH_100X = 25.0


def test_headline_queries_grow_sublinearly_in_sf(spark):
    from csvtool_spark import queries as catalog
    from tools.scaling_curve import growth_ratios, measure

    pool = {**catalog.SHADOW_QUERIES, **catalog.QUERIES}
    curves = measure(
        spark, pool,
        sf_dirs=["/root/testdata/sf0.001", "/root/testdata/sf0.1"],
        reps=1,
    )
    assert len(curves) == 2, "need both ends of the SF range on disk"
    ratios = growth_ratios(curves)
    outliers = {n: r for n, r in ratios.items() if r > MAX_GROWTH_100X}
    assert not outliers, (
        f"super-linear-tending growth over 100x data (> {MAX_GROWTH_100X}x): "
        f"{outliers}; full curves: {curves}"
    )
