"""Driver-side fixed-point rounding shared by every integer-grid
operator (NB log-probs, PCA renormalization, BM25/DSIR weight grids).

Python's built-in ``round`` is BANKER'S rounding; Spark ``F.round`` and
DuckDB ``round`` are half-away-from-zero. Any driver-computed value that
must land on the same grid as an engine-computed one has to use this
explicit ``floor(|x| + 0.5)`` form — two separate round-3 review passes
caught silent cross-engine divergence from ``round()`` before this was
centralized.
"""

from __future__ import annotations

import math


def half_away(x: float) -> int:
    """Round half away from zero, matching Spark/DuckDB ``round(x, 0)``
    and the oracle SQL ``floor(abs(x) + 0.5)``-with-sign formula."""
    r = math.floor(abs(x) + 0.5)
    return int(r) if x >= 0 else -int(r)
