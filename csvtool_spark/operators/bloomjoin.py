"""Bloom-filter semi-join reduction, built from pure DataFrame operators.

The classic 100 TB problem: a big fact table joins a *filtered* dimension,
and most fact rows match nothing — yet a plain shuffle join ships every fact
row anyway. Spark's own runtime row-filtering
(``spark.sql.optimizer.runtimeFilter.bloomFilter.enabled``) injects exactly
this structure; here it is an explicit, tunable operator (the reference
engine has no equivalent; its join loop always walks the full probe file —
``/root/reference/evaluator.go:313-337`` joinQuery).

Build: keys → k bit positions each (Kirsch-Mitzenmacher double hashing) →
explode → groupBy(word index) with ``bit_or`` partial aggregation → one
single-row ``map<long,long>`` bitmap (m/64 entries ≈ 128 KiB for m = 2^20).

Probe: the bitmap row is broadcast (a 1-row BroadcastNestedLoopJoin — free),
and membership is a pure column expression (k map lookups + bit tests) that
runs inside whole-stage codegen *before* the probe side ever reaches an
Exchange. False positives are fine: the real join afterwards removes them,
so results stay exact; the filter only removes guaranteed-miss rows early.

Sizing: m ≈ 10 bits per distinct build key with k = 5 gives ~1% false
positives (standard Bloom calculus); the map only materializes words some
bit of which is set, so a sparse filter is smaller still.

ANSI-safe hashing: ``h1 + i*h2`` over full-range xxhash64 longs would
overflow under ``spark.sql.ansi.enabled``; both hashes are reduced mod m
first (m ≤ 2^30), keeping every intermediate < 2^34.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_BITS = 1 << 20
DEFAULT_K = 5


def _bit_positions(key: Column, k: int, num_bits: int) -> list[Column]:
    m = F.lit(num_bits)
    h1 = F.pmod(F.xxhash64(key), m)
    h2 = F.pmod(F.xxhash64(key, F.lit(1)), m)
    return [F.pmod(h1 + F.lit(i) * h2, m) for i in range(k)]


def bloom_build(
    keys: DataFrame, key_col: str, num_bits: int = DEFAULT_BITS, k: int = DEFAULT_K
) -> DataFrame:
    """Single-row DataFrame with a ``__bloom: map<long,long>`` bitmap over
    the distinct values of ``key_col``. The heavy lifting is a keyed hash
    aggregate on the word index — map-side combined, never collected."""
    pos = F.explode(
        F.array(*_bit_positions(F.col(key_col), k, num_bits))
    ).alias("__pos")
    words = (
        keys.select(pos)
        .select(
            F.shiftright("__pos", 6).alias("__word"),
            F.call_function(
                "shiftleft",
                F.lit(1).cast("long"),
                F.col("__pos").bitwiseAND(F.lit(63)).cast("int"),
            ).alias("__bit"),
        )
        .groupBy("__word")
        .agg(F.bit_or("__bit").alias("__bits"))
    )
    return words.agg(
        F.map_from_entries(F.collect_list(F.struct("__word", "__bits"))).alias(
            "__bloom"
        )
    )


def might_contain(
    key: Column,
    k: int = DEFAULT_K,
    num_bits: int = DEFAULT_BITS,
    bloom: Column | None = None,
) -> Column:
    """Membership test against the ``__bloom`` bitmap column (or an
    explicit ``bloom`` Column — e.g. a literal map shipped into a
    stateless streaming projection); k and num_bits must match the
    ``bloom_build`` call."""
    bloom = F.col("__bloom") if bloom is None else bloom
    tests = []
    for p in _bit_positions(key, k, num_bits):
        word = F.coalesce(
            F.try_element_at(bloom, F.shiftright(p, 6)), F.lit(0).cast("long")
        )
        bit = F.call_function(
            "shiftleft", F.lit(1).cast("long"), p.bitwiseAND(F.lit(63)).cast("int")
        )
        tests.append(word.bitwiseAND(bit) != F.lit(0))
    return reduce(lambda a, b: a & b, tests)


def bloom_prune(
    probe: DataFrame,
    build_keys: DataFrame,
    build_col: str,
    probe_col: str,
    num_bits: int = DEFAULT_BITS,
    k: int = DEFAULT_K,
) -> DataFrame:
    """``probe`` minus rows whose ``probe_col`` is provably absent from
    ``build_keys.build_col``. Schema is unchanged; surviving rows may still
    contain Bloom false positives — follow with the real join."""
    bloom = bloom_build(build_keys, build_col, num_bits, k)
    pruned = (
        probe.join(F.broadcast(bloom))
        .where(might_contain(F.col(probe_col), k, num_bits))
        .drop("__bloom")
    )
    return pruned
