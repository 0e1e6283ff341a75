"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB
over the same parquet tables and compares exactly (csvtool_spark.oracle).

Usage: python tools/check_correctness.py [sf_dir] [name ...]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from csvtool_spark.oracle import compare, duck_connect


def main() -> int:
    import __spark_entry__ as entrymod
    from csvtool_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark("correctness-check")
    con = duck_connect(sf_dir)

    from csvtool_spark.queries import (
        INVARIANT_ORACLES,
        SHADOW_ORACLES,
        SHADOW_QUERIES,
    )

    qs = dict(entrymod.queries())
    oracles = dict(entrymod.oracle_sql())
    # shadow entries: oracle-paired but outside the driver's 50-slot window
    qs.update(SHADOW_QUERIES)
    oracles.update(SHADOW_ORACLES)
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: spark error: {e}")
            continue
        if name not in oracles:
            # xx64-family entries: invariant oracle instead of SQL equality
            inv = INVARIANT_ORACLES.get(name)
            if inv is None:
                failures.append(name)
                print(f"FAIL {name}: neither SQL nor invariant oracle")
                continue
            try:
                err = inv(sdf, con)
            except Exception as e:  # noqa: BLE001
                err = f"error: {e}"
            finally:
                from csvtool_spark.functions.caching import release_stages

                release_stages(sdf)
            if err:
                failures.append(name)
                print(f"FAIL {name}: {err}")
            else:
                print(f"PASS {name} (invariant)")
            continue
        try:
            err = compare(sdf, con, oracles[name])
        except Exception as e:  # noqa: BLE001
            err = f"error: {e}"
        finally:
            # operators that return lazy plans over persisted stages
            # (recall evals, BM25, linkage, ...) attach them for release;
            # a 128-entry sweep in one session would otherwise accumulate
            # corpus-sized cached blocks until LRU eviction
            from csvtool_spark.functions.caching import release_stages

            release_stages(sdf)
        if err:
            failures.append(name)
            print(f"FAIL {name}: {err}")
        else:
            print(f"PASS {name}")

    total = len(only) if only else len(qs)
    print(f"\n{total - len(failures)}/{total} pass")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
