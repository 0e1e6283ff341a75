"""Offline batch≡stream pipe soak: N random STREAM_SAFE chains through
the documents readStream vs the same chain in batch — the long-soak form
of tests/test_pipe_stream_fuzz.py (6 fixed seeds in the suite).

Usage: python tools/fuzz_pipe_stream.py [n_seeds] [start_seed] [sf_dir]
  defaults: 25 seeds from 7000, /root/testdata/sf0.001

Seed k here IS test seed k-7000 (same generator), so any failure
reproduces under pytest. Exit code 1 on any failure."""

from __future__ import annotations

import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "tests"),
)


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 25
    start = int(sys.argv[2]) if len(sys.argv) > 2 else 7000
    sf = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.001"

    import test_pipe_stream_fuzz as fz
    from csvtool_spark.dialect.parser import parse_pipeline
    from csvtool_spark.dialect.stages import apply_stages
    from csvtool_spark.oracle import normalize
    from csvtool_spark.session import get_spark
    from csvtool_spark.streaming import (
        document_stream,
        piped_stream,
        run_to_memory,
    )

    spark = get_spark("pipe-stream-fuzz")
    batch = spark.read.parquet(f"{sf}/documents.parquet")

    failures = 0
    for seed in range(start, start + n):
        rng = random.Random(seed)
        pipe = fz._gen_stream_chain(rng)
        name = f"soak_{seed}"
        err = None
        try:
            stream = document_stream(spark, sf)
            run_to_memory(piped_stream(stream, pipe), name, output_mode="append")
            got = spark.sql(f"SELECT * FROM {name}")
            expect = apply_stages(batch, parse_pipeline(pipe))
            if sorted(got.columns) != sorted(expect.columns):
                err = f"columns {sorted(got.columns)} != {sorted(expect.columns)}"
            else:
                cols = sorted(got.columns)
                g = normalize([tuple(r) for r in got.select(*cols).collect()], cols)
                e = normalize(
                    [tuple(r) for r in expect.select(*cols).collect()], cols
                )
                if g != e:
                    diff = [(a, b) for a, b in zip(g, e) if a != b][:2]
                    err = f"stream != batch ({len(g)}/{len(e)} rows): {diff}"
                elif not g:
                    # stacked filters can legitimately empty a chain —
                    # vacuously equal, note it but don't fail the soak
                    print(f"note: seed={seed} vacuous (0 rows): `{pipe}`")
        except Exception as e:  # noqa: BLE001 — a fuzz run reports, not dies
            err = f"exception: {e}"
        if err:
            failures += 1
            print(f"FAIL seed={seed} pipe=`{pipe}`: {err}")
        if (seed - start + 1) % 5 == 0:
            print(f"... {seed - start + 1}/{n} seeds, {failures} failures",
                  flush=True)
    print(f"{n - failures}/{n} seeds pass")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
