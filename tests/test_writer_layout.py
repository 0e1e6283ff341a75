"""Writer surface for the curation recipe: the shard stage's
exactly-N-files contract through ``save_parquet(partition_by=['shard'])``
and the re-read identity gate (round-10 directive 4).

Reference analogue: the CSV sink's single-file ``-N`` suffix contract
(files.go:85-156) — this is its scale-path sibling: one balanced parquet
file per shard at any corpus size, because ``shard(n=N, key=k,
repartition=1)`` hash-co-locates each shard value into one task and the
hive-style ``partitionBy('shard')`` sink then emits exactly one file per
shard directory. Without the repartition, every input partition would
spray a file into every shard directory (N x P files)."""

from __future__ import annotations

import os

import pytest

from csvtool_spark.engine import CsvEngine

SF = "/root/testdata/sf0.001"
N = 8
PIPE = (
    "select doc_id, source, text from documents "
    f"|> tokens(text) |> shard(n={N}, key=doc_id, repartition=1)"
)


@pytest.fixture(scope="module")
def eng(spark):
    e = CsvEngine(spark)
    e.register_dir(SF, ["documents"])
    return e


def _part_files(d: str) -> list[str]:
    return [f for f in os.listdir(d) if f.endswith(".parquet")]


def test_shard_write_exactly_n_dirs_one_file_each(eng, tmp_path):
    out = str(tmp_path / "curated.parquet")
    written = eng.save_parquet(PIPE, out, partition_by=["shard"])
    assert written == [out]
    shard_dirs = sorted(
        d for d in os.listdir(out) if d.startswith("shard=")
    )
    # exactly N shard directories — the salted md5 coin is uniform, so
    # every shard is non-empty at 500 rows / 8 shards
    assert shard_dirs == sorted(f"shard={i}" for i in range(N))
    # repartition=1 co-located each shard value into ONE task -> ONE
    # file per directory (the exactly-N-files contract)
    per_dir = {d: _part_files(os.path.join(out, d)) for d in shard_dirs}
    assert all(len(fs) == 1 for fs in per_dir.values()), {
        d: len(fs) for d, fs in per_dir.items()
    }


def test_shard_write_round_trip_identity(eng, spark, tmp_path):
    """Row-SET equality after the disk round trip, shard column
    included. Hive partition pruning note: the partition column comes
    back via directory-name inference (int32), so it is compared in the
    value domain, not the dtype domain — the dtype contract for data
    columns (doc_id/n_tokens long, text/source string) is exact."""
    out = str(tmp_path / "rt.parquet")
    eng.save_parquet(PIPE, out, partition_by=["shard"])
    mem = eng.sql(PIPE)
    back = spark.read.parquet(out)
    assert sorted(back.columns) == sorted(mem.columns)
    data_cols = [c for c in mem.columns if c != "shard"]
    for c in data_cols:
        assert dict(back.dtypes)[c] == dict(mem.dtypes)[c], c
    cols = sorted(mem.columns)
    to_rows = lambda df: sorted(
        tuple(int(v) if c == "shard" else v for c, v in zip(cols, r))
        for r in df.select(*cols).collect()
    )
    got, want = to_rows(back), to_rows(mem)
    assert len(want) > 0 and got == want


def test_shard_pruned_read_hits_one_directory(eng, spark, tmp_path):
    """The point of the layout: a shard-keyed read prunes to ONE
    directory (partition filter, no full scan) and returns exactly the
    rows the in-memory frame assigns to that shard."""
    out = str(tmp_path / "pruned.parquet")
    eng.save_parquet(PIPE, out, partition_by=["shard"])
    back = spark.read.parquet(out).filter("shard = 3")
    plan = back._jdf.queryExecution().executedPlan().toString()
    # the scan must carry the shard predicate as a PARTITION filter
    # (pruned directory listing), not a post-scan data filter
    pf = plan.split("PartitionFilters:", 1)
    assert len(pf) == 2 and "shard" in pf[1].split("]", 1)[0], plan
    mem = eng.sql(PIPE).filter("shard = 3")
    assert sorted(r["doc_id"] for r in back.collect()) == sorted(
        r["doc_id"] for r in mem.collect()
    ) and back.count() > 0


def test_shard_write_csv_dir_exactly_n(eng, spark, tmp_path):
    """The CSV scale sink honors the same layout contract as parquet:
    partitionBy('shard') after repartition=1 emits exactly N shard
    directories with one csv part-file each, and the header round trip
    returns the same (doc_id, shard) assignment. Reference analogue:
    the single-file CSV sink's -N contract (files.go:85-156); this is
    the distributed-directory sibling."""
    out = str(tmp_path / "curated_csv")
    written = eng.save_csv_dir(PIPE, out, partition_by=["shard"])
    assert written == [out]
    shard_dirs = sorted(d for d in os.listdir(out) if d.startswith("shard="))
    assert shard_dirs == sorted(f"shard={i}" for i in range(N))
    for d in shard_dirs:
        parts = [
            f
            for f in os.listdir(os.path.join(out, d))
            if f.startswith("part-") and f.endswith(".csv")
        ]
        assert len(parts) == 1, (d, parts)
    back = spark.read.option("header", True).csv(out)
    mem = eng.sql(PIPE)
    got = sorted(
        (int(r["doc_id"]), int(r["shard"])) for r in back.collect()
    )
    want = sorted(
        (r["doc_id"], r["shard"]) for r in mem.collect()
    )
    assert got == want and len(got) > 0
