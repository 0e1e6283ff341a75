"""Work-counted scale pin for the candidate-generating lanes.

The sf0.1 wall-clock bench is overhead-dominated (SCALING.json: max 1.86x
time growth across 100x data), so it cannot detect an algorithmic
regression in the dedup / cross-corpus / IVF lanes — a broken MAX_BUCKET
prune or an accidental within-corpus cross join would barely move
wall-time at this SF while exploding at 100 TB. This pins the lanes'
*work* instead: candidate pairs, matches, scanned rows, and shuffle bytes
at a 10x synthetic scale-up must stay within a linear-with-slack band of
the 1x point (tools/scale_probe.py builds disjoint-shingle copies, so the
true population grows exactly m-fold in expectation — see its module doc;
per-copy LSH draws are independent hash draws, hence the slack).

A quadratic lane puts the 10x point near 100x the 1x point — two binary
orders outside the band; a collapsed lane (pruning everything) lands near
0. The committed WORK_CURVE.json carries the same curve at sf0.1 with a
50x point.
"""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from scale_probe import (  # noqa: E402
    probe_cross,
    probe_ivf,
    probe_minhash,
    probe_ngram,
    probe_simhash,
    scaled_docs,
    scaled_embeddings,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def base_docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_minhash_candidate_work_grows_linearly(spark, base_docs):
    one = probe_minhash(scaled_docs(base_docs, 1))
    ten = probe_minhash(scaled_docs(base_docs, 10))
    assert one["candidate_pairs"] > 0  # the corpus has real near-dups
    ratio = ten["candidate_pairs"] / one["candidate_pairs"]
    # linear = 10; per-copy variance is hash-draw noise, quadratic = ~100
    assert 5 <= ratio <= 20, f"candidate growth {ratio} not ~linear"
    byte_ratio = (
        ten["cand_shuffle_bytes_written"] / max(one["cand_shuffle_bytes_written"], 1)
    )
    assert byte_ratio <= 20, f"shuffle-byte growth {byte_ratio} super-linear"
    # verified pairs are a subset of candidates on both points
    assert ten["verified_pairs"] <= ten["candidate_pairs"]


def test_simhash_and_ngram_work_grows_linearly(spark, base_docs):
    """SimHash VERIFIED pairs and shuffle records scale linearly on
    disjoint-shingle copies (the 16-bit chunk blocking's birthday-
    collision term is quadratic in corpus size, but it lands in join
    OUTPUT rows — hamming verify kills those pairs, and the shuffled
    rows (sig + chunk explode) stay linear). Exact n-gram Jaccard joins
    only within copies (shingle spaces are disjoint), so its pair count
    and shuffle records are linear too."""
    one_s = probe_simhash(scaled_docs(base_docs, 1))
    ten_s = probe_simhash(scaled_docs(base_docs, 10))
    assert one_s["pairs"] > 0
    # verified-pair COUNTS vary wildly under per-copy hash relabeling
    # (measured 124-3110 across 10 isomorphic copies — near-threshold
    # pairs dominate), and this lane's counted-plan shuffle records just
    # mirror the pair count (the other stages read the persisted sigs),
    # so the scale contract is purely structural: disjoint sub-corpora
    # NEVER verify against each other — no interaction term, so total
    # work is the sum of per-segment work, linear by construction
    assert ten_s["cross_copy_pairs"] == 0
    one_n = probe_ngram(scaled_docs(base_docs, 1))
    ten_n = probe_ngram(scaled_docs(base_docs, 10))
    assert one_n["pairs"] > 0
    ratio = ten_n["pairs"] / one_n["pairs"]
    assert 8 <= ratio <= 12, f"ngram pair growth {ratio} not ~linear"
    assert ten_n["shuffle_records_written"] <= (
        20 * max(one_n["shuffle_records_written"], 1)
    )


def test_cross_corpus_matches_grow_linearly(spark, base_docs):
    ref = base_docs.filter(F.col("doc_id") < 500).select("doc_id", "text")
    one = probe_cross(
        scaled_docs(base_docs, 1, contaminate_every=20, perturb_all=True), ref
    )
    ten = probe_cross(
        scaled_docs(base_docs, 10, contaminate_every=20, perturb_all=True), ref
    )
    assert one["matches"] > 0  # planted contamination is found at 1x
    ratio = ten["matches"] / one["matches"]
    # every copy plants the same contaminated slice -> exactly 10x true
    # matches; band keys are exact string/xx64 equality on planted
    # IDENTICAL text, so this band is tight
    assert 8 <= ratio <= 12, f"match growth {ratio} not ~linear"
    assert ten["shuffle_bytes_written"] <= 20 * max(one["shuffle_bytes_written"], 1)


def test_tpch_lane_work_grows_linearly(spark, tmp_path):
    """Round-12 directive #4: the headline TPC-H lanes get the same
    work-counted regression net the dedup lanes have. The probe
    materializes key-remapped scaled parquet and runs the catalog's OWN
    q1/q3/q5, so this pins production plans, not probe twins. Contract:
    post-pushdown scan rows grow exactly m-fold (a broken pushdown or a
    scan fan-out shows up here), shuffle records stay within a
    linear-with-slack band (q1/q5's are #groups-bounded — expected FAR
    below linear; the map-side combine is the point), and result
    cardinality is scale-invariant (6 groups / top-10 / #nations)."""
    from scale_probe import probe_tpch, scaled_tpch_dir

    one = probe_tpch(spark, scaled_tpch_dir(spark, SF, 1, str(tmp_path / "m1")))
    ten = probe_tpch(spark, scaled_tpch_dir(spark, SF, 10, str(tmp_path / "m10")))
    for q in ("q1_pricing_summary", "q3_shipping_priority",
              "q5_local_suppliers"):
        assert one[q]["scan_output_rows"] > 0, q
        scan_ratio = ten[q]["scan_output_rows"] / one[q]["scan_output_rows"]
        # nation/region stay single-copy, so q5 sits a hair under 10
        assert 9 <= scan_ratio <= 11, (q, scan_ratio)
        # regime-robust quadratic guard (the sf0.1 curve measured AQE
        # flipping broadcast->shuffle between scales, which makes raw
        # record ratios regime artifacts): shuffle records per scanned
        # row stay a small constant in either regime; quadratic work
        # grows this with scale
        for pt in (one[q], ten[q]):
            per_row = pt["shuffle_records_written"] / max(
                pt["scan_output_rows"], 1
            )
            assert per_row <= 3, (q, per_row)
        assert one[q]["rows"] == ten[q]["rows"], q  # fixed output shape


def test_ivf_scanned_rows_grow_linearly(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    from csvtool_spark.operators.similarity import ivf_centroids

    cents = ivf_centroids(emb, "embedding", "vec_id", 16)
    one = probe_ivf(scaled_embeddings(emb, 1), cents)
    ten = probe_ivf(scaled_embeddings(emb, 10), cents)
    assert one["topk_rows"] == ten["topk_rows"] == 10
    assert one["scanned_rows"] > 0
    ratio = ten["scanned_rows"] / one["scanned_rows"]
    # copies are eps-nudged, cells stay balanced -> probed cells hold
    # ~10x the rows; a broken cell prune scans everything (ratio ~10x
    # corpus/probed share) — the nudge keeps assignments near-identical
    assert 8 <= ratio <= 12, f"scanned-row growth {ratio} not ~linear"
