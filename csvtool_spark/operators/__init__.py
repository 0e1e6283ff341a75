"""Beyond-reference scale operators for LLM-data-pipeline workloads:

- ``textstats``  — token counting, quality scoring, language-ID,
  document fingerprinting (all pure JVM expressions);
- ``dedup``      — exact, MinHash-LSH, SimHash, n-gram Jaccard and
  embedding-cosine near-duplicate detection;
- ``similarity`` — brute-force and LSH-bucketed approximate nearest
  neighbors over embedding columns;
- ``multimodal`` — opaque binary media columns with typed metadata and
  Arrow-batched decode/feature plumbing (decode stubbed: no media libs in
  this environment).

All operators are designed shuffle-consciously for 100 TB inputs: LSH
banding replaces O(n²) comparison with equi-joins on band keys, signatures
are computed in a single projection pass, and verifications run only on
candidate pairs.
"""
