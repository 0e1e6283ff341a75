"""csvtool_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of dvhar/csvtool (reference: /root/reference).

Architecture (Spark-first, not a port):

- ``session``     — SparkSession factory tuned for local[N] and cluster use.
- ``dialect``     — the csvtool SQL dialect front-end: scanner → recursive-descent
                    parser → type/coercion planner → DataFrame compiler. All
                    execution is Catalyst; there is no custom physical layer
                    (see SURVEY.md §4: the reference's four hand-picked physical
                    strategies map to built-in Spark strategies).
- ``sources``     — CSV reader with the reference's sampling type inference
                    (narrowing lattice, null tokens, duration syntax), parquet
                    loader, CSV sink with multi-statement -N suffixing.
- ``functions``   — scalar builders for the dialect's function set (date parts
                    with the reference's week() quirk, abs, coalesce, inc,
                    encrypt/decrypt) expressed as pyspark.sql.functions trees.
- ``operators``   — relational helpers (first-row DISTINCT, top-k) plus the
                    beyond-reference scale operators: dedup (exact, MinHash-LSH,
                    SimHash, n-gram Jaccard, embedding cosine), similarity
                    search (brute-force + LSH-bucketed ANN), text analysis
                    (lang-id, quality, token counts, fingerprints), multimodal
                    column plumbing.
- ``streaming``   — Structured Streaming equivalents of the batch operators.
"""

__version__ = "0.1.0"

from csvtool_spark.session import get_spark  # noqa: F401
