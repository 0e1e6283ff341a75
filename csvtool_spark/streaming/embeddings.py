"""Structured Streaming over the EMBEDDINGS table — the vector-ingest
shape: embedding shards land in a directory (an upstream encoder job
writes them), each file becomes a micro-batch, and the vector operators
run incrementally.

- ``embedding_stream``: file-source stream of embedding parquet shards.
- ``clustered_stream``: per-micro-batch k-means ASSIGNMENT against a
  batch-trained centroid table (``clustering.kmeans_fit``) — the
  train-offline / score-online split every production clusterer uses.
  The assignment is a pure projection (centroid literals ride the task
  closure, no join, no aggregation), so the stream needs no watermark
  and stays stateless — legal in append mode, fusable into the source
  scan, and bit-identical to the batch ``kmeans_assign`` on the same
  rows (exact integer distances, same struct-min tie-break).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from csvtool_spark.operators import clustering

EMBEDDINGS_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("label", T.IntegerType()),
    ]
)


def stream_embeddings_dir(spark: SparkSession, stream_dir: str) -> DataFrame:
    """File-source stream over a directory of embedding parquet shards."""
    return (
        spark.readStream.schema(EMBEDDINGS_SCHEMA)
        .format("parquet")
        .load(stream_dir)
    )


def embedding_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stage the testdata embeddings shard into a fresh stream directory
    (production points at the encoder-output directory instead)."""
    import shutil
    import tempfile

    stream_dir = tempfile.mkdtemp(prefix="emb_stream_")
    shutil.copy(f"{sf_dir}/embeddings.parquet", f"{stream_dir}/embeddings.parquet")
    return stream_embeddings_dir(spark, stream_dir)


def clustered_stream(
    stream: DataFrame,
    centroids: list[list[int]],
    scale: int = 10_000,
    keep: tuple[int, ...] | None = None,
) -> DataFrame:
    """Assign each arriving vector to its nearest trained centroid —
    (vec_id, label, cluster, dist2) per input row, stateless.

    ``keep`` filters to the given cluster ids (route one topic's vectors
    to a sink, drop the rest) — still a pure projection + filter."""
    # on_invalid='null': stream input never passes the fit's validation,
    # and a raise inside mapInPandas fails the micro-batch — a restart
    # then replays the same poison record into a crash loop. A ragged /
    # non-finite arriving vector gets a null cluster instead (dropped by
    # any ``keep`` filter, visible otherwise).
    out = clustering.kmeans_assign(
        stream, "embedding", "vec_id", centroids, scale=scale,
        extra_cols=("label",), on_invalid="null",
    )
    if keep is not None:
        out = out.filter(F.col("cluster").isin(*[int(c) for c in keep]))
    return out


def pq_coded_stream(
    stream: DataFrame,
    codebook,
    centroids: list[tuple[int, list[float]]] | None = None,
) -> DataFrame:
    """Encode arriving vectors into the (IVF ×) PQ index layout — the
    ingest half of ANN index maintenance: an upstream encoder drops
    embedding shards, this stage emits (vec_id, label[, cell], pq_codes)
    rows appendable into the ``ivf_pq_index_write`` layout. Codebook and
    centroids come from a BATCH training job (``similarity.pq_train`` /
    ``ivf_centroids``) — the same train-offline / apply-online split as
    ``clustered_stream``; encoding a batch of the same rows is
    bit-identical (test-pinned).

    Stateless pure projection: codebook/centroid literals ride the task
    closure (no join, no aggregation, no watermark), so the stream is
    legal in append mode and fusable into the source scan. A
    dim-mismatched or NULL vector — or one carrying a NULL/NaN/Inf
    element, which would otherwise encode confidently-wrong codes —
    yields NULL cell/codes instead of raising: a raise would fail the
    micro-batch and replay the same poison record into a crash loop (the
    ``clustered_stream`` rationale); route ``pq_codes IS NULL`` rows to
    a quarantine sink."""
    from csvtool_spark.operators import similarity

    # the packed struct is computed (and the O(dim) validity fold run)
    # exactly ONCE in the first projection; the second projects its
    # fields and gates the cell fold on the materialized struct's
    # nullness instead of re-running the validity check per column
    mid = stream.select(
        F.col("vec_id"),
        F.col("label"),
        F.col("embedding"),
        similarity._packed_codes(codebook, "embedding", on_invalid="null")
        .alias("__pc"),
    )
    cols = [F.col("vec_id"), F.col("label")]
    if centroids is not None:
        cols.append(
            F.when(
                F.col("__pc").isNotNull(),
                similarity.ivf_cell(F.col("embedding"), centroids),
            ).alias("cell")
        )
    cols.append(F.col("__pc")["pq"].alias("pq_codes"))
    return mid.select(*cols)
