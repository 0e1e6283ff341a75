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
