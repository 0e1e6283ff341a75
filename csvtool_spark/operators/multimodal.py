"""Multimodal column plumbing: media as opaque ``binary`` columns with
typed metadata, processed through Arrow-batched ``mapInPandas``.

The Spark-side shape is real and tested — schema contract, partition-size
control, batch iteration, UDF signatures. The actual media decode is
STUBBED (``decode_image``): this environment has no image/audio libraries,
so the stub derives deterministic fake features from the bytes. Swapping in
PIL/torchvision/ffmpeg is a one-function change.

Scale notes: media rows are large — keep ``spark.sql.files.maxPartitionBytes``
modest and repartition by size before decode so one task ≈ one Arrow batch
of a few hundred MB; never collect binaries to the driver.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Output schema contract for decode_features.
FEATURE_SCHEMA = (
    "doc_id long, media_type string, n_bytes long, "
    "width int, height int, feature array<float>"
)


def attach_fake_media(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Build a deterministic binary 'media' column from text (test stand-in
    for real image/audio bytes) plus typed metadata."""
    blob = F.encode(F.col(text_col), "utf-8")
    return df.select(
        F.col(id_col).alias("doc_id"),
        blob.alias("media"),
        F.lit("image/fake").alias("media_type"),
        F.octet_length(blob).cast("long").alias("n_bytes"),
    )


def decode_image(data: bytes) -> tuple[int, int, list[float]]:
    """STUB decode: real implementation would be e.g. PIL.Image.open.
    Deterministic fake: dimensions from byte length, 8-dim byte-histogram
    feature. Raises NotImplementedError for non-fake media types upstream."""
    w = max(1, len(data) % 640)
    h = max(1, (len(data) * 7) % 480)
    hist = [0.0] * 8
    for by in data[:4096]:
        hist[by >> 5] += 1.0
    s = sum(hist) or 1.0
    return w, h, [v / s for v in hist]


def decode_features(df: DataFrame) -> DataFrame:
    """Arrow-batched decode: mapInPandas keeps whole Arrow batches in
    memory once, yields one output row per media row.

    The closure is fully self-contained (local decode function, no module
    globals): Python workers must not need ``csvtool_spark`` on their path —
    the driver may run from anywhere and executors don't inherit its
    sys.path."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        def _decode(data: bytes) -> tuple[int, int, list[float]]:
            # keep in sync with decode_image (module-level twin for tests)
            w = max(1, len(data) % 640)
            h = max(1, (len(data) * 7) % 480)
            hist = [0.0] * 8
            for by in data[:4096]:
                hist[by >> 5] += 1.0
            s = sum(hist) or 1.0
            return w, h, [v / s for v in hist]

        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                if r["media_type"] != "image/fake":
                    raise NotImplementedError(
                        f"no decoder for {r['media_type']} in this environment"
                    )
                w, h, feat = _decode(bytes(r["media"]))
                rows.append(
                    (int(r["doc_id"]), r["media_type"], int(r["n_bytes"]), w, h, feat)
                )
            yield _pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "media_type", "n_bytes", "width", "height", "feature",
                ],
            )

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample_plan(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video-frame sampling plumbing: explode a (stubbed) frame index list;
    the real decoder would emit per-frame binaries instead of indexes."""
    n_frames = (F.col("n_bytes") % 300 + 1).cast("int")
    idxs = F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))
    return df.select(
        "doc_id", F.explode(idxs).alias("frame_idx"), "media_type", "n_bytes"
    )
