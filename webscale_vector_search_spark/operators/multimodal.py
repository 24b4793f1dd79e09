"""Multimodal (binary) column operators — X6 + §2.8 mandate.

Design: image/audio/video payloads are opaque BINARY columns with typed
metadata; all Spark-side plumbing (schema, partitioning, Arrow batch shape,
UDF signatures) is real and tested. The actual codec step is STUBBED — the
decode libraries (PIL/ffmpeg/librosa) are not in this container — behind
either a deterministic fake (for pipeline tests) or NotImplementedError
(for the real-codec entry points).

Sources at scale: `spark.read.format("binaryFile")` yields
(path, modificationTime, length, content BINARY) with content lazily read
per file; partition-parallel, never driver-materialized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),  # image | audio | video
        T.StructField("content", T.BinaryType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_hash", T.StringType()),
    ]
)

FEATURE_DIM = 16  # dimension of the stub feature extractor's output


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic fake media table: each document's UTF-8 bytes become an
    opaque payload, media_type assigned round-robin by id. Gives the binary
    pipeline a reproducible fixture without shipping real media."""
    media_type = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    content = F.col("text").cast("binary")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        media_type.alias("media_type"),
        content.alias("content"),
        F.length(content).cast("bigint").alias("n_bytes"),
        F.md5(content).alias("content_hash"),
    )


def media_stats(media: DataFrame) -> DataFrame:
    """Byte-level stats per media_type — the X6 'length/hash stats' surface."""
    return media.groupBy("media_type").agg(
        F.count("*").alias("n_items"),
        F.sum("n_bytes").alias("total_bytes"),
        F.min("n_bytes").alias("min_bytes"),
        F.max("n_bytes").alias("max_bytes"),
        F.count_distinct("content_hash").alias("n_distinct"),
    )


def decode_image(media: DataFrame) -> DataFrame:
    """REAL-CODEC ENTRY POINT (stub): decode image bytes to (h, w, c).

    The Spark plumbing (mapInPandas over Arrow batches, schema contract) is
    the deliverable; the codec requires PIL, absent in this container.
    """
    raise NotImplementedError(
        "image decode requires an image codec library (e.g. PIL); "
        "use extract_features() for the deterministic stub pipeline"
    )


def extract_features(media: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """Feature extraction with a deterministic fake codec.

    Real shape: mapInPandas over Arrow record batches, one numpy pass per
    batch, output (media_id, media_type, feature ARRAY<FLOAT>). The fake
    'model' hashes fixed-size byte windows — stable across runs/partitions,
    so downstream similarity plumbing is testable end-to-end.
    """
    import numpy as np
    import pandas as pd

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("media_type", T.StringType()),
            T.StructField("feature", T.ArrayType(T.FloatType())),
        ]
    )

    def extract(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            feats = []
            for raw in pdf["content"]:
                b = np.frombuffer(bytes(raw), dtype=np.uint8)
                # deterministic fake embedding: mean/std of `dim` byte strides
                pad = (-len(b)) % dim
                if pad:
                    b = np.concatenate([b, np.zeros(pad, dtype=np.uint8)])
                strides = b.reshape(dim, -1)
                feats.append((strides.mean(axis=1) / 255.0).astype(np.float32))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "feature": feats,
                }
            )

    return media.select("media_id", "media_type", "content").mapInPandas(extract, out_schema)


def frame_sample_plan(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling plumbing (stub codec): emits the (media_id,
    frame_no) fan-out a real decoder would fill with pixels. Frame count is
    faked deterministically from payload size (1 frame per 64 bytes)."""
    frames = media.filter(F.col("media_type") == "video").select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest((F.col("n_bytes") / 64).cast("int") - 1, F.lit(0)))
        ).alias("frame_no"),
    )
    return frames.filter(F.col("frame_no") % every_n == 0)
