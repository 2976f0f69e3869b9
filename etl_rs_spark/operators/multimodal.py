"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The Spark-side contract is real and tested — schema, Arrow batch shape,
mapInPandas partitioning — while the actual codec work is stubbed: this
container ships no image/audio libraries, so ``decode`` delegates to a
clearly marked stub that either raises NotImplementedError (strict mode)
or produces a deterministic fake feature vector (test mode). Swapping in
Pillow/torchaudio later changes ONE function, not the pipeline.

At 100 TB: binary payloads never pass through Python row-at-a-time —
they move as Arrow buffers into mapInPandas batches; metadata-only
stages (filter by mime/size/dims) are pure Column expressions that never
touch the bytes, and Parquet column pruning means a metadata query never
reads the binary column at all.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("mime", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_bytes", IntegerType()),
        StructField("payload", BinaryType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("mime", StringType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)


def synth_media(spark: SparkSession, n: int, seed: int = 42, partitions: int = 8) -> DataFrame:
    """Deterministic fake media table (payload = seeded bytes). Generated
    distributed from spark.range — no driver materialization. Small test
    fixtures default to 8 partitions so a tiny table doesn't spin up one
    Python worker per core."""
    mimes = F.array(F.lit("image/png"), F.lit("image/jpeg"), F.lit("audio/wav"))
    df = (
        spark.range(0, n, 1, numPartitions=min(partitions, max(1, n // 8) or 1))
        .withColumn("media_id", F.format_string("m-%08d", F.col("id")))
        .withColumn("mime", F.element_at(mimes, (F.pmod(F.xxhash64("id", F.lit(seed)), F.lit(3)) + 1).cast("int")))
        .withColumn("width", (F.pmod(F.xxhash64("id", F.lit("w")), F.lit(512)) + 16).cast("int"))
        .withColumn("height", (F.pmod(F.xxhash64("id", F.lit("h")), F.lit(512)) + 16).cast("int"))
        .withColumn("payload", F.encode(F.format_string("payload-%d", F.col("id")), "utf-8"))
        .withColumn("n_bytes", F.length("payload").cast("int"))
    )
    return df.select([f.name for f in MEDIA_SCHEMA.fields])


def filter_media_metadata(
    df: DataFrame,
    mimes: tuple[str, ...] | None = None,
    min_pixels: int | None = None,
    max_bytes: int | None = None,
) -> DataFrame:
    """Metadata-only gate — never dereferences the payload column, so a
    Parquet scan prunes the binary bytes entirely (check ReadSchema)."""
    out = df
    if mimes is not None:
        out = out.filter(F.col("mime").isin(*mimes))
    if min_pixels is not None:
        out = out.filter(F.col("width") * F.col("height") >= min_pixels)
    if max_bytes is not None:
        out = out.filter(F.col("n_bytes") <= max_bytes)
    return out


def _decode_stub(payload: bytes, mime: str, dim: int, strict: bool) -> list[float]:
    """THE STUB: real deployments replace this with Pillow / libsndfile /
    pyav decode + model featurization. Deterministic fake in test mode."""
    if strict:
        raise NotImplementedError(
            "media decode requires image/audio libraries not present in "
            "this environment; swap _decode_stub for a real codec"
        )
    rng = np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
    base = np.resize(rng, dim)
    return (base / 255.0).astype(np.float32).tolist()


def extract_features(
    df: DataFrame, dim: int = 8, strict: bool = False, batch_size_hint: int | None = None
) -> DataFrame:
    """Arrow-batched feature extraction over the binary payload.

    mapInPandas: payload bytes arrive as zero-copy Arrow buffers per
    batch; output drops the payload (features only), so downstream
    stages shuffle small rows.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": pdf["mime"],
                    "feature": [
                        _decode_stub(p, m, dim, strict)
                        for p, m in zip(pdf["payload"], pdf["mime"])
                    ],
                }
            )

    return df.mapInPandas(run, FEATURE_SCHEMA)


def frame_sample_plan(
    df: DataFrame, every_n: int = 10, id_col: str = "media_id"
) -> DataFrame:
    """Video frame-sampling *plan*: emits (media_id, frame_idx) rows for
    every_n-th frame from the metadata duration proxy (n_bytes), without
    decoding. The decode of selected frames then routes through
    extract_features on a frame table."""
    n_frames = (F.col("n_bytes") / F.lit(1)).cast("int")
    idx = F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)), F.lit(every_n))
    return df.select(id_col, F.explode(idx).alias("frame_idx"))
