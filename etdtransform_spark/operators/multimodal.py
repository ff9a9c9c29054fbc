"""Multimodal column plumbing: image/audio/video as opaque ``binary`` columns
with typed metadata, processed by Arrow-batched ``mapInPandas`` stages.

The Spark-side plumbing (schemas, batch iteration, partition sizing, UDF
signatures) is real and tested; the actual media decode is STUBBED — codec
libraries (PIL/ffmpeg/torchaudio) are not available in this environment.
``decode_stub='deterministic'`` produces a seeded fake so downstream operators
(feature joins, dedup on features) are testable end-to-end;
``decode_stub='raise'`` marks the integration point with NotImplementedError.

Scale notes: media rows are large and few per partition —
``spark.sql.files.maxPartitionBytes`` should be lowered (e.g. 32 MB) when
scanning media parquet so a batch of decoded frames fits executor memory.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("modality", StringType(), False),  # image | audio | video
        StructField("content", BinaryType(), True),
        StructField("mime_type", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("modality", StringType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("content_sha256", StringType(), True),
        StructField("features", ArrayType(DoubleType()), True),
    ]
)


def _fake_features(payload: bytes | None, dim: int) -> list[float]:
    """Deterministic stand-in for a real decode+embed: bytes of the sha256
    digest scaled to [0, 1). Stable across runs and engines."""
    if payload is None:
        return [0.0] * dim
    digest = hashlib.sha256(payload).digest()
    need = (dim + len(digest) - 1) // len(digest)
    raw = (digest * need)[:dim]
    return [b / 256.0 for b in raw]


def extract_media_features(
    df: DataFrame,
    feature_dim: int = 8,
    decode_stub: str = "deterministic",
    batch_size_hint: int = 64,
) -> DataFrame:
    """Decode media content and emit per-item features via ``mapInPandas``.

    The real pipeline would decode images (resize), sample video frames, or
    window audio here; this stub hashes the payload instead. The Arrow batch
    loop, output schema, and partition behavior are production-shaped.
    """
    if decode_stub not in ("deterministic", "raise"):
        raise ValueError("decode_stub must be 'deterministic' or 'raise'")

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode_stub == "raise":
                raise NotImplementedError(
                    "media decode requires codec libraries not present in this "
                    "environment; integrate PIL/ffmpeg here"
                )
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "n_bytes": pdf["content"].map(
                        lambda b: len(b) if b is not None else 0
                    ),
                    "content_sha256": pdf["content"].map(
                        lambda b: hashlib.sha256(b).hexdigest() if b is not None else None
                    ),
                    "features": pdf["content"].map(
                        lambda b: _fake_features(b, feature_dim)
                    ),
                }
            )
            yield out

    return df.mapInPandas(process, schema=FEATURE_SCHEMA)


def synthesize_media_table(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests (binary payloads derived from
    the row id — no external data)."""
    base = spark.range(n).select(
        F.col("id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("id") % 3 + 1).cast("int"),
        ).alias("modality"),
        F.sha2(F.concat(F.lit(str(seed)), F.col("id").cast("string")), 256)
        .cast("binary")
        .alias("content"),
        F.lit("application/octet-stream").alias("mime_type"),
        F.lit(64).cast("int").alias("width"),
        F.lit(64).cast("int").alias("height"),
        (F.col("id") * 1000).alias("duration_ms"),
    )
    return base
