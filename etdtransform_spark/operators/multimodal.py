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
) -> DataFrame:
    """Decode media content and emit per-item features via ``mapInPandas``.

    The real pipeline would decode images (resize), sample video frames, or
    window audio here; this stub hashes the payload instead. The Arrow batch
    loop, output schema, and partition behavior are production-shaped.
    Batch sizing is governed by ``spark.sql.execution.arrow.
    maxRecordsPerBatch`` (session conf), not a per-call knob.
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


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_idx", LongType(), False),
        StructField("frame_ts_ms", LongType(), False),
        StructField("frame_sha256", StringType(), True),
    ]
)


def sample_video_frames(
    df: DataFrame,
    every_ms: int = 1000,
    decode_stub: str = "deterministic",
) -> DataFrame:
    """Sample frames at a fixed cadence from video rows.

    Frame TIMESTAMPS are enumerated Catalyst-side (``sequence`` + explode —
    cheap, prunable, proportional to output) so the Arrow kernel receives one
    row per target frame, which is exactly the shape a real ffmpeg-seek
    decode produces; the per-frame decode itself is the stubbed step
    (sha256(content:ts) stands in for decode+hash of the frame bitmap).
    Requires ``duration_ms`` to be non-null on video rows.
    """
    if decode_stub not in ("deterministic", "raise"):
        raise ValueError("decode_stub must be 'deterministic' or 'raise'")
    frames = (
        # duration must be known and positive: greatest/least SKIP null
        # operands in Spark, so an unfiltered null duration would fabricate
        # a phantom frame at ts=0 instead of dropping the row
        df.filter(
            (F.col("modality") == "video")
            & F.col("duration_ms").isNotNull()
            & (F.col("duration_ms") > 0)
        )
        .select(
            "media_id",
            "content",
            F.posexplode(
                F.sequence(
                    F.lit(0).cast("long"),
                    F.greatest(F.col("duration_ms") - 1, F.lit(0)).cast("long"),
                    F.lit(int(every_ms)).cast("long"),
                )
            ).alias("frame_idx", "frame_ts_ms"),
        )
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode_stub == "raise":
                raise NotImplementedError(
                    "frame decode requires ffmpeg; integrate the seek+decode here"
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "frame_idx": pdf["frame_idx"].astype("int64"),
                    "frame_ts_ms": pdf["frame_ts_ms"].astype("int64"),
                    "frame_sha256": [
                        hashlib.sha256(
                            bytes(c) + b":" + str(ts).encode()
                        ).hexdigest()
                        if c is not None
                        else None
                        for c, ts in zip(pdf["content"], pdf["frame_ts_ms"])
                    ],
                }
            )

    return frames.mapInPandas(decode, schema=FRAME_SCHEMA)


CHUNK_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("chunk_idx", LongType(), False),
        StructField("start_ms", LongType(), False),
        StructField("end_ms", LongType(), False),
        StructField("chunk_sha256", StringType(), True),
    ]
)


def chunk_audio(
    df: DataFrame,
    window_ms: int = 30_000,
    hop_ms: int = 15_000,
    decode_stub: str = "deterministic",
) -> DataFrame:
    """Overlapping audio windows (the ASR/embedding pre-segmentation shape):
    window starts every ``hop_ms`` while they begin inside the clip, end
    clamped to the clip. Same Catalyst-enumerate / Arrow-decode split as
    :func:`sample_video_frames`."""
    chunks = (
        # same null/zero-duration guard as sample_video_frames: least()
        # skipping a null _dur would un-clamp end_ms to a full window
        df.filter(
            (F.col("modality") == "audio")
            & F.col("duration_ms").isNotNull()
            & (F.col("duration_ms") > 0)
        )
        .select(
            "media_id",
            "content",
            F.col("duration_ms").cast("long").alias("_dur"),
            F.posexplode(
                F.sequence(
                    F.lit(0).cast("long"),
                    F.greatest(F.col("duration_ms") - 1, F.lit(0)).cast("long"),
                    F.lit(int(hop_ms)).cast("long"),
                )
            ).alias("chunk_idx", "start_ms"),
        )
        .withColumn("end_ms", F.least(F.col("start_ms") + window_ms, F.col("_dur")))
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode_stub == "raise":
                raise NotImplementedError("audio decode integration point")
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "chunk_idx": pdf["chunk_idx"].astype("int64"),
                    "start_ms": pdf["start_ms"].astype("int64"),
                    "end_ms": pdf["end_ms"].astype("int64"),
                    "chunk_sha256": [
                        hashlib.sha256(
                            bytes(c) + b":" + str(s).encode() + b"-" + str(e).encode()
                        ).hexdigest()
                        if c is not None
                        else None
                        for c, s, e in zip(
                            pdf["content"], pdf["start_ms"], pdf["end_ms"]
                        )
                    ],
                }
            )

    return chunks.mapInPandas(decode, schema=CHUNK_SCHEMA)


RESIZE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("resized", BinaryType(), True),
        StructField("resized_sha256", StringType(), True),
    ]
)


def resize_images(
    df: DataFrame,
    target_w: int = 224,
    target_h: int = 224,
    decode_stub: str = "deterministic",
) -> DataFrame:
    """Image resize stage (decode -> resample -> re-encode). Stub emits a
    deterministic pseudo-bitmap (sha256 digest bytes) tagged with the target
    geometry; a real implementation swaps only the kernel body (PIL resize),
    keeping schema, batching, and partition behavior identical."""
    imgs = df.filter(F.col("modality") == "image").select("media_id", "content")

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode_stub == "raise":
                raise NotImplementedError("image decode integration point")
            payloads = [
                hashlib.sha256(
                    bytes(c) + f":{target_w}x{target_h}".encode()
                ).digest()
                if c is not None
                else None
                for c in pdf["content"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": target_w,
                    "height": target_h,
                    "resized": payloads,
                    "resized_sha256": [
                        hashlib.sha256(p).hexdigest() if p is not None else None
                        for p in payloads
                    ],
                }
            )

    return imgs.mapInPandas(decode, schema=RESIZE_SCHEMA)
