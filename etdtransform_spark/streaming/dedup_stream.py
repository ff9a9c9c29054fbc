"""Streaming deduplication: stateful ``dropDuplicates`` across micro-batches.

The streaming twin of the batch exact-dedup operator (operators/dedup.py):
Structured Streaming keeps the seen-key set in the state store, partitioned
by key across executors, so each micro-batch emits only first-seen keys. Use
``watermark_col`` + ``dropDuplicatesWithinWatermark`` in production to bound
state for time-scoped dedup; without it state grows with distinct keys
(exact global dedup).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def streaming_distinct(
    stream: DataFrame,
    cols: list[str],
    watermark_col: str | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """First-seen rows per distinct ``cols`` combination over the stream.
    Both modes return the FULL row schema (the first-seen row's payload);
    project afterwards if only the keys are wanted."""
    if watermark_col is not None:
        stream = stream.withWatermark(watermark_col, watermark)
        return stream.dropDuplicatesWithinWatermark(cols)
    return stream.dropDuplicates(cols)
