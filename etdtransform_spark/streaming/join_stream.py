"""Stream-stream time-interval join (watermarked both sides).

The hardest Structured Streaming join shape: two unbounded streams joined
on a key plus an event-time range condition. Spark buffers each side in
the state store and uses the watermarks + the time-interval bound to know
when buffered rows can never match again and may be evicted — without the
interval condition the state would grow forever.

Scale notes: state is partitioned by the join key across executors; the
eviction horizon is ``max_delay + interval`` so state size is
rate x horizon, independent of stream length. Append output mode emits
each matched pair exactly once.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    on: Column,
    left_ts: str,
    right_ts: str,
    max_delay: str = "1 hour",
) -> DataFrame:
    """Inner-join two watermarked streams on ``on`` (which must include an
    event-time range predicate between ``left_ts`` and ``right_ts`` —
    the caller expresses it in ``on`` so Catalyst sees one conjunction).
    Both sides get the same ``max_delay`` watermark."""
    lw = left.withWatermark(left_ts, max_delay)
    rw = right.withWatermark(right_ts, max_delay)
    return lw.join(rw, on, "inner")
