"""Streaming approximate distinct counts via mergeable HLL sketch state.

Exact streaming COUNT(DISTINCT) is unsupported by design (state would be
the full value set per group); the scalable shape is an HLL sketch per
(key, window) — fixed-size state regardless of stream length, mergeable
across micro-batches by the same sketch union that
`operators/incremental.py` uses across batch runs. DataSketches HLL stays
EXACT while in its sparse (coupon) mode, so at test cardinalities the
streaming answer equals the batch COUNT(DISTINCT) oracle; past sparse mode
the error is ~0.8% at lg_k=14 — the documented trade.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_distinct_count(
    stream: DataFrame,
    key_cols: Sequence[str],
    value_col: str,
    window: str,
    ts_col: str = "ts",
    watermark: str = "1 hour",
    lg_k: int = 14,
) -> DataFrame:
    """Distinct ``value_col`` per key per tumbling window, HLL-estimated.
    One stateful aggregation: state = one sketch per open (key, window)
    group, evicted at the watermark horizon."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(*key_cols, F.window(ts_col, window).alias("_w"))
        .agg(
            F.hll_sketch_estimate(
                F.hll_sketch_agg(F.col(value_col), F.lit(lg_k))
            ).alias("n_distinct")
        )
        .select(
            *key_cols,
            F.col("_w.start").alias("bucket_start"),
            "n_distinct",
        )
    )
