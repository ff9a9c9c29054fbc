"""Structured Streaming drift monitor — the streaming half of
operators/stats.py:psi_time_drift (SURVEY §2.9 streaming-analogue axis).

Deployment shape: the REFERENCE distribution is frozen offline (batch
exact-percentile edges + bin counts over the reference window, a
dictionary-sized artifact); the stream then only maintains per-(window,
bin) counts on those fixed edges — n_bins rows of state per open window,
nothing else. PSI itself is a trivial batch roll-up over the materialized
(tiny) sink, so the stateful pipeline stays a single watermarked
aggregation (no chained stateful operators, which append-mode streaming
cannot express anyway).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.scalars import qround


def streaming_metric_bins(
    stream_df: DataFrame,
    value_col: str,
    ts_col: str,
    edges: Sequence[float],
    window: str = "1 day",
    watermark: str = "1 hour",
) -> DataFrame:
    """Watermarked tumbling-window histogram of ``value_col`` on FIXED
    interior ``edges`` (len(edges)+1 bins, same strict-``>`` fold as
    psi_drift). Late rows within the watermark land in their window;
    state per open window is exactly the bin-count rows. Returns a
    streaming frame (bucket_ts, bin, n)."""
    x = F.col(value_col).cast("double")
    arr = F.array(*[F.lit(float(e)) for e in edges])
    bin_idx = F.size(F.filter(arr, lambda e: x > e)) + F.lit(1)
    marked = stream_df.filter(x.isNotNull()).withWatermark(ts_col, watermark)
    return (
        marked.groupBy(
            F.window(F.col(ts_col), window).alias("_w"),
            bin_idx.alias("bin"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("_w.start").alias("bucket_ts"), "bin", "n")
    )


def psi_from_binned_counts(
    cur_bins: DataFrame,
    ref_bins: DataFrame,
    n_bins: int,
    digits: int = 6,
) -> DataFrame:
    """Batch PSI roll-up over materialized histogram counts: ``cur_bins``
    (bucket_ts, bin, n) from :func:`streaming_metric_bins`'s sink,
    ``ref_bins`` (bin, n) from the frozen reference. Semantics identical
    to psi_time_drift: full 1..n_bins Laplace spine, empty reference →
    n_ref = 0 with NULL psi. Everything here is dictionary-sized
    (windows × bins)."""
    ref_tot = ref_bins.agg(
        F.coalesce(F.sum("n"), F.lit(0)).alias("_na")
    )
    ref_r = ref_bins.select(
        F.col("bin").alias("_r_bin"), F.col("n").alias("_ca")
    )
    spine = (
        cur_bins.groupBy("bucket_ts")
        .agg(F.sum("n").alias("_nb"))
        .crossJoin(F.broadcast(ref_tot))
        .select(
            "bucket_ts",
            "_na",
            "_nb",
            F.explode(F.sequence(F.lit(1), F.lit(n_bins))).alias("bin"),
        )
    )
    cur_r = cur_bins.select(
        F.col("bucket_ts").alias("_c_bts"),
        F.col("bin").alias("_c_bin"),
        F.col("n").alias("_cb"),
    )
    full = (
        spine.join(
            F.broadcast(ref_r), F.col("bin") == F.col("_r_bin"), "left"
        )
        .drop("_r_bin")
        .join(
            cur_r,
            (F.col("bin") == F.col("_c_bin"))
            & (F.col("bucket_ts") == F.col("_c_bts")),
            "left",
        )
        .drop("_c_bin", "_c_bts")
    )
    na = F.col("_na").cast("double")
    nb = F.col("_nb").cast("double")
    pa = (F.coalesce(F.col("_ca"), F.lit(0)) + 0.5) / (na + 0.5 * n_bins)
    pb = (F.coalesce(F.col("_cb"), F.lit(0)) + 0.5) / (nb + 0.5 * n_bins)
    per_bin = full.select(
        "bucket_ts",
        F.col("_na").cast("bigint").alias("n_ref"),
        F.col("_nb").cast("bigint").alias("n_cur"),
        F.when((na > 0) & (nb > 0), (pa - pb) * F.log(pa / pb)).alias("_t"),
    )
    return per_bin.groupBy("bucket_ts").agg(
        F.max("n_ref").alias("n_ref"),
        F.max("n_cur").alias("n_cur"),
        qround(F.sum("_t"), digits).alias("psi"),
    )
