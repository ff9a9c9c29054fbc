"""Streaming top-N leaderboard via foreachBatch.

Window functions (rank) are not allowed inside a streaming aggregation —
the standard pattern is to keep the STATEFUL part minimal (a windowed
count, complete mode) and apply the full batch query surface per
micro-batch in ``foreachBatch``, publishing a ranked snapshot to a plain
sink. The leaderboard on disk is always a complete, consistent snapshot of
"top N per bucket so far"; each micro-batch overwrites it (idempotent —
replays converge to the same snapshot, the same property the
exactly-once sink formalizes with its txn log).

At scale: the stateful aggregate's state is one counter per (bucket,
item); the ranked rewrite runs over the aggregate's output (bucket x item
cardinality), never the stream.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def streaming_leaderboard(
    stream: DataFrame,
    item_col: str,
    out_path: str,
    window: str = "1 day",
    n: int = 3,
    ts_col: str = "ts",
    watermark: str = "1 hour",
):
    """Maintain the top-``n`` items per time bucket on ``out_path``.
    Returns the StreamingQuery (caller awaits termination)."""
    agg = (
        stream.withWatermark(ts_col, watermark)
        .groupBy(
            F.window(ts_col, window).alias("_w"),
            F.col(item_col).alias("item"),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("_w.start").alias("bucket_start"), "item", "n_events")
    )

    def publish(batch_df: DataFrame, _batch_id: int) -> None:
        w = Window.partitionBy("bucket_start").orderBy(
            F.col("n_events").desc(), F.col("item").asc()
        )
        ranked = (
            batch_df.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= n)
            .withColumn("rank", F.col("rank").cast("bigint"))
        )
        ranked.write.mode("overwrite").parquet(out_path)

    return (
        agg.writeStream.foreachBatch(publish)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
