"""Bucketed Parquet tables: shuffle-free co-located joins and aggregations.

At 100 TB the dominant cost of fact-to-fact joins (household⟕avg_diffs,
lineitem⟕orders) is the shuffle of both sides. Writing both tables bucketed
by the join key with the same bucket count makes the join a zero-exchange
sort-merge: Spark reads matching buckets pairwise, and with ``sortBy`` the
sort is pre-done too. The write costs one shuffle ONCE; every downstream
join/groupBy on the bucket key is then exchange-free — the classic
write-once/read-many trade for pipeline stage outputs (SURVEY §3A: every
stage is a Parquet checkpoint, so stage sinks are exactly where bucketing
belongs).

Bucketed tables must live in the session catalog (bucket metadata is not
self-describing in the files), hence ``saveAsTable`` + a warehouse dir
rather than plain ``.parquet(path)``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    num_buckets: int = 32,
    sort_cols: Sequence[str] | None = None,
) -> None:
    """Write ``df`` as a bucketed (optionally bucket-sorted) Parquet table in
    the session catalog. ``num_buckets`` should match the downstream
    consumer's parallelism appetite: each bucket is one task in a
    bucket-join, so at cluster scale use hundreds-to-thousands."""
    writer = (
        df.write.mode("overwrite").format("parquet").bucketBy(
            int(num_buckets), *bucket_cols
        )
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Catalog read; bucket metadata rides along so joins/aggs on the bucket
    key plan without an Exchange."""
    return spark.table(table)
