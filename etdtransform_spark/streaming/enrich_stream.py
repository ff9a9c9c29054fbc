"""Stream-static enrichment join + windowless running aggregation.

The canonical streaming ETL shape the reference's batch pipeline implies
but never needed (SURVEY §2.9 "Streaming: none"): an unbounded event
stream enriched against a slowly-changing dimension table (stream-static
join — the static side is re-read per micro-batch, so dimension updates
are picked up without restarting the query), then aggregated.

Scale notes: the static side is broadcast per micro-batch (dimension
tables are broadcast-sized by definition here); the aggregation state
lives in the state store partitioned by group key, so 1000 executors
shard state horizontally. No watermark is needed — the aggregate is
keyed by dimension attributes, not event time, and runs in complete
output mode.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def stream_static_enrich(
    stream: DataFrame,
    dim: DataFrame,
    on: Column,
    keys: Sequence[str],
    aggs: Sequence[Column],
) -> DataFrame:
    """Enrich ``stream`` with broadcast ``dim`` on the ``on`` predicate
    (inner equi-join — unmatched events drop, matching batch-join
    semantics), then group by ``keys`` with running ``aggs``."""
    return (
        stream.join(F.broadcast(dim), on, "inner")
        .groupBy(*keys)
        .agg(*aggs)
    )
