"""Interval-containment (range) join — point-in-interval matching without a
cross product.

Spark turns a bare inequality join (``p.ts BETWEEN i.start AND i.end``) into
a BroadcastNestedLoopJoin: every point row is compared to every interval —
O(|points| x |intervals|) work that is fatal at scale. This module uses the
standard bucketed-range-join strategy (the same idea behind DuckDB's IEJoin
fallback buckets and Databricks' range-join hints):

1. choose a bucket granularity ``g`` (seconds),
2. each interval is exploded to the coarse buckets it overlaps
   (``sequence(floor(start/g), floor(end/g))`` — an interval of length L
   lands in ~L/g + 1 buckets),
3. each point maps to exactly ONE bucket (``floor(ts/g)``),
4. equi-join on the bucket id (plus any shared ``by`` keys), then apply the
   exact containment predicate.

The equi-join hashes both sides by bucket — a shuffle-hash/sort-merge plan
that scales linearly in input + output size. Because a point has one bucket,
no dedup pass is needed. Pick ``g`` near the median interval length:
too small explodes intervals, too large degrades each bucket to a mini
cross-join (AQE skew-split bounds the damage).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.scalars import ts_micros


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str = "ts",
    start_col: str = "session_start",
    end_col: str = "session_end",
    granularity_seconds: int = 3600,
    by: Sequence[str] = (),
) -> DataFrame:
    """Inner join of point rows to the interval rows whose closed range
    ``[start_col, end_col]`` contains ``point_ts`` (plus equality on optional
    shared ``by`` keys). Returns all interval columns + all point columns;
    ambiguous names must be disambiguated upstream.

    A point contained in k intervals yields k rows (same as the SQL
    inequality join).
    """
    g = int(granularity_seconds) * 1_000_000  # microseconds
    # drop inverted intervals up front: sequence(hi, lo) would otherwise
    # generate a DESCENDING bucket list, exploding one corrupt row into
    # every bucket between its swapped endpoints
    intervals = intervals.filter(F.col(end_col) >= F.col(start_col))
    iv = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(ts_micros(F.col(start_col)) / g),
                F.floor(ts_micros(F.col(end_col)) / g),
            )
        ),
    )
    pt = points.withColumn(
        "_bucket", F.floor(ts_micros(F.col(point_ts)) / g)
    )
    keys = ["_bucket", *by]
    joined = iv.join(pt, on=keys, how="inner").filter(
        (F.col(point_ts) >= F.col(start_col))
        & (F.col(point_ts) <= F.col(end_col))
    )
    return joined.drop("_bucket")
