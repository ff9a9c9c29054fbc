"""Temporal ETL operators: overlapping-interval coalescing, SCD2 history
construction, and snapshot diffing.

The reference pipeline is append-only batch over fixed time grids; a
production warehouse around the same data needs the three temporal
maintenance primitives here — merging overlapping validity spans (the
"gaps and islands" problem), deriving slowly-changing-dimension history
from an observation log, and diffing two table snapshots for CDC /
regression checks. All pure window/join compositions.

Scale notes: every window partitions by the entity key (the same
discipline as the imputation engine — sequences never straddle a shuffle
boundary); snapshot_diff is one full-outer join on the key with
cardinality-collapsed change flags, never a row-by-row driver loop.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def merge_intervals(
    df: DataFrame,
    keys: Sequence[str],
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Coalesce overlapping/touching intervals per key into maximal islands
    (classic gaps-and-islands): an interval starts a new island iff its
    start exceeds the running max end of all earlier intervals (order by
    start, then end — deterministic under duplicates). Returns one row per
    island: (keys, island start, island end, n_merged).

    One window pass (running max over the preceding frame + running sum of
    island starts) and one aggregate — both partitioned by the key, so a
    key's intervals never cross executors.
    """
    w = Window.partitionBy(*keys).orderBy(start_col, end_col)
    prev_max_end = F.max(end_col).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    new_island = F.when(
        prev_max_end.isNull() | (F.col(start_col) > prev_max_end), 1
    ).otherwise(0)
    island = F.sum(new_island).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.withColumn("_island", island)
        .groupBy(*keys, "_island")
        .agg(
            F.min(start_col).alias("island_start"),
            F.max(end_col).alias("island_end"),
            F.count(F.lit(1)).alias("n_merged"),
        )
        .drop("_island")
    )


def overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    by: Sequence[str] = (),
    granularity_seconds: int = 3600,
) -> DataFrame:
    """Interval x interval overlap join (closed intervals: overlap iff
    ``l_start <= r_end AND r_start <= l_end``) without a
    BroadcastNestedLoopJoin.

    Both sides explode their interval onto coarse time buckets and
    equi-join on (bucket, *by); the exact overlap predicate then filters
    candidates. A pair whose intervals overlap shares EVERY bucket in the
    overlap region — emitting it once per shared bucket would need a
    distinct pass — so the join additionally pins each pair to one
    canonical bucket, the bucket of ``greatest(l_start, r_start)`` (always
    inside the overlap region and covered by both explode ranges). Exactly
    one output row per overlapping pair, no dedup shuffle.

    ``granularity_seconds`` trades explode factor (interval_len/g + 1 rows
    per input) against bucket selectivity — pick ~ the median interval
    length, same contract as :func:`rangejoin.range_join`.
    """
    from ..functions.scalars import ts_micros

    g = int(granularity_seconds * 1_000_000)
    lb = left.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(ts_micros(F.col(l_start)) / g),
                F.floor(ts_micros(F.col(l_end)) / g),
            )
        ),
    )
    rb = right.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(ts_micros(F.col(r_start)) / g),
                F.floor(ts_micros(F.col(r_end)) / g),
            )
        ),
    )
    keys = ["_bucket", *by]
    canonical = F.col("_bucket") == F.floor(
        F.greatest(ts_micros(F.col(l_start)), ts_micros(F.col(r_start))) / g
    )
    out = lb.join(rb, on=keys, how="inner").filter(
        (F.col(l_start) <= F.col(r_end))
        & (F.col(r_start) <= F.col(l_end))
        & canonical
    )
    return out.drop("_bucket")


def scd2_history(
    df: DataFrame,
    keys: Sequence[str],
    attr_col: str,
    ts_col: str,
    order_cols: Sequence[str] = (),
) -> DataFrame:
    """Slowly-changing-dimension (type 2) history from an observation log:
    collapse consecutive rows with an unchanged attribute, emit one row per
    attribute *version* with ``valid_from`` (first observation of the value)
    and ``valid_to`` (next version's start; null = currently open).

    Change detection is ``attr != lag(attr)`` (null-safe) over the entity
    window; versions then take ``lead(valid_from)`` for their close
    timestamp. Two window passes over the same (key, ts) sort.
    """
    order = [ts_col, *order_cols]
    w = Window.partitionBy(*keys).orderBy(*order)
    changed = (F.row_number().over(w) == 1) | (
        ~F.col(attr_col).eqNullSafe(F.lag(attr_col).over(w))
    )
    versions = df.withColumn("_chg", changed).filter(F.col("_chg"))
    w2 = Window.partitionBy(*keys).orderBy(*order)
    return versions.select(
        *keys,
        F.col(attr_col),
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w2).alias("valid_to"),
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str],
) -> DataFrame:
    """Row-level diff of two table snapshots on a key: one full-outer join
    emitting ``added`` / ``removed`` / ``changed`` rows (unchanged rows are
    filtered out — the output is change-proportional, which is what makes
    this viable as a CDC source at 100 TB). ``changed`` compares the listed
    columns null-safely. Output carries both sides' values prefixed
    ``old_`` / ``new_``.

    Null-robust: join keys match null-safely (a null-keyed row in both
    snapshots is one row, not an add+remove pair) and presence is tracked
    with explicit marker columns, so a null-keyed row only in ``old`` is
    correctly ``removed`` — key nullability is not a presence signal. An
    empty ``compare_cols`` degrades to a key-presence-only diff
    (added/removed, never changed).
    """
    keys = list(keys)
    o = old.select(
        *[F.col(k).alias(f"_ok_{k}") for k in keys],
        *[F.col(c).alias(f"old_{c}") for c in compare_cols],
        F.lit(True).alias("_old_present"),
    )
    nw = new.select(
        *[F.col(k).alias(f"_nk_{k}") for k in keys],
        *[F.col(c).alias(f"new_{c}") for c in compare_cols],
        F.lit(True).alias("_new_present"),
    )
    cond = None
    for k in keys:
        e = F.col(f"_ok_{k}").eqNullSafe(F.col(f"_nk_{k}"))
        cond = e if cond is None else (cond & e)
    j = o.join(nw, cond, "full_outer")
    old_present = F.coalesce(F.col("_old_present"), F.lit(False))
    new_present = F.coalesce(F.col("_new_present"), F.lit(False))
    same = F.lit(True)
    for c in compare_cols:
        same = same & F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
    status = (
        F.when(~old_present, F.lit("added"))
        .when(~new_present, F.lit("removed"))
        .when(~same, F.lit("changed"))
    )
    return (
        j.withColumn("status", status)
        .filter(F.col("status").isNotNull())
        .select(
            *[
                F.coalesce(F.col(f"_ok_{k}"), F.col(f"_nk_{k}")).alias(k)
                for k in keys
            ],
            "status",
            *[F.col(f"old_{c}") for c in compare_cols],
            *[F.col(f"new_{c}") for c in compare_cols],
        )
    )


def longest_streak(
    df: DataFrame,
    key_col: str,
    ts_col: str,
) -> DataFrame:
    """Longest run of consecutive active DAYS per key (login streaks,
    sensor liveness): collapse to distinct (key, day), subtract the per-key
    day row_number from the day (the gaps-and-islands anchor — consecutive
    days share the anchor), aggregate islands, take the longest per key
    (earliest start wins ties, deterministically).

    Everything after the first distinct is collapsed to day granularity —
    the window and both aggregates run on at most 365·keys rows/year, and
    all three share the one hash exchange on the key."""
    days = df.select(
        F.col(key_col).alias("key"), F.to_date(F.col(ts_col)).alias("day")
    ).distinct()
    w = Window.partitionBy("key").orderBy("day")
    islands = (
        days.withColumn(
            "_anchor",
            F.date_sub(F.col("day"), F.row_number().over(w)),
        )
        .groupBy("key", "_anchor")
        .agg(
            F.count(F.lit(1)).alias("streak_days"),
            F.min("day").alias("streak_start"),
            F.max("day").alias("streak_end"),
        )
    )
    best = islands.groupBy("key").agg(
        F.max(
            F.struct(
                F.col("streak_days").alias("d"),
                # negated epoch-day so ties prefer the EARLIEST start
                (-F.unix_date(F.col("streak_start"))).alias("neg_start"),
                F.col("streak_start").alias("s"),
                F.col("streak_end").alias("e"),
            )
        ).alias("_m")
    )
    return best.select(
        F.col("key").alias(key_col),
        F.col("_m.d").alias("streak_days"),
        F.col("_m.s").alias("streak_start"),
        F.col("_m.e").alias("streak_end"),
    )


def time_weighted_avg(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    bucket_seconds: int,
    keys: Sequence[str] = (),
    digits: int = 6,
) -> DataFrame:
    """Time-weighted average over IRREGULAR observations — the correct
    per-bucket mean for meter readings and sensor states, where a plain
    AVG over-weights chatty periods (ten readings in one minute count
    ten times; the state that held for an hour counts once). Each
    reading's value holds from its timestamp until the NEXT reading of
    the same key (last-observation-carried-forward); per tumbling
    ``bucket_seconds`` bucket this integrates value·dt over the covered
    time and divides by covered seconds:

        (keys..., bucket_ts, twa, covered_seconds, n_readings)

    The final reading of a key carries no duration (its segment is
    unbounded — integrating it would invent coverage), so it counts in
    ``n_readings`` of its bucket but contributes no area; buckets with
    zero covered time have NULL twa. NULL ts/value/key rows are
    excluded. Tied timestamps order by VALUE (deterministic: the
    highest value at a tied instant carries forward; the ties
    themselves span zero time either way — without this, the lead()
    pairing would be engine- and run-dependent). All duration
    arithmetic is INTEGER microseconds — exact and engine-portable;
    only the final area/μs division is float.

    Scale shape: ONE per-key window (lead) gives each segment its end;
    a segment spanning k buckets explodes into k rows via ``sequence``
    (generator, no driver loop) with overlap clipped per bucket; ONE
    hash aggregate per (keys, bucket). A reading held for a year
    explodes into 365 daily rows — bounded by covered time over bucket
    size, never by row count; no global sort, no cross-key traffic.
    """
    from ..functions.scalars import qround, ts_micros

    klist = list(keys)
    v = F.col(value_col).cast("double")
    cond = F.col(ts_col).isNotNull() & v.isNotNull()
    for k in klist:
        cond = cond & F.col(k).isNotNull()
    us = F.lit(int(bucket_seconds) * 1_000_000)
    base = df.filter(cond).select(
        *klist,
        ts_micros(F.col(ts_col)).alias("_t0"),
        v.alias("_v"),
    )
    w = Window.partitionBy(*klist).orderBy("_t0", "_v")
    seg = base.select(
        *klist, "_t0", "_v", F.lead("_t0").over(w).alias("_t1")
    )
    # bucket index range covered by [t0, t1); the final (open) segment
    # covers only its own bucket for the n_readings count
    b0 = F.floor(F.col("_t0") / us)
    b1 = F.when(
        F.col("_t1").isNotNull(), F.floor((F.col("_t1") - 1) / us)
    ).otherwise(b0)
    spans = seg.select(
        *klist, "_t0", "_t1", "_v",
        F.explode(F.sequence(b0, F.greatest(b1, b0))).alias("_b"),
    )
    bs = F.col("_b") * us
    be = bs + us
    ov = F.when(
        F.col("_t1").isNotNull(),
        F.least(F.col("_t1"), be) - F.greatest(F.col("_t0"), bs),
    ).otherwise(F.lit(0))
    agg = spans.groupBy(*klist, "_b").agg(
        F.sum(ov).cast("bigint").alias("_cov"),
        F.sum(ov.cast("double") * F.col("_v")).alias("_area"),
        F.count(F.when(F.col("_t0") >= bs, 1)).cast("bigint").alias(
            "n_readings"
        ),
    )
    return agg.select(
        *klist,
        F.timestamp_micros(F.col("_b") * us).alias("bucket_ts"),
        qround(
            F.when(
                F.col("_cov") > 0,
                F.col("_area") / F.col("_cov").cast("double"),
            ),
            digits,
        ).alias("twa"),
        (F.col("_cov").cast("double") / 1e6).alias("covered_seconds"),
        "n_readings",
    )
