"""General OLAP operators beyond the reference's fixed pipeline: top-k,
rollup/grouping-sets, pivot, exact count-distinct, sliding time windows.

The reference has no ORDER BY/LIMIT, no grouping sets, no pivot and no
count-distinct (SURVEY.md §2.4/§2.5 "no grouping sets / cube / rollup /
count-distinct ... no limit/top-k operator"); a complete engine a reference
user could switch to needs them, and they are all native Catalyst operators
— each function here is a thin, documented composition, kept as named ops so
the coverage map and oracle queries have a stable surface.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def top_k(df: DataFrame, order: Sequence[Column], k: int) -> DataFrame:
    """Global top-k by a total order. ``orderBy(...).limit(k)`` compiles to
    TakeOrderedAndProject: each partition keeps a k-row heap and the driver
    merges P heaps — O(n log k) work, no global sort, no full shuffle. The
    ``order`` must be total (include a tie-break key) or the result set is
    nondeterministic under partitioning."""
    return df.orderBy(*order).limit(k)


def rollup_stats(
    df: DataFrame,
    keys: Sequence[str],
    aggs: Sequence[Column],
) -> DataFrame:
    """Hierarchical subtotals over ``keys`` (k+1 grouping sets: full detail →
    grand total). Emits one ``grouping_<key>`` indicator per key (1 = this
    key is rolled up in that row) so consumers — and the SQL oracle — can
    tell a subtotal row from a detail row whose key is genuinely NULL.
    Spark executes rollup as a single Expand + hash aggregate: one scan,
    one shuffle, regardless of how many grouping sets."""
    gcols = [F.grouping(c).cast("bigint").alias(f"grouping_{c}") for c in keys]
    return df.rollup(*keys).agg(*gcols, *aggs)


def pivot_table(
    df: DataFrame,
    group_col: str,
    pivot_col: str,
    pivot_values: Sequence[str],
    agg: Column,
) -> DataFrame:
    """Wide table: one row per ``group_col``, one column per pivot value.
    ``pivot_values`` is explicit — never discovered from data — so the output
    schema is static (a requirement for both plan caching and the oracle);
    Spark then plans a single hash aggregate with len(values) conditional
    aggregates instead of a distinct-scan + per-value pass."""
    return df.groupBy(group_col).pivot(pivot_col, list(pivot_values)).agg(agg)


def count_distinct_agg(
    df: DataFrame,
    keys: Sequence[str],
    distinct_col: str,
    approx: bool = False,
    rsd: float = 0.05,
) -> DataFrame:
    """Per-group cardinality: exact ``count_distinct`` (expands to a two-phase
    partial-distinct aggregate) or HyperLogLog++ ``approx_count_distinct``.
    At 100 TB exact count-distinct on a high-cardinality column is a full
    shuffle of the distinct pairs; the HLL sketch is a constant-size
    accumulator per group and is the scale path — exact stays the default
    because it is oracle-checkable."""
    counter = (
        F.approx_count_distinct(distinct_col, rsd)
        if approx
        else F.count_distinct(F.col(distinct_col))
    )
    return df.groupBy(*keys).agg(
        counter.alias(f"n_{distinct_col}"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def sliding_window_agg(
    df: DataFrame,
    ts_col: str,
    window_duration: str,
    slide_duration: str,
    aggs: Sequence[Column],
) -> DataFrame:
    """Overlapping time-window aggregate (`F.window` with a slide): each row
    contributes to window/slide windows; Spark expands the row once per
    window then hash-aggregates — identical shape to the batch side of a
    Structured Streaming sliding aggregation, so this op is the batch twin of
    streaming/resample_stream with a slide. Returns window_start plus aggs."""
    agged = df.groupBy(
        F.window(F.col(ts_col), window_duration, slide_duration)
    ).agg(*aggs)
    rest = [c for c in agged.columns if c != "window"]
    return agged.select(F.col("window.start").alias("window_start"), *rest)


def cube_stats(
    df: DataFrame,
    keys: Sequence[str],
    aggs: Sequence[Column],
) -> DataFrame:
    """All 2^k grouping sets over ``keys`` (cube), with one
    ``grouping_<key>`` indicator per key exactly like :func:`rollup_stats`
    — the cross-tab completion of the rollup hierarchy. Same physical
    shape: a single Expand (2^k output rows per input row) + one hash
    aggregate; partial aggregation still combines map-side, so the shuffle
    carries group aggregates, not raw rows. Keep k small (<= 4): Expand
    multiplies the scan by 2^k before combining."""
    gcols = [F.grouping(c).cast("bigint").alias(f"grouping_{c}") for c in keys]
    return df.cube(*keys).agg(*gcols, *aggs)


def top_k_per_group(
    df: DataFrame,
    keys: Sequence[str],
    order: Sequence[Column],
    k: int,
) -> DataFrame:
    """Top-k rows per group under a total order — the generalization of
    :func:`latest_snapshot` (k=1). Plans with Spark's WindowGroupLimit
    rewrite: each partition keeps only k rows per key BEFORE the shuffle,
    so the exchange carries ≤ k·|keys| rows instead of the full table —
    the property that makes per-entity leaderboards viable on a 100 TB
    log. ``order`` must be total (tie-break on a unique column) or
    membership at the k boundary is nondeterministic."""
    from pyspark.sql import Window

    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .withColumnRenamed("_rk", "rank_in_group")
    )


def cumulative_distinct(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    bucket_col: Column,
    bucket_name: str = "bucket",
) -> DataFrame:
    """Running distinct-count per key over ordered buckets (e.g. cumulative
    unique users per event_type by day) — the distinct window aggregate
    Spark (and ANSI SQL) cannot express directly as
    ``count(DISTINCT x) OVER (...)``.

    Shape: each (key, value) contributes at its FIRST bucket (min-bucket
    aggregate — one shuffle on (key, value)); new-value counts per bucket
    then join the observed bucket grid (so buckets with activity but no
    new values still appear, with the carried total) and a running sum
    over buckets yields the cumulative count. Never materializes per-row
    distinct state; the running sum runs over #buckets rows per key, not
    the event log.
    """
    keys = list(keys)
    b = df.select(*keys, F.col(value_col).alias("_val"), bucket_col.alias(bucket_name))
    firsts = b.groupBy(*keys, "_val").agg(F.min(bucket_name).alias(bucket_name))
    news = firsts.groupBy(*keys, bucket_name).agg(
        F.count(F.lit(1)).alias("n_new")
    )
    grid = b.select(*keys, bucket_name).distinct()
    from pyspark.sql import Window

    w = (
        Window.partitionBy(*keys)
        .orderBy(bucket_name)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(news, [*keys, bucket_name], "left")
        .withColumn("n_new", F.coalesce(F.col("n_new"), F.lit(0)))
        .withColumn("cumulative_distinct", F.sum("n_new").over(w))
    )


def group_mode(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
) -> DataFrame:
    """Most frequent value per group with a deterministic tie-break
    (highest count, then lowest value). ``F.mode`` is tie-nondeterministic
    under partitioning, so this is the portable shape: count per
    (key, value), then one ``min(struct(-count, value))`` aggregate — no
    window sort over the log, no join-back. Two map-side-combining
    shuffles; the second stage plans as SortAggregate (struct aggregation
    buffers are not hash-aggregable) but sorts only the collapsed
    (key, value) cardinality, with partial combine before its exchange.

    Returns (keys..., mode_value, mode_count).
    """
    keys = list(keys)
    counts = df.groupBy(*keys, value_col).agg(F.count(F.lit(1)).alias("_cnt"))
    best = counts.groupBy(*keys).agg(
        F.min(
            F.struct(
                (-F.col("_cnt")).alias("_nc"), F.col(value_col).alias("_v")
            )
        ).alias("_m")
    )
    return best.select(
        *keys,
        F.col("_m._v").alias("mode_value"),
        (-F.col("_m._nc")).alias("mode_count"),
    )


def latest_snapshot(
    df: DataFrame,
    keys: Sequence[str],
    order: Sequence[Column],
) -> DataFrame:
    """Current-state snapshot of an event log: the single latest row per
    key under a total ``order`` (QUALIFY row_number() = 1 — the standard
    CDC/SCD "latest record wins" dedup). Planned as a window over
    ``partitionBy(keys)`` — one hash shuffle on the key, per-partition
    sort, no join back. ``order`` must be total (tie-break on a unique id)
    or the survivor is nondeterministic under partitioning."""
    from pyspark.sql import Window

    w = Window.partitionBy(*keys).orderBy(*[o.desc() for o in order])
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def pareto_frontier(
    df: DataFrame,
    x_col: str,
    y_col: str,
    buckets: int = 64,
) -> DataFrame:
    """2-D Pareto skyline over distinct (x, y) points, both maximized: a
    point survives iff no other point is ≥ in both dimensions and > in at
    least one. The classic "best price/size tradeoff" query no SQL operator
    expresses directly — the naive formulation is a quadratic NOT EXISTS
    self-join.

    Distributed scan-line, two phases. Dominance pruning is valid within ANY
    subset of the points (a point dominated by a bucket-mate is dominated
    globally), so phase 1 computes a local skyline per hash bucket with a
    per-bucket sorted window: order (x desc, y desc), a point is dominated
    iff max(y) over the preceding frame ≥ its own y (exact for distinct
    points — the preceding frame holds exactly the points with greater x, or
    equal x and greater y). Phase 2 repeats the same scan-line once over the
    ~buckets·|skyline_local| survivors in a single partition. The quadratic
    join never happens; the only full-data ops are distinct + one window
    sort per bucket. Worst case (fully anti-correlated data) the skyline IS
    the dataset and no algorithm avoids emitting it.
    """
    from pyspark.sql import Window

    x, y = F.col(x_col), F.col(y_col)
    pts = df.select(x.alias("x"), y.alias("y")).distinct()

    def scanline(pdf: DataFrame, part: Sequence[str]) -> DataFrame:
        w = (
            Window.partitionBy(*part)
            .orderBy(F.desc("x"), F.desc("y"))
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        pm = F.max("y").over(w)
        return (
            pdf.withColumn("_pm", pm)
            .filter(F.col("_pm").isNull() | (F.col("_pm") < F.col("y")))
            .drop("_pm")
        )

    local = scanline(
        pts.withColumn("_b", F.pmod(F.xxhash64("x", "y"), F.lit(buckets))),
        ["_b"],
    ).drop("_b")
    return scanline(local, []).select(
        F.col("x").alias(x_col), F.col("y").alias(y_col)
    )
