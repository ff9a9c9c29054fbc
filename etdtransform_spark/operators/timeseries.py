"""Dense-calendar and value-reconstruction time-series operators.

The reference's resample only emits buckets where data exists (SURVEY §2.6
"scaffold of empty buckets": pandas builds a base grid with
``.resample(iv).size()`` then outer-merges, aggregate.py:843-861). These
operators make the scaffold explicit and add the two reconstruction
primitives a meter-reading pipeline needs around it: time-weighted linear
interpolation across gaps (the continuous cousin of the reference's
avg-diff imputation, impute.py:564-768) and exponentially weighted moving
averages (the recursive cousin of its rolling means,
calculated_columns.py:148-205).

Scale notes: the grid is generated with ``sequence()`` + ``explode`` —
a per-key generator, no driver loop, no cross-key shuffle beyond the one
min/max aggregate; interpolation and EWMA are window passes over
``partitionBy(key).orderBy(ts)``, so each key's series never straddles an
executor boundary and consecutive window ops reuse one sort. The EWMA
keeps a bounded frame (``lookback`` rows) and folds it with the
higher-order ``F.aggregate`` — JVM-side, no Python, O(lookback) memory
per row regardless of series length.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.scalars import qround, ts_micros


def scaffold_time_grid(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    interval: str,
    aggs: Sequence[Column] = (),
) -> DataFrame:
    """Dense per-key time grid: one row per ``interval`` bucket between each
    key's first and last observation, with per-bucket aggregates left-joined
    on — empty buckets appear with ``n = 0`` (reference aggregate.py:843-861
    builds this grid via pandas ``resample().size()`` + outer merge).

    The grid derives from one groupBy (min/max per key) followed by
    ``sequence()`` + ``explode`` — generation is distributed and linear in
    output size. The grid⟕agg join keys on (key, bucket): both sides hash
    to the same partitioning, one shuffle each.
    """
    keys = list(keys)
    bucket = F.date_trunc(_trunc_unit(interval), F.col(ts_col))
    span = df.groupBy(*keys).agg(
        F.date_trunc(_trunc_unit(interval), F.min(ts_col)).alias("_lo"),
        F.date_trunc(_trunc_unit(interval), F.max(ts_col)).alias("_hi"),
    )
    grid = span.select(
        *keys,
        F.explode(
            F.sequence("_lo", "_hi", F.expr(f"INTERVAL {interval}"))
        ).alias("bucket"),
    )
    per_bucket = (
        df.withColumn("bucket", bucket)
        .groupBy(*keys, "bucket")
        .agg(F.count(F.lit(1)).alias("n"), *aggs)
    )
    agg_names = [c for c in per_bucket.columns if c not in [*keys, "bucket"]]
    joined = grid.join(per_bucket, [*keys, "bucket"], "left")
    return joined.select(
        *keys,
        "bucket",
        F.coalesce(F.col("n"), F.lit(0)).alias("n"),
        *[c for c in agg_names if c != "n"],
    )


def _trunc_unit(interval: str) -> str:
    """'1 hour' -> 'hour'; only calendar-aligned single units make a
    truncatable grid (multi-unit grids would need epoch arithmetic)."""
    parts = interval.split()
    if len(parts) != 2 or parts[0] != "1":
        raise ValueError(
            f"scaffold interval must be a single calendar unit, got {interval!r}"
        )
    return parts[1]


def interpolate_linear(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    value_col: str,
    order_cols: Sequence[str] = (),
    digits: int = 6,
) -> DataFrame:
    """Time-weighted linear interpolation of null values between each key's
    nearest non-null neighbors (pandas ``interpolate(method="time")``
    semantics, strict: leading/trailing nulls stay null). The continuous
    alternative to the reference's LINEAR_FILL impute rule
    (vectorized_impute.py:630-678), which splits a gap jump evenly; this
    one weights by actual timestamp distance, so irregular cadences
    interpolate correctly.

    Two window passes (preceding ``last ignorenulls``, following ``first
    ignorenulls``) over the same partition ordering — Spark plans one sort.
    The fraction uses integer microseconds on both engines so the division
    is the identical IEEE op.
    """
    v = F.col(value_col).cast("double")
    order = [ts_col, *order_cols]
    w_back = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    us = ts_micros(F.col(ts_col))
    # Materialize each window result ONCE behind a projection boundary:
    # composing them inline would make Catalyst extract a window expression
    # per textual occurrence (the interp formula references prev/next many
    # times), evaluating ~40 window functions instead of 4.
    staged = df.select(
        "*",
        F.last(v, ignorenulls=True).over(w_back).alias("_pv"),
        F.last(F.when(v.isNotNull(), us), ignorenulls=True)
        .over(w_back)
        .alias("_pt"),
        F.first(v, ignorenulls=True).over(w_fwd).alias("_nv"),
        F.first(F.when(v.isNotNull(), us), ignorenulls=True)
        .over(w_fwd)
        .alias("_nt"),
    )
    frac = (us - F.col("_pt")).cast("double") / (
        F.col("_nt") - F.col("_pt")
    ).cast("double")
    # Degenerate bracket (prev and next non-null share the null row's
    # timestamp -> 0/0): define the result as the previous value, so both
    # engines agree instead of diverging on NULL-vs-NaN division semantics.
    interp = F.when(v.isNotNull(), v).otherwise(
        F.when(F.col("_nt") == F.col("_pt"), qround(F.col("_pv"), digits)).otherwise(
            qround(F.col("_pv") + frac * (F.col("_nv") - F.col("_pv")), digits)
        )
    )
    return staged.withColumn(f"{value_col}_interp", interp).drop(
        "_pv", "_pt", "_nv", "_nt"
    )


def ewma(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    value_col: str,
    alpha: float,
    lookback: int = 20,
    order_cols: Sequence[str] = (),
    digits: int = 6,
) -> DataFrame:
    """Truncated exponentially weighted moving average per key:
    ``y_t = alpha * x_t + (1 - alpha) * y_{t-1}`` seeded from the oldest row
    in a ``lookback``-row frame. The recursion is a left fold, which Spark
    cannot express as a plain window aggregate — instead the frame is
    collected (bounded: ``lookback`` doubles) and folded with the
    higher-order ``F.aggregate``, keeping everything JVM-side. Truncation
    bounds both memory and the weight of dropped history (``(1-alpha)^
    lookback``); the closed-form alternative (sum of ``x_i * (1-a)^{-i}``
    rescaled) overflows IEEE doubles for long series, so the fold is also
    the numerically honest version.

    Fold order is the window frame order (oldest -> newest); the SQL twin
    (DuckDB ``list() OVER`` + ``list_reduce``) runs the identical op
    sequence, so results agree to the last bit before the final rounding.

    Null observations are SKIPPED, not propagated: ``collect_list`` drops
    nulls, so a null row carries the previous rows' EWMA forward and
    contributes nothing (gap-carry semantics, consistent with the impute
    engine's treatment of missing diffs). A DuckDB twin over null-bearing
    data must add ``FILTER (WHERE x IS NOT NULL)`` to its ``list()`` to
    match — plain ``list()`` keeps nulls and would fold them into NULL.
    """
    w = (
        Window.partitionBy(*keys)
        .orderBy(ts_col, *order_cols)
        .rowsBetween(-(lookback - 1), Window.currentRow)
    )
    # Collect the frame ONCE (projection boundary — inline composition would
    # make Catalyst run one collect_list per textual reference), then fold.
    staged = df.withColumn(
        "_frame", F.collect_list(F.col(value_col).cast("double")).over(w)
    )
    arr = F.col("_frame")
    folded = F.aggregate(
        F.slice(arr, 2, lookback),
        # try_element_at: a frame whose every observation is NULL collects
        # to an EMPTY list (collect_list drops nulls) and plain element_at
        # would throw INVALID_ARRAY_INDEX under ANSI; such rows get NULL
        F.try_element_at(arr, F.lit(1)),
        lambda acc, x: F.lit(alpha) * x + F.lit(1.0 - alpha) * acc,
    )
    return staged.withColumn("ewma", qround(folded, digits)).drop("_frame")


def period_over_period(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    keys: Sequence[str],
    unit: str = "week",
    digits: int = 6,
) -> DataFrame:
    """Period-over-period comparison: per key, sum ``value_col`` into
    ``date_trunc(unit)`` buckets and compare each bucket with the PREVIOUS
    OBSERVED bucket (lag over the per-key bucket sequence) — change and
    percent change, NULL on the first bucket and on a zero/NULL base. The
    WoW/MoM/YoY reporting primitive.

    Emitting the previous bucket's timestamp keeps gap awareness explicit:
    a consumer that needs strictly-adjacent periods filters on
    ``prev_period = period - INTERVAL 1 unit`` (or composes with
    ``scaffold_time_grid`` for a dense calendar). One data-sized shuffle
    (the bucket aggregate); the lag window runs over the already-collapsed
    per-key bucket rows."""
    period = F.date_trunc(unit, F.col(ts_col)).alias("period")
    agg = df.groupBy(*keys, period).agg(
        qround(F.sum(F.col(value_col)), digits).alias("total")
    )
    w = Window.partitionBy(*keys).orderBy("period")
    prev = F.lag("total").over(w)
    prev_p = F.lag("period").over(w)
    return agg.select(
        *keys,
        "period",
        "total",
        prev_p.alias("prev_period"),
        qround(F.col("total") - prev, digits).alias("change"),
        qround(
            F.when(prev != 0, (F.col("total") - prev) / prev), digits
        ).alias("pct_change"),
    )


def cusum_changepoint(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    keys: Sequence[str],
    threshold: float = 3.0,
    digits: int = 6,
    order_cols: Sequence[str] = (),
) -> DataFrame:
    """Single change-point estimate per key via the CUSUM statistic: the
    running sum of standardized deviations C_t = Σ (x_i − μ)/σ peaks in
    magnitude at a level shift; the change-point estimate is
    argmax_t |C_t|, its significance the scaled peak max|C_t|/√n compared
    to ``threshold``. A series without a shift keeps the statistic near 0.

    Two passes sharing the key partitioning: per-key moment aggregate
    (μ, σ) joined back, then one window cumsum + one argmax aggregate —
    the statistic never leaves the executors. Ties on the peak pick the
    earliest timestamp, deterministically."""
    x = F.col(value_col).cast("double")
    # explicit sufficient-statistics moments (not avg/stddev_samp) so the
    # oracle can run the IDENTICAL op sequence — engine-internal variance
    # algorithms differ at the last ulp, which a 2000-step cumsum amplifies
    # n <= 1 keys get NULL sd (then dropped by the _sd > 0 filter like
    # zero-variance keys) instead of an ANSI DIVIDE_BY_ZERO abort
    mom = df.groupBy(*keys).agg(
        (F.sum(x) / F.count(x)).alias("_mu"),
        F.when(
            F.count(x) > 1,
            F.sqrt(
                (F.sum(x * x) - F.sum(x) * F.sum(x) / F.count(x))
                / (F.count(x) - 1)
            ),
        ).alias("_sd"),
        F.count(x).alias("_n"),
    )
    joined = df.join(mom, list(keys)).filter(
        x.isNotNull() & (F.col("_sd") > 0)
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy(ts_col, *order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = F.sum((x - F.col("_mu")) / F.col("_sd")).over(w)
    # argmax |C| with earliest-ts tie-break: max over (rounded |C|, -epoch)
    cand = F.struct(
        qround(F.abs(c), 9).alias("_a"),
        (-ts_micros(F.col(ts_col))).alias("_negts"),
        F.col(ts_col).alias("_ts"),
    )
    best = joined.withColumn("_cand", cand).groupBy(*keys).agg(
        F.max("_cand").alias("_m"),
        F.max("_n").alias("_nn"),
    )
    stat = F.col("_m._a") / F.sqrt(F.col("_nn"))
    return best.select(
        *keys,
        F.col("_m._ts").alias("changepoint_ts"),
        qround(stat, digits).alias("cusum_stat"),
        (stat > threshold).alias("significant"),
    )


def degree_days(
    df: DataFrame,
    ts_col: str,
    temp_col: str,
    base_heating: float = 18.0,
    base_cooling: float = 22.0,
    keys: Sequence[str] = (),
    digits: int = 4,
) -> DataFrame:
    """Heating / cooling degree days — the energy sector's weather-demand
    index (and the covariate the reference's heating analysis regresses
    against, README.md:299-326): per day (per key), the daily MEAN
    temperature's shortfall below the heating base and excess above the
    cooling base. Two stacked aggregates (hour→day mean, then the clamp) —
    one data shuffle on (keys, day), everything else arithmetic."""
    day = F.to_date(F.col(ts_col)).alias("day")
    t = F.col(temp_col).cast("double")
    daily = df.groupBy(*keys, day).agg(
        (F.sum(t) / F.count(t)).alias("_tavg")
    )
    # a day whose temperatures are all NULL has NULL mean — its degree
    # days must be NULL too (greatest() skips NULLs, so unguarded clamps
    # would fabricate 0.0 "no demand" for a day with no readings)
    have = F.col("_tavg").isNotNull()
    return daily.select(
        *keys,
        "day",
        qround(F.col("_tavg"), digits).alias("t_mean"),
        qround(
            F.when(
                have,
                F.greatest(F.lit(base_heating) - F.col("_tavg"), F.lit(0.0)),
            ),
            digits,
        ).alias("hdd"),
        qround(
            F.when(
                have,
                F.greatest(F.col("_tavg") - F.lit(base_cooling), F.lit(0.0)),
            ),
            digits,
        ).alias("cdd"),
    )


def seasonal_decompose(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    interval_seconds: int,
    period: int,
    keys: Sequence[str] = (),
    digits: int = 6,
) -> DataFrame:
    """Classical additive seasonal decomposition over a REGULAR series:
    value = trend + seasonal + residual — the pre-step for
    seasonally-adjusted anomaly detection and for reporting whether a
    metric moved beyond its daily/weekly rhythm (an energy-monitoring
    staple: consumption has a hard daily cycle that drowns raw deltas).

    ``interval_seconds`` is the series' fixed step, ``period`` the cycle
    length in steps (24 for a daily cycle on hourly data). Per row:

        trend    — centered ``period``-row moving average, NULL unless
                   the full window exists (edges don't get a fabricated
                   trend); row-centered simple MA — the textbook
                   even-period 2×MA refinement is intentionally skipped
                   (documented simplification, one window either way)
        phase    — floor(epoch / interval) % period, from TIME, not row
                   position, so missing buckets cannot shift the cycle
        seasonal — mean detrended value of the row's phase, re-centered
                   to zero mean over the key's phases (the classical
                   identifiability normalization), NULL if the phase
                   never has a defined trend
        residual — value − trend − seasonal

    NULL-ts/value rows are dropped, and so are NULL-KEY rows (an
    unattributed series decomposes nothing — the fairness-family
    convention, and what keeps the oracle's NOT NULL key filter
    equivalent). Plan shape: ONE per-key sort feeds
    the centered window; the phase profile is a (keys × period)-sized
    aggregate joined back on (keys, phase) — small relative to the data
    but proportional to the KEY DOMAIN, so the join strategy is left to
    AQE (broadcast when the profile fits, shuffle-hash when a
    high-cardinality key column outgrows the broadcast limit); no global
    sort, no driver loop. Input regularity is the
    caller's contract (resample first — ``operators/resample.py``);
    duplicate buckets bias the moving average like any MA.
    """
    klist = list(keys)
    v = F.col(value_col).cast("double")
    cond = F.col(ts_col).isNotNull() & v.isNotNull()
    for k in klist:
        cond = cond & F.col(k).isNotNull()
    base = df.filter(cond).select(
        *klist,
        F.col(ts_col).alias("_ts"),
        v.alias("_v"),
        F.pmod(
            F.floor(ts_micros(F.col(ts_col)) / F.lit(interval_seconds * 1_000_000)),
            F.lit(period),
        ).cast("int").alias("_phase"),
    )
    lo, hi = period // 2, period - period // 2 - 1
    w = (
        Window.partitionBy(*klist)
        .orderBy("_ts")
        .rowsBetween(-lo, hi)
    )
    trended = base.select(
        "*",
        F.when(
            F.count(F.lit(1)).over(w) == period,
            F.sum("_v").over(w) / F.lit(float(period)),
        ).alias("_trend"),
    )
    detr = F.col("_v") - F.col("_trend")
    prof = (
        trended.filter(F.col("_trend").isNotNull())
        .groupBy(*klist, "_phase")
        .agg(F.avg(detr).alias("_praw"))
    )
    wk = Window.partitionBy(*klist)
    # profile keys renamed with a _pk_ prefix: prof derives from trended
    # (shared lineage), and name-unique keys keep the join condition
    # unambiguous without DataFrame refs (the r6 self-join rule)
    prof = prof.select(
        *[F.col(k).alias(f"_pk_{k}") for k in klist],
        F.col("_phase").alias("_pphase"),
        (F.col("_praw") - F.avg("_praw").over(wk)).alias("_seasonal"),
    )
    cond = F.col("_phase") == F.col("_pphase")
    for k in klist:
        cond = cond & F.col(k).eqNullSafe(F.col(f"_pk_{k}"))
    # no broadcast hint: prof is (key-domain × period)-sized, NOT
    # constant-sized — a forced broadcast would fail past the 8 GB
    # driver/broadcast limit on a high-cardinality key column; AQE
    # picks broadcast automatically whenever prof is actually small
    joined = trended.join(prof, cond, "left")
    return joined.select(
        *klist,
        F.col("_ts").alias(ts_col),
        F.col("_phase").alias("phase"),
        qround(F.col("_v"), digits).alias("value"),
        qround(F.col("_trend"), digits).alias("trend"),
        qround(F.col("_seasonal"), digits).alias("seasonal"),
        qround(
            F.col("_v") - F.col("_trend") - F.col("_seasonal"), digits
        ).alias("residual"),
    )
