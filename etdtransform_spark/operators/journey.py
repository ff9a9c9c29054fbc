"""User-journey / lifecycle analytics: ordered funnels, cohort
retention, survival curves, Markov transitions, and common-path mining.

The round-11 family: the questions a product/experiment pipeline asks of
an event log AFTER the per-event operators (sessionize, attribution,
drift) have run — all expressed as user-keyed aggregates + item-domain
rollups so every operator is one-to-three data-sized shuffles with
dictionary-sized outputs, never a per-user driver loop.

Scale notes (100 TB):
- every operator shuffles on the user key at most twice (first-touch
  rollup + join-back); the join-back side is user-domain-sized, so AQE
  dispatches broadcast vs shuffle per deployment;
- outputs are step- / cohort-week- / state-pair- / path-top-k-sized —
  dictionary tables, safe to collect or broadcast downstream;
- ``top_paths`` bounds the per-user path to ``max_steps`` BEFORE the
  path aggregate, so no unbounded per-user array crosses a shuffle.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.scalars import qround, ts_micros


def funnel_conversion(
    df: DataFrame,
    user_col: str,
    type_col: str,
    ts_col: str,
    steps: Sequence[str],
    digits: int = 6,
) -> DataFrame:
    """Strict-order funnel: a user converts step *i* only with an event
    of type ``steps[i]`` STRICTLY AFTER their step *i−1* conversion time
    (first-touch semantics: each step's conversion time is the MINIMUM
    qualifying timestamp). The standard product question "of those who
    viewed, how many then clicked, then purchased — in that order".

    Returns one row per step: (step_idx, step_name, n_users,
    conv_from_prev, conv_from_first). Conversion rates are NULL when
    the denominator is 0 (no users reached the prior step).

    Shape: one filtered scan builds the per-(user, step-type) event set;
    step 1 is a plain min aggregate; each later step is a user-keyed
    join of that step's events against the running conversion frontier
    + a min aggregate — k−1 user-domain joins for a k-step funnel, each
    map-side combinable. No per-user window over the whole log, no
    collect_list.
    """
    if len(steps) < 1:
        raise ValueError("steps must name at least one funnel stage")
    u, t = F.col(user_col), F.col(ts_col)
    base = df.filter(
        u.isNotNull() & t.isNotNull() & F.col(type_col).isin(list(steps))
    ).select(
        u.alias("_u"), F.col(type_col).alias("_ty"), t.alias("_ts")
    )
    # frontier: per-user conversion time of the current step
    frontier = (
        base.filter(F.col("_ty") == steps[0])
        .groupBy("_u")
        .agg(F.min("_ts").alias("_ft"))
    )
    counts = [frontier.agg(F.count(F.lit(1)).alias("_n"))]
    for step in steps[1:]:
        nxt = (
            base.filter(F.col("_ty") == step)
            .join(frontier, "_u")
            .filter(F.col("_ts") > F.col("_ft"))
            .groupBy("_u")
            .agg(F.min("_ts").alias("_ft"))
        )
        frontier = nxt
        counts.append(frontier.agg(F.count(F.lit(1)).alias("_n")))
    rows = None
    for i, (step, cnt) in enumerate(zip(steps, counts)):
        r = cnt.select(
            F.lit(i + 1).cast("bigint").alias("step_idx"),
            F.lit(step).alias("step_name"),
            F.col("_n").cast("bigint").alias("n_users"),
        )
        rows = r if rows is None else rows.unionByName(r)
    w_first = F.first("n_users").over(
        Window.orderBy("step_idx").rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
    )
    w_prev = F.lag("n_users").over(Window.orderBy("step_idx"))
    out = rows.select(
        "step_idx",
        "step_name",
        "n_users",
        qround(
            F.when(
                w_prev > 0, F.col("n_users").cast("double") / w_prev
            ),
            digits,
        ).alias("conv_from_prev"),
        qround(
            F.when(
                w_first > 0, F.col("n_users").cast("double") / w_first
            ),
            digits,
        ).alias("conv_from_first"),
    )
    return out


def retention_cohorts(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    max_offset: int = 8,
    digits: int = 6,
) -> DataFrame:
    """Weekly cohort retention table: cohort = the ISO week of a user's
    FIRST activity; a user counts as retained at offset *k* if they have
    any activity in cohort_week + k. The canonical growth-accounting
    triangle.

    Weeks are epoch-day // 7 (a fixed Thursday-anchored grid — engine
    portable, no locale week rules). Offsets beyond ``max_offset`` are
    dropped (bounds the output to cohorts × offsets).

    Returns (cohort_week, week_offset, cohort_size, n_active,
    retention_rate), retention_rate = n_active / cohort_size.

    Shape: first-activity rollup (user-keyed aggregate), join-back on
    user (user-domain build side — AQE broadcasts when it fits), one
    distinct over (cohort, offset, user) and one count aggregate; the
    cohort-size rollup reuses the offset-0 rows. Output is
    weeks × max_offset — dictionary-sized.
    """
    u, t = F.col(user_col), F.col(ts_col)
    # timestamp columns funnel through ts_micros (TIMESTAMP_NTZ rejects a
    # direct double cast; the micros→/1e6→/604800→floor IEEE op sequence
    # is mirrored exactly by the DuckDB oracle)
    dtype = dict(df.dtypes).get(ts_col, "")
    secs = (
        ts_micros(t) / F.lit(1000000.0)
        if dtype.startswith("timestamp")
        else t.cast("double")
    )
    wk = F.floor(secs / F.lit(604800.0)).cast("bigint")
    base = df.filter(u.isNotNull() & t.isNotNull()).select(
        u.alias("_u"), wk.alias("_wk")
    )
    first = base.groupBy("_u").agg(F.min("_wk").alias("_cw"))
    active = (
        base.join(first, "_u")
        .select(
            "_u", F.col("_cw"), (F.col("_wk") - F.col("_cw")).alias("_off")
        )
        .filter(F.col("_off") <= max_offset)
        .distinct()
    )
    counts = active.groupBy(
        F.col("_cw").alias("cohort_week"), F.col("_off").alias("week_offset")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_active"))
    sizes = counts.filter(F.col("week_offset") == 0).select(
        "cohort_week", F.col("n_active").alias("cohort_size")
    )
    return (
        counts.join(F.broadcast(sizes), "cohort_week")
        .select(
            "cohort_week",
            "week_offset",
            "cohort_size",
            "n_active",
            qround(
                F.when(
                    F.col("cohort_size") > 0,
                    F.col("n_active").cast("double")
                    / F.col("cohort_size").cast("double"),
                ),
                digits,
            ).alias("retention_rate"),
        )
    )


def kaplan_meier(
    df: DataFrame,
    duration_col: str,
    event_col: str,
    digits: int = 6,
) -> DataFrame:
    """Kaplan-Meier product-limit survival estimator: at each distinct
    event time t, S(t) = Π_{t_i ≤ t} (1 − d_i / n_i) with d_i the events
    and n_i the at-risk count at t_i (subjects with duration ≥ t_i;
    right-censored rows — ``event_col`` false/0 — leave the risk set
    without contributing an event). The time-to-convert / time-to-churn
    curve that a naive mean-of-durations gets wrong under censoring.

    Returns one row per distinct EVENT time: (t, n_risk, n_events,
    n_censored, survival). The product is computed as
    exp(Σ ln(1 − d/n)) over the ordered prefix — a single cumulative
    window — with the 0-factor case (d = n at some time) handled
    exactly: survival is 0 from that time on (a running min of the
    factor detects it, since ln(0) is undefined).

    Shape: one (duration)-keyed count aggregate (data-sized,
    map-side combined), then windows over the distinct-duration table.
    NULL/NaN durations and negative durations are excluded.
    """
    d = F.col(duration_col).cast("double")
    e = F.col(event_col).cast("int")
    base = df.filter(
        d.isNotNull() & ~F.isnan(d) & (d >= 0) & e.isNotNull()
    ).select(d.alias("_t"), e.alias("_e"))
    per_t = base.groupBy("_t").agg(
        F.sum("_e").cast("bigint").alias("_d"),
        F.count(F.lit(1)).cast("bigint").alias("_c"),
    )
    w_desc = Window.orderBy(F.col("_t").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_asc = Window.orderBy("_t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    risked = per_t.withColumn("_n", F.sum("_c").over(w_desc))
    factor = (
        F.lit(1.0)
        - F.col("_d").cast("double") / F.col("_n").cast("double")
    )
    # ln receives NULL (not 0) for non-positive factors: a conditional
    # branch does NOT guarantee the gated expression is never evaluated
    # (the InferFilters hazard class), so the guard is INSIDE the
    # argument; sum() skips the NULL and the running-min flag decides
    curve = (
        risked.withColumn("_f", factor)
        .withColumn("_minf", F.min("_f").over(w_asc))
        .withColumn(
            "_s",
            F.when(F.col("_minf") <= 0, F.lit(0.0)).otherwise(
                F.exp(
                    F.sum(
                        F.log(F.when(F.col("_f") > 0, F.col("_f")))
                    ).over(w_asc)
                )
            ),
        )
    )
    return curve.filter(F.col("_d") > 0).select(
        F.col("_t").alias("t"),
        F.col("_n").alias("n_risk"),
        F.col("_d").alias("n_events"),
        (F.col("_c") - F.col("_d")).cast("bigint").alias("n_censored"),
        qround(F.col("_s"), digits).alias("survival"),
    )


def markov_transitions(
    df: DataFrame,
    user_col: str,
    type_col: str,
    ts_col: str,
    order_col: str | None = None,
    digits: int = 6,
) -> DataFrame:
    """First-order Markov transition table over each user's
    time-ordered event sequence: count consecutive (from_state,
    to_state) pairs across all users, row-normalized to transition
    probabilities. The behavioral fingerprint drift monitors compare
    release-over-release.

    Ordering within a user is (ts, order_col) — pass a unique id as
    ``order_col`` so ties are engine-deterministic. Transitions never
    cross users (window partitioned by user). Returns (from_state,
    to_state, n, p) with p = n / Σ_to n.

    Shape: one user-partitioned lag window (the sequence pass — one
    shuffle on user), one (from, to) count aggregate, one from-keyed
    rollup joined back broadcast — the output is state²-sized.
    """
    u, ty, t = F.col(user_col), F.col(type_col), F.col(ts_col)
    order = [t] + ([F.col(order_col)] if order_col else [])
    base = df.filter(u.isNotNull() & ty.isNotNull() & t.isNotNull())
    w = Window.partitionBy(u).orderBy(*order)
    pairs = (
        base.withColumn("_prev", F.lag(ty).over(w))
        .filter(F.col("_prev").isNotNull())
        .groupBy(
            F.col("_prev").alias("from_state"), ty.alias("to_state")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    row_tot = pairs.groupBy("from_state").agg(
        F.sum("n").alias("_tot")
    )
    return pairs.join(F.broadcast(row_tot), "from_state").select(
        "from_state",
        "to_state",
        "n",
        qround(
            F.when(
                F.col("_tot") > 0,
                F.col("n").cast("double") / F.col("_tot").cast("double"),
            ),
            digits,
        ).alias("p"),
    )


def top_paths(
    df: DataFrame,
    user_col: str,
    type_col: str,
    ts_col: str,
    order_col: str | None = None,
    max_steps: int = 8,
    k: int = 10,
) -> DataFrame:
    """Top-k most common user paths: each user's first ``max_steps``
    events (time-ordered, ``order_col`` tiebreak) joined into a
    '>'-separated path string, counted across users, top k by
    (count desc, path asc — deterministic).

    The per-user path is bounded BEFORE the path aggregate
    (row_number ≤ max_steps), so no unbounded array crosses a shuffle;
    the path table is then ≤ users rows of ≤ max_steps-term strings,
    and the final top-k is a TakeOrdered, not a full sort.

    Returns (path, n_users, path_len).
    """
    u, ty, t = F.col(user_col), F.col(type_col), F.col(ts_col)
    order = [t] + ([F.col(order_col)] if order_col else [])
    base = df.filter(u.isNotNull() & ty.isNotNull() & t.isNotNull())
    w = Window.partitionBy(u).orderBy(*order)
    stepped = base.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") <= max_steps
    )
    paths = stepped.groupBy(u.alias("_u")).agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("_rn"), ty.alias("_ty")))
                ),
                lambda s: s["_ty"],
            ),
            ">",
        ).alias("path"),
        F.max("_rn").cast("bigint").alias("path_len"),
    )
    counted = paths.groupBy("path", "path_len").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users")
    )
    return (
        counted.orderBy(F.col("n_users").desc(), F.col("path"))
        .limit(k)
        .select("path", "n_users", "path_len")
    )
