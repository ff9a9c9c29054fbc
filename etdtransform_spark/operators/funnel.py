"""Event-funnel and cohort-retention analytics over event streams.

Product-analytics staples that stress ordered multi-step semantics: a
k-step funnel is a chain of "first occurrence of step i at-or-after the
user's step i-1" constraints — each step is ONE conditional aggregate over
the user's events joined back on the user key, so a k-step funnel costs k
hash aggregates + k-1 broadcast-able joins on user-level (tiny) frames, with
the raw events scanned once per step and never self-joined row-to-row.
Retention is a double date-bucket distinct count. Both reduce to
shuffle-once-per-aggregate shapes that scale linearly.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.scalars import qround, ts_micros


def funnel_steps(
    df: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    within_seconds: float | None = None,
    strict: bool = False,
    checkpoint_steps: bool = True,
) -> DataFrame:
    """Per-user funnel timestamps: ``step1_ts`` = first occurrence of
    steps[0]; ``step{i}_ts`` = first occurrence of steps[i-1] at-or-after
    ``step{i-1}_ts`` (STRICTLY after with ``strict=True`` — the
    convention when a same-timestamp batch must not satisfy two steps;
    and, with ``within_seconds``, within that window of step1). Null from
    the first unreached step onward. One row per user who reached step 1.

    ``checkpoint_steps=True`` (default) cuts lineage after each step
    join with a lazy ``localCheckpoint`` — without it, step i's plan
    embeds step i-1 twice and the event scans grow 2^k. CAVEAT: a local
    checkpoint pins the per-user step frames to executor storage with NO
    recompute path — on a real cluster an executor loss makes the result
    unrecoverable and the job must be rerun. For fault-tolerant
    long-lived plans pass ``checkpoint_steps=False`` and cut lineage
    yourself (e.g. ``df.persist()`` + a count per step, or a reliable
    ``sparkContext.setCheckpointDir`` checkpoint), trading the 2^k scan
    blow-up for recoverability.
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    base = df.select(user_col, ts_col, type_col)
    cur = (
        base.filter(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("step1_ts"))
    )
    for i, step in enumerate(steps[1:], start=2):
        prev = f"step{i - 1}_ts"
        evts = base.filter(F.col(type_col) == step)
        cond = (
            F.col(ts_col) > F.col(prev)
            if strict
            else F.col(ts_col) >= F.col(prev)
        )
        if within_seconds is not None:
            cond = cond & (
                ts_micros(F.col(ts_col)) - ts_micros(F.col("step1_ts"))
                <= int(within_seconds * 1e6)
            )
        nxt = (
            evts.join(cur.select(user_col, "step1_ts", prev), user_col)
            .filter(cond)
            .groupBy(user_col)
            .agg(F.min(ts_col).alias(f"step{i}_ts"))
        )
        # lazy per-step lineage cut: step i's plan otherwise embeds step
        # i-1 TWICE (cur + nxt's join of cur), doubling the event scans
        # per step (2^k growth — measured 14 scans for a 3-step funnel,
        # 3 after). eager=False: materialized once at first action, no
        # job if the funnel is never executed; user-domain-sized frames.
        # Executor-loss caveat + opt-out: see docstring.
        cur = cur.join(nxt, user_col, "left")
        if checkpoint_steps:
            cur = cur.localCheckpoint(eager=False)
    return cur


def funnel_step_rates(
    df: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    within_seconds: float | None = None,
    strict: bool = False,
    digits: int = 6,
) -> DataFrame:
    """Global funnel summary on top of :func:`funnel_steps`: one row per
    step with the user count and the step-over-step / from-first
    conversion rates — the headline numbers
    :func:`funnel_conversion`'s per-cohort-day counts roll up to.

    ONE aggregate over the per-user step table (k counts in one pass);
    the rate windows run on the k-row result. Rates are NULL when the
    denominator is 0. Returns (step_idx, step_name, n_users,
    conv_from_prev, conv_from_first).
    """
    per_user = funnel_steps(
        df, steps, user_col, ts_col, type_col, within_seconds, strict
    )
    g = per_user.agg(
        *[
            F.count(F.col(f"step{i}_ts")).cast("bigint").alias(f"_n{i}")
            for i in range(1, len(steps) + 1)
        ]
    )
    # unpivot the 1-row aggregate via ONE explode — a union of k selects
    # would re-execute the whole per-user funnel per branch (measured:
    # 18 FileScans instead of 6 for a 3-step funnel)
    rows = g.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).cast("bigint").alias("step_idx"),
                        F.lit(step).alias("step_name"),
                        F.col(f"_n{i}").alias("n_users"),
                    )
                    for i, step in enumerate(steps, start=1)
                ]
            )
        ).alias("_s")
    ).select("_s.*")
    w_first = F.first("n_users").over(
        Window.orderBy("step_idx").rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
    )
    w_prev = F.lag("n_users").over(Window.orderBy("step_idx"))
    return rows.select(
        "step_idx",
        "step_name",
        "n_users",
        qround(
            F.when(w_prev > 0, F.col("n_users").cast("double") / w_prev),
            digits,
        ).alias("conv_from_prev"),
        qround(
            F.when(
                w_first > 0, F.col("n_users").cast("double") / w_first
            ),
            digits,
        ).alias("conv_from_first"),
    )


def funnel_conversion(
    df: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    within_seconds: float | None = None,
) -> DataFrame:
    """Daily-cohort funnel counts: users grouped by the DAY of their step-1
    timestamp; ``n_step{i}`` = how many of them reached step i. Conversion
    consumers divide downstream (kept as counts so the output is
    integer-exact)."""
    per_user = funnel_steps(df, steps, user_col, ts_col, type_col, within_seconds)
    aggs = [
        F.count(F.col(f"step{i}_ts")).alias(f"n_step{i}")
        for i in range(1, len(steps) + 1)
    ]
    return (
        per_user.withColumn("cohort_day", F.date_trunc("day", F.col("step1_ts")))
        .groupBy("cohort_day")
        .agg(*aggs)
    )


def transition_matrix(
    df: DataFrame,
    state_col: str = "event_type",
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_cols: Sequence[str] = (),
    round_digits: int = 6,
) -> DataFrame:
    """First-order Markov transition matrix over per-user event sequences:
    for every observed (from_state, to_state) pair, the transition count
    and the row-normalized probability count / sum(count over from_state).

    One window pass (``lead`` over the user timeline — the same
    partition-by-series-key exchange every ordered operator here shares)
    then a hash aggregate on state pairs; the normalizing row total is a
    window over the collapsed #states^2 rows, not the event log. Sequence
    order must be total (pass a unique id in ``order_cols``) or the lead
    is nondeterministic under ties.

    Returns (from_state, to_state, n_transitions, probability).
    """
    from ..functions.scalars import qround

    w = Window.partitionBy(user_col).orderBy(ts_col, *order_cols)
    pairs = (
        df.select(
            F.col(state_col).alias("from_state"),
            F.lead(state_col).over(w).alias("to_state"),
        )
        .filter(F.col("to_state").isNotNull())
        .groupBy("from_state", "to_state")
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )
    tot = Window.partitionBy("from_state")
    return pairs.withColumn(
        "probability",
        qround(
            F.col("n_transitions") / F.sum("n_transitions").over(tot),
            round_digits,
        ),
    )


def time_to_conversion(
    df: DataFrame,
    start_event: str,
    end_event: str,
    event_col: str = "event_type",
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-user latency from the first ``start_event`` to the first
    ``end_event`` at-or-after it (null when the user never converts —
    censored observations stay in the output for survival-style analysis).

    One conditional aggregate per user: min ts of the start event, then
    min ts of end events >= that start — both in a single groupBy pass
    using ``min(when(...))`` over the filtered union of the two event
    types (the scan prunes every other event type). No self-join.

    Returns (user, start_ts, end_ts, seconds_to_convert).
    """
    f = df.filter(F.col(event_col).isin([start_event, end_event]))
    agg = f.groupBy(user_col).agg(
        F.min(
            F.when(F.col(event_col) == start_event, F.col(ts_col))
        ).alias("start_ts"),
    )
    ends = (
        f.filter(F.col(event_col) == end_event)
        .select(user_col, F.col(ts_col).alias("_ets"))
        .join(agg, user_col)
        .filter(F.col("_ets") >= F.col("start_ts"))
        .groupBy(user_col)
        .agg(F.min("_ets").alias("end_ts"))
    )
    out = agg.filter(F.col("start_ts").isNotNull()).join(ends, user_col, "left")
    return out.select(
        user_col,
        "start_ts",
        "end_ts",
        (
            (ts_micros(F.col("end_ts")) - ts_micros(F.col("start_ts"))) / 1e6
        ).alias("seconds_to_convert"),
    )


def retention_cohorts(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    max_offset: int | None = None,
    with_rates: bool = False,
    digits: int = 6,
) -> DataFrame:
    """Weekly retention triangle: users bucketed by first-activity week
    (cohort); for each (cohort_week, week_offset) the distinct users active
    that many weeks later. Two aggregates: first-week per user, then a
    distinct count per (cohort, offset) — both shuffle on user-sized keys,
    never on raw events.

    ``max_offset`` drops offsets beyond the horizon (bounds the output
    to cohorts × offsets). ``with_rates=True`` additionally joins each
    cohort's size (its offset-0 count — a broadcast of the
    dictionary-sized triangle) and reports ``retention_rate`` =
    n_active / cohort_size: (cohort_week, week_offset, cohort_size,
    n_active, retention_rate)."""
    firsts = df.groupBy(user_col).agg(
        F.date_trunc("week", F.min(ts_col)).alias("cohort_week")
    )
    active = (
        df.select(user_col, F.date_trunc("week", F.col(ts_col)).alias("w"))
        .distinct()
        .join(firsts, user_col)
    )
    offset = (
        (ts_micros(F.col("w")) - ts_micros(F.col("cohort_week")))
        / F.lit(604_800_000_000)
    ).cast("bigint")
    active = active.withColumn("week_offset", offset)
    if max_offset is not None:
        active = active.filter(F.col("week_offset") <= max_offset)
    counts = active.groupBy("cohort_week", "week_offset").agg(
        F.count_distinct(F.col(user_col)).alias("n_active")
    )
    if not with_rates:
        return counts
    sizes = counts.filter(F.col("week_offset") == 0).select(
        "cohort_week", F.col("n_active").alias("cohort_size")
    )
    return counts.join(F.broadcast(sizes), "cohort_week").select(
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


def cooccurrence(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_pair_count: int = 1,
    max_basket_size: int | None = None,
) -> DataFrame:
    """Market-basket co-occurrence with lift: for every unordered item pair
    appearing together in a basket (user, session, order), the pair count
    and lift = P(a,b) / (P(a)·P(b)) over basket-level presence.

    Scale shape: collapse to DISTINCT (basket, item) pairs first — the
    self-join and every aggregate run on presence rows, never raw events.
    The join is an equijoin on the basket key with ``item_a < item_b``; its
    output is Σ|basket|², so ``max_basket_size`` caps pathological baskets
    (a window count per basket, dropped above the cap — the standard
    guard: a 10k-item basket contributes 50M pairs and no signal). Item
    marginals and the basket total ride back in as one broadcast join +
    one broadcast scalar."""
    pres = df.select(
        F.col(basket_col).alias("basket"), F.col(item_col).alias("item")
    ).distinct()
    if max_basket_size is not None:
        wb = Window.partitionBy("basket")
        pres = (
            pres.withColumn("_bs", F.count(F.lit(1)).over(wb))
            .filter(F.col("_bs") <= max_basket_size)
            .drop("_bs")
        )
    item_cnt = pres.groupBy("item").agg(F.count(F.lit(1)).alias("icnt"))
    n_baskets = pres.agg(F.count_distinct("basket").alias("nb"))
    a = pres.select("basket", F.col("item").alias("item_a"))
    b = pres.select("basket", F.col("item").alias("item_b"))
    pairs = (
        a.join(b, "basket")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("pair_count"))
        .filter(F.col("pair_count") >= min_pair_count)
    )
    ia = item_cnt.select(
        F.col("item").alias("item_a"), F.col("icnt").alias("cnt_a")
    )
    ib = item_cnt.select(
        F.col("item").alias("item_b"), F.col("icnt").alias("cnt_b")
    )
    from ..functions.scalars import qround

    return (
        pairs.join(F.broadcast(ia), "item_a")
        .join(F.broadcast(ib), "item_b")
        .crossJoin(F.broadcast(n_baskets))
        .select(
            "item_a",
            "item_b",
            "pair_count",
            "cnt_a",
            "cnt_b",
            qround(
                F.col("pair_count") * F.col("nb")
                / (F.col("cnt_a") * F.col("cnt_b")),
                6,
            ).alias("lift"),
        )
    )


def touch_attribution(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    event_col: str,
    id_col: str,
    conversion: str,
) -> DataFrame:
    """First-touch / last-touch attribution: per user, the earliest
    conversion moment and the first and last non-conversion events strictly
    before it. Users with no conversion or no prior touch are excluded
    (inner semantics — the attribution report's domain is converted users
    with a touchpoint).

    Per-user first conversion is a map-side-combined min aggregate
    (user-count-sized — joined back on the user key, NOT broadcast: at
    100 TB the user dimension is itself huge, and the join shares its hash
    partitioning with the window that follows, so the exchange is reused);
    the touch pick is one window over ``partitionBy(user)`` ordered by
    (ts, id) — total order, so ties cannot flip between runs. Events scan
    once; no event-to-event self-join."""
    conv = (
        df.filter(F.col(event_col) == conversion)
        .groupBy(F.col(user_col).alias("_u"))
        .agg(F.min(F.col(ts_col)).alias("conv_ts"))
    )
    touches = df.filter(F.col(event_col) != conversion).join(
        conv, F.col(user_col) == F.col("_u")
    ).filter(F.col(ts_col) < F.col("conv_ts"))
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col), F.col(id_col))
    wd = Window.partitionBy(user_col).orderBy(
        F.col(ts_col).desc(), F.col(id_col).desc()
    )
    return (
        touches.withColumn("_rn_f", F.row_number().over(w))
        .withColumn("_rn_l", F.row_number().over(wd))
        .filter((F.col("_rn_f") == 1) | (F.col("_rn_l") == 1))
        .groupBy(F.col(user_col).alias("user"), F.col("conv_ts"))
        .agg(
            F.min(
                F.when(F.col("_rn_f") == 1, F.col(event_col))
            ).alias("first_touch"),
            F.min(
                F.when(F.col("_rn_l") == 1, F.col(event_col))
            ).alias("last_touch"),
        )
    )


def _bin_durations(base: DataFrame, time_bins: int) -> DataFrame:
    """Right-edge duration binning for the survival estimators: map each
    ``_t`` onto a ``time_bins``-cell grid over [0, max(_t)] (life-table
    convention — events within an interval are evaluated at its right
    edge). Bounds the distinct-duration table to ≤ time_bins + 1 rows so
    the estimators' single-partition prefix windows stay constant-sized
    on CONTINUOUS durations. Exact no-op on durations already on the
    grid (e.g. integer durations with time_bins = max, where the bin
    width is exactly 1.0). One 1-row max aggregate, broadcast.

    The bin index is clamped to ``time_bins``: when width = max/bins
    rounds BELOW the true quotient, ceil(max/width) lands on bins+1 and
    the max-duration subjects would otherwise occupy a phantom bin past
    max(_t) (e.g. max 2.1, bins 7 → 2.1/(2.1/7) = 7.000000000000001)."""
    mx = base.agg(F.max("_t").alias("_mx"))
    width = F.col("_mx") / F.lit(float(time_bins))
    idx = F.least(F.ceil(F.col("_t") / width), F.lit(time_bins))
    return (
        base.crossJoin(F.broadcast(mx))
        .withColumn(
            "_t",
            F.when(
                F.col("_mx") > 0, idx.cast("double") * width
            ).otherwise(F.col("_t")),
        )
        .drop("_mx")
    )


def kaplan_meier(
    df: DataFrame,
    duration_col: str,
    event_col: str,
    digits: int = 6,
    time_bins: int | None = None,
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

    CARDINALITY: the prefix windows run UNPARTITIONED over the
    distinct-duration table — fine for discrete durations (days,
    buckets), but CONTINUOUS durations make that table data-sized and
    the single-partition window the bottleneck. Pass ``time_bins`` to
    grid the durations first (right-edge life-table binning via
    :func:`_bin_durations`, the lorenz_curve thinning pattern): the
    window input is then ≤ time_bins + 1 rows at any data volume, and
    the binned curve equals the unbinned one exactly whenever the
    durations already sit on the grid.
    """
    d = F.col(duration_col).cast("double")
    e = F.col(event_col).cast("int")
    base = df.filter(
        d.isNotNull() & ~F.isnan(d) & (d >= 0) & e.isNotNull()
    ).select(d.alias("_t"), e.alias("_e"))
    if time_bins is not None:
        if time_bins < 1:
            raise ValueError(f"time_bins must be >= 1, got {time_bins}")
        base = _bin_durations(base, time_bins)
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


def nelson_aalen(
    df: DataFrame,
    duration_col: str,
    event_col: str,
    digits: int = 6,
    time_bins: int | None = None,
) -> DataFrame:
    """Nelson-Aalen cumulative-hazard estimator — the additive twin of
    :func:`kaplan_meier`: at each distinct event time t,
    H(t) = Σ_{t_i ≤ t} d_i / n_i with the same risk-set bookkeeping
    (right-censored rows leave the risk set without an event). Preferred
    over −ln(S_KM) when hazards are the modeling target (it is unbiased
    for the cumulative hazard and defined even after S hits 0), and the
    variance Σ d_i/n_i² (Klein's formulation) is reported alongside for
    pointwise CIs.

    Identical plan shape to kaplan_meier: ONE duration-keyed count
    aggregate, a descending-cumulative risk window, an ascending
    cumulative sum — no per-subject state. NULL/NaN/negative durations
    excluded. Same CARDINALITY caveat as kaplan_meier: pass
    ``time_bins`` to bound the distinct-duration table (and so the
    unpartitioned prefix windows) on continuous-valued durations.

    Returns one row per distinct event time:
    (t, n_risk, n_events, cum_hazard, cum_hazard_var).
    """
    d = F.col(duration_col).cast("double")
    e = F.col(event_col).cast("int")
    base = df.filter(
        d.isNotNull() & ~F.isnan(d) & (d >= 0) & e.isNotNull()
    ).select(d.alias("_t"), e.alias("_e"))
    if time_bins is not None:
        if time_bins < 1:
            raise ValueError(f"time_bins must be >= 1, got {time_bins}")
        base = _bin_durations(base, time_bins)
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
    nn = F.col("_n").cast("double")
    dd = F.col("_d").cast("double")
    curve = (
        per_t.withColumn("_n", F.sum("_c").over(w_desc))
        .withColumn("_h", F.sum(dd / nn).over(w_asc))
        .withColumn("_v", F.sum(dd / (nn * nn)).over(w_asc))
    )
    return curve.filter(F.col("_d") > 0).select(
        F.col("_t").alias("t"),
        F.col("_n").alias("n_risk"),
        F.col("_d").alias("n_events"),
        qround(F.col("_h"), digits).alias("cum_hazard"),
        qround(F.col("_v"), digits).alias("cum_hazard_var"),
    )


def log_rank_test(
    df: DataFrame,
    duration_col: str,
    event_col: str,
    group_col: str,
    group_a,
    group_b,
    digits: int = 6,
    time_bins: int | None = None,
) -> DataFrame:
    """Two-group log-rank test — the inferential companion of
    :func:`kaplan_meier`: does group A's survival curve differ from
    group B's, with right-censoring handled exactly (a censored subject
    leaves the risk set without contributing an event)? At each distinct
    pooled event time t, group A's observed events d_At are compared to
    the hypergeometric expectation under H0 (identical hazards):

        E_At = d_t · n_At / n_t
        V_t  = d_t · (n_At/n_t) · (1 − n_At/n_t) · (n_t − d_t) / (n_t − 1)
        χ²   = (Σ (d_At − E_At))² / Σ V_t       (1 dof)

    Rows whose group is neither ``group_a`` nor ``group_b`` are excluded
    (the test is pairwise); NULL/NaN/negative durations excluded as in
    kaplan_meier. V_t is 0 when n_t = 1 (no variance in a 1-subject
    risk set). χ² is NULL when ΣV ≤ 0 (no events, or all mass in one
    group at every event time — the test is undefined, fail closed).

    Shape: ONE pooled duration-keyed count aggregate carrying per-group
    event/at-risk counts (map-side combined), then the same
    distinct-duration prefix windows as kaplan_meier — including the
    same CARDINALITY caveat and the same ``time_bins`` remedy for
    continuous durations.

    Returns ONE row: (n_a, n_b, events_a, events_b,
    observed_minus_expected, variance, chi2).
    """
    d = F.col(duration_col).cast("double")
    e = F.col(event_col).cast("int")
    g = F.col(group_col)
    base = df.filter(
        d.isNotNull()
        & ~F.isnan(d)
        & (d >= 0)
        & e.isNotNull()
        & g.isin([group_a, group_b])
    ).select(
        d.alias("_t"),
        e.alias("_e"),
        (g == F.lit(group_a)).cast("int").alias("_a"),
    )
    if time_bins is not None:
        if time_bins < 1:
            raise ValueError(f"time_bins must be >= 1, got {time_bins}")
        base = _bin_durations(base, time_bins)
    per_t = base.groupBy("_t").agg(
        F.count(F.lit(1)).cast("bigint").alias("_c"),
        F.sum("_e").cast("bigint").alias("_d"),
        F.sum("_a").cast("bigint").alias("_ca"),
        F.sum(F.col("_a") * F.col("_e")).cast("bigint").alias("_da"),
    )
    w_desc = Window.orderBy(F.col("_t").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    risked = per_t.withColumn("_n", F.sum("_c").over(w_desc)).withColumn(
        "_na", F.sum("_ca").over(w_desc)
    )
    nn = F.col("_n").cast("double")
    dd = F.col("_d").cast("double")
    na = F.col("_na").cast("double")
    share = na / nn
    e_at = dd * share
    v_t = F.when(
        F.col("_n") > 1,
        dd * share * (1.0 - share) * (nn - dd) / (nn - 1.0),
    ).otherwise(F.lit(0.0))
    agg = risked.agg(
        F.sum("_ca").cast("bigint").alias("n_a"),
        (F.sum("_c") - F.sum("_ca")).cast("bigint").alias("n_b"),
        F.sum("_da").cast("bigint").alias("events_a"),
        (F.sum("_d") - F.sum("_da")).cast("bigint").alias("events_b"),
        F.sum(F.when(F.col("_d") > 0, F.col("_da") - e_at)).alias("_ome"),
        F.sum(F.when(F.col("_d") > 0, v_t)).alias("_v"),
    )
    return agg.select(
        F.coalesce(F.col("n_a"), F.lit(0)).alias("n_a"),
        F.coalesce(F.col("n_b"), F.lit(0)).alias("n_b"),
        F.coalesce(F.col("events_a"), F.lit(0)).alias("events_a"),
        F.coalesce(F.col("events_b"), F.lit(0)).alias("events_b"),
        qround(F.col("_ome"), digits).alias("observed_minus_expected"),
        qround(F.col("_v"), digits).alias("variance"),
        qround(
            F.when(
                F.col("_v") > 0, F.col("_ome") * F.col("_ome") / F.col("_v")
            ),
            digits,
        ).alias("chi2"),
    )


def cox_ph(
    df: DataFrame,
    duration_col: str,
    event_col: str,
    x_col: str,
    steps: int = 3,
    digits: int = 6,
    time_bins: int | None = None,
) -> DataFrame:
    """Univariate Cox proportional-hazards fit (Cox 1972) via ``steps``
    unrolled Newton iterations on the Breslow partial likelihood from
    β = 0 — the continuous-covariate generalization of
    :func:`hazard_ratio` / :func:`log_rank_test` (a single Newton step
    from 0 on a binary covariate IS the log-rank score test):

        U(β) = Σ_t [ Σ_{deaths at t} x_i − d_t · S1(t)/S0(t) ]
        I(β) = Σ_t d_t · ( S2(t)/S0(t) − (S1(t)/S0(t))² )
        β ← β + U/I,  Sk(t) = Σ_{j: T_j ≥ t} x_j^k · exp(β x_j)

    Right-censoring exact (censored rows enter the risk sets S_k but
    never the event sums); ties handled by Breslow (tied deaths share
    the tied risk set). Fail-closed: a step with I ≤ 0 (no events, or a
    constant covariate) nulls β and every downstream readout; NULL/NaN/
    negative durations and NULL/NaN covariates are excluded.

    Shape: the model state is a broadcast 1-row β frame (the
    :func:`~.stats.logistic_irls` discipline — lazy chain, nothing
    collected); each step is ONE duration-keyed sufficient-statistics
    aggregate (map-side combined) + the same distinct-duration suffix
    windows as :func:`kaplan_meier`, sharing its CARDINALITY caveat and
    the ``time_bins`` life-table remedy for continuous durations. A
    final pass at the fitted β produces the observed information for
    the se.

    Returns ONE row: (n, n_events, beta, hazard_ratio, se_beta, z).
    """
    if steps < 1:
        raise ValueError(f"steps must be >= 1, got {steps}")
    d = F.col(duration_col).cast("double")
    e = F.col(event_col).cast("int")
    x = F.col(x_col).cast("double")
    base = df.filter(
        d.isNotNull()
        & ~F.isnan(d)
        & (d >= 0)
        & e.isNotNull()
        & x.isNotNull()
        & ~F.isnan(x)
    ).select(d.alias("_t"), e.alias("_e"), x.alias("_x"))
    if time_bins is not None:
        if time_bins < 1:
            raise ValueError(f"time_bins must be >= 1, got {time_bins}")
        base = _bin_durations(base, time_bins)
    # base feeds steps+2 consumers (each Newton pass + the final
    # information pass + counts) — uncut, every pass re-ran the scan +
    # filter; the checkpointed frame is 3 doubles per surviving row
    base = base.localCheckpoint(eager=False)
    spark = df.sparkSession
    beta = F.broadcast(spark.createDataFrame([(0.0,)], "_b double"))
    w_desc = Window.orderBy(F.col("_t").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )

    def _risked(b):
        """Per-duration sufficient statistics at the broadcast β, with
        the suffix risk-set sums S0/S1/S2."""
        ww = F.exp(F.col("_b") * F.col("_x"))
        per_t = (
            base.crossJoin(b)
            .groupBy("_t")
            .agg(
                F.max("_b").alias("_ob"),
                F.sum("_e").cast("bigint").alias("_d"),
                F.sum(F.col("_e") * F.col("_x")).alias("_sxe"),
                F.sum(ww).alias("_w0"),
                F.sum(ww * F.col("_x")).alias("_w1"),
                F.sum(ww * F.col("_x") * F.col("_x")).alias("_w2"),
            )
        )
        return (
            per_t.withColumn("_s0", F.sum("_w0").over(w_desc))
            .withColumn("_s1", F.sum("_w1").over(w_desc))
            .withColumn("_s2", F.sum("_w2").over(w_desc))
        )

    dd = F.col("_d").cast("double")
    share = F.col("_s1") / F.col("_s0")
    u_term = F.when(F.col("_d") > 0, F.col("_sxe") - dd * share)
    i_term = F.when(
        F.col("_d") > 0, dd * (F.col("_s2") / F.col("_s0") - share * share)
    )
    for _ in range(steps):
        g = _risked(beta).agg(
            F.max("_ob").alias("_ob"),
            F.sum(u_term).alias("_u"),
            F.sum(i_term).alias("_i"),
        )
        beta = F.broadcast(
            g.select(
                F.when(
                    F.col("_i") > 0, F.col("_ob") + F.col("_u") / F.col("_i")
                ).alias("_b")
            )
        )
    counts = base.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("_e").cast("bigint").alias("n_events"),
    )
    final = _risked(beta).agg(
        F.max("_ob").alias("_b"),
        F.sum(i_term).alias("_i"),
    )
    se = F.when(F.col("_i") > 0, 1.0 / F.sqrt(F.col("_i")))
    return counts.crossJoin(F.broadcast(final)).select(
        F.coalesce("n", F.lit(0)).cast("bigint").alias("n"),
        F.coalesce("n_events", F.lit(0)).cast("bigint").alias("n_events"),
        qround(F.col("_b"), digits).alias("beta"),
        qround(F.exp(F.col("_b")), digits).alias("hazard_ratio"),
        qround(se, digits).alias("se_beta"),
        qround(F.col("_b") * F.sqrt(F.when(F.col("_i") > 0, F.col("_i"))), digits).alias(
            "z"
        ),
    )


def hazard_ratio(
    df: DataFrame,
    duration_col: str,
    event_col: str,
    group_col: str,
    group_a,
    group_b,
    digits: int = 6,
) -> DataFrame:
    """Exponential-model hazard ratio between two groups — the effect
    SIZE companion of :func:`log_rank_test` (which answers "different?",
    not "by how much"). Under constant hazards, the MLE per group is
    λ = d / T (events over total observed time, censoring included in T
    but not in d), and

        HR      = λ_a / λ_b
        se(lnHR)= sqrt(1/d_a + 1/d_b)       (delta method)
        CI95    = exp(ln HR ± 1.96·se)

    ONE two-group sufficient-statistics aggregate (d, T per group) —
    no per-time bookkeeping, so unlike the rank test it has no
    distinct-duration window at all. NULL/NaN/negative durations and
    non-member groups excluded. HR and the CI are NULL when either
    group has d = 0 or T ≤ 0 (a ratio against a hazard of 0 is
    undefined — fail closed). Returns ONE row: (n_a, n_b, events_a,
    events_b, time_a, time_b, hazard_ratio, ln_hr_se, hr_ci_low,
    hr_ci_high).
    """
    d = F.col(duration_col).cast("double")
    e = F.col(event_col).cast("int")
    g = F.col(group_col)
    base = df.filter(
        d.isNotNull()
        & ~F.isnan(d)
        & (d >= 0)
        & e.isNotNull()
        & g.isin([group_a, group_b])
    ).select(
        d.alias("_t"),
        e.alias("_e"),
        (g == F.lit(group_a)).cast("int").alias("_a"),
    )
    agg = base.agg(
        F.sum("_a").cast("bigint").alias("n_a"),
        (F.count(F.lit(1)) - F.sum("_a")).cast("bigint").alias("n_b"),
        F.sum(F.col("_a") * F.col("_e")).cast("bigint").alias("events_a"),
        (F.sum("_e") - F.sum(F.col("_a") * F.col("_e")))
        .cast("bigint")
        .alias("events_b"),
        F.sum(F.col("_a") * F.col("_t")).alias("_ta"),
        (F.sum("_t") - F.sum(F.col("_a") * F.col("_t"))).alias("_tb"),
    )
    da = F.col("events_a").cast("double")
    db = F.col("events_b").cast("double")
    ok = (
        (F.col("events_a") > 0)
        & (F.col("events_b") > 0)
        & (F.col("_ta") > 0)
        & (F.col("_tb") > 0)
    )
    hr = (da / F.col("_ta")) / (db / F.col("_tb"))
    se = F.sqrt(1.0 / da + 1.0 / db)
    return agg.select(
        F.coalesce(F.col("n_a"), F.lit(0)).cast("bigint").alias("n_a"),
        F.coalesce(F.col("n_b"), F.lit(0)).cast("bigint").alias("n_b"),
        F.coalesce(F.col("events_a"), F.lit(0))
        .cast("bigint")
        .alias("events_a"),
        F.coalesce(F.col("events_b"), F.lit(0))
        .cast("bigint")
        .alias("events_b"),
        qround(F.col("_ta"), digits).alias("time_a"),
        qround(F.col("_tb"), digits).alias("time_b"),
        qround(F.when(ok, hr), digits).alias("hazard_ratio"),
        qround(F.when(ok, se), digits).alias("ln_hr_se"),
        qround(
            F.when(ok, F.exp(F.log(hr) - 1.96 * se)), digits
        ).alias("hr_ci_low"),
        qround(
            F.when(ok, F.exp(F.log(hr) + 1.96 * se)), digits
        ).alias("hr_ci_high"),
    )
