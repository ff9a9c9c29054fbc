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

from ..functions.scalars import ts_micros


def funnel_steps(
    df: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    within_seconds: float | None = None,
) -> DataFrame:
    """Per-user funnel timestamps: ``step1_ts`` = first occurrence of
    steps[0]; ``step{i}_ts`` = first occurrence of steps[i-1] at-or-after
    ``step{i-1}_ts`` (and, with ``within_seconds``, within that window of
    step1). Null from the first unreached step onward. One row per user who
    reached step 1.
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
        cond = F.col(ts_col) >= F.col(prev)
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
        cur = cur.join(nxt, user_col, "left")
    return cur


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
) -> DataFrame:
    """Weekly retention triangle: users bucketed by first-activity week
    (cohort); for each (cohort_week, week_offset) the distinct users active
    that many weeks later. Two aggregates: first-week per user, then a
    distinct count per (cohort, offset) — both shuffle on user-sized keys,
    never on raw events."""
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
    return (
        active.withColumn("week_offset", offset)
        .groupBy("cohort_week", "week_offset")
        .agg(F.count_distinct(F.col(user_col)).alias("n_active"))
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
