"""Sessionization and deterministic sampling — event-pipeline operators.

Sessionization is the batch twin of a streaming session window: a new
session starts when the gap to the previous event of the same key exceeds
the timeout. Pure lag/cumsum windows partitioned by the key — the same
shape as the impute engine's gap grouping (operators/impute.py), so the
sequential semantics can never straddle a shuffle boundary.

Hash sampling replaces random sampling in reproducible data pipelines: the
keep decision is a pure function of the row key, so any engine (and any
rerun) selects the identical subset — no RNG state, no seed plumbing, and
it pushes down to a cheap filter. Stratified k-per-group selection uses a
hash rank window instead of a global sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import portable_hash64
from ..functions.scalars import ts_micros


def sessionize(
    df: DataFrame,
    timeout_seconds: float,
    ts_col: str = "ts",
    key_cols: list[str] | None = None,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Assign a per-key ``session_id`` (1-based, in time order): a new
    session starts at the first event and whenever the gap to the previous
    event exceeds ``timeout_seconds``."""
    keys = key_cols or ["user_id"]
    order = [ts_col, *(order_cols or [])]
    w = Window.partitionBy(*keys).orderBy(*order)
    gap_us = ts_micros(F.col(ts_col)) - F.lag(
        ts_micros(F.col(ts_col))
    ).over(w)
    new_session = (
        gap_us.isNull() | (gap_us > F.lit(int(timeout_seconds * 1_000_000)))
    ).cast("long")
    return df.withColumn(
        "session_id",
        F.sum(new_session).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )


def session_stats(
    df: DataFrame,
    timeout_seconds: float,
    ts_col: str = "ts",
    key_cols: list[str] | None = None,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """One row per session: start/end timestamps, event count, duration."""
    keys = key_cols or ["user_id"]
    sess = sessionize(df, timeout_seconds, ts_col, keys, order_cols)
    return sess.groupBy(*keys, "session_id").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        (
            (ts_micros(F.max(ts_col)) - ts_micros(F.min(ts_col)))
            / 1e6
        ).alias("duration_seconds"),
    )


def hash_sample(
    df: DataFrame,
    key: Column | str,
    rate_percent: int,
    seed: str = "sample",
    fast: bool = False,
) -> DataFrame:
    """Deterministic ``rate_percent``% sample: keep rows whose key hash lands
    in the first ``rate_percent`` of 100 buckets. Reproducible across
    engines/reruns; Catalyst pushes the filter to the scan."""
    c = F.col(key) if isinstance(key, str) else key
    bucket = portable_hash64(c.cast("string"), seed=seed, fast=fast) % 100
    return df.filter(bucket < rate_percent)


def stratified_hash_sample(
    df: DataFrame,
    key: Column | str,
    group_cols: list[str],
    k: int,
    seed: str = "sample",
    fast: bool = False,
) -> DataFrame:
    """Exactly min(k, group size) rows per group, chosen by hash rank — a
    deterministic stratified sample with no global sort and no RNG. The
    window sorts each group by (hash, key); at scale each group sorts
    independently inside its shuffle partition."""
    c = F.col(key) if isinstance(key, str) else key
    h = portable_hash64(c.cast("string"), seed=seed, fast=fast)
    w = Window.partitionBy(*group_cols).orderBy(h.asc(), c.asc())
    return (
        df.withColumn("_hr", F.row_number().over(w))
        .filter(F.col("_hr") <= k)
        .drop("_hr")
    )


def weighted_hash_sample(
    df: DataFrame,
    key: Column | str,
    weight: Column | str,
    k: int,
    seed: str = "wsample",
    fast: bool = False,
) -> DataFrame:
    """Deterministic weighted sample of k rows without an RNG: the
    Efraimidis-Spirakis A-ES scheme (each row ranked by u^(1/w), top-k kept
    — inclusion probability proportional to weight) with the uniform u
    derived from the portable key hash, so the sample is identical across
    engines, reruns, AND task retries (rand() would violate all three).

    Ranking uses the monotone-equivalent ln(u)/w (identical IEEE ops in the
    SQL twin), rounded to 9 decimals with the key as tiebreak so the k-th
    boundary is deterministic. Executes as TakeOrderedAndProject — no
    global sort. Weights must be strictly positive."""
    from ..functions.scalars import qround

    c = F.col(key) if isinstance(key, str) else key
    w = (F.col(weight) if isinstance(weight, str) else weight).cast("double")
    m = 1 << 20
    u = (
        portable_hash64(c.cast("string"), seed=seed, fast=fast) % m
        + F.lit(0.5)
    ) / F.lit(float(m))
    es_key = qround(F.log(u) / w, 9)
    return (
        df.withColumn("es_key", es_key)
        .orderBy(F.col("es_key").desc(), c.asc())
        .limit(k)
    )


def session_paths(
    df: DataFrame,
    timeout_seconds: float,
    event_col: str = "event_type",
    ts_col: str = "ts",
    key_cols: list[str] | None = None,
    order_cols: list[str] | None = None,
    max_events: int = 50,
) -> DataFrame:
    """Per-session journey extraction: the time-ordered sequence of events
    in each gap-timeout session, concatenated as `a>b>c` — the
    path-analysis / behavioral-sequence primitive (and the shape a
    conversational-corpus builder uses to assemble ordered turns).

    Ordering must be TOTAL (pass ``order_cols`` with a unique id) or
    same-timestamp events would concatenate nondeterministically. The
    sequence materializes per session via sort_array(collect_list(struct)),
    truncated to ``max_events`` IN the aggregate's post-projection (the
    `truncated` flag says so) — per-group memory is the session itself,
    bounded by the timeout at any corpus size. Shares the sessionize
    exchange: one shuffle on the key serves the window and the aggregate."""
    keys = key_cols or ["user_id"]
    order = [ts_col, *(order_cols or [])]
    s = sessionize(df, timeout_seconds, ts_col, keys, order_cols)
    seq = F.sort_array(
        F.collect_list(
            F.struct(
                *[F.col(c).alias(f"_o{i}") for i, c in enumerate(order)],
                F.col(event_col).alias("_e"),
            )
        )
    )
    return (
        s.groupBy(*keys, "session_id")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.count(F.lit(1)).alias("n_events"),
            seq.alias("_seq"),
        )
        .select(
            *keys,
            "session_id",
            "session_start",
            "n_events",
            F.array_join(
                F.transform(
                    F.slice(F.col("_seq"), 1, max_events), lambda x: x["_e"]
                ),
                ">",
            ).alias("path"),
            (F.col("n_events") > max_events).alias("truncated"),
        )
    )


def rolling_active_users(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    window_days: int = 7,
    digits: int = 6,
) -> DataFrame:
    """DAU / rolling-window active users / stickiness per day — the
    product-health metrics (WAU at 7 days, MAU at 28/30). Rolling DISTINCT
    counts are non-decomposable (a user active twice in the window counts
    once), so the window is NOT a frame over daily counts: each distinct
    (user, day) presence row is EXPLODED to the ``window_days`` report
    days it contributes to (sequence+explode — a narrow map), then one
    count-distinct per report day. Linear in presences × window, no
    self-join, no quadratic day×day scan; report days clamp to the
    observed [min, max] day range.

    At 100 TB: presence collapse is the only data-sized shuffle; the
    explode factor is the window length on day-granular rows (≤ 30×
    users·days — tiny relative to the event log), and the final distinct
    aggregate partial-combines per day."""
    from ..functions.scalars import qround

    day = F.to_date(F.col(ts_col))
    pres = df.select(
        F.col(user_col).alias("u"), day.alias("d")
    ).distinct()
    bounds = pres.agg(
        F.min("d").alias("_lo"), F.max("d").alias("_hi")
    )
    contrib = pres.select(
        "u",
        F.explode(
            F.sequence(
                F.col("d"), F.date_add(F.col("d"), window_days - 1)
            )
        ).alias("rd"),
    )
    rolling = contrib.groupBy("rd").agg(
        F.count_distinct("u").alias("rolling_active")
    )
    dau = pres.groupBy(F.col("d").alias("rd")).agg(
        F.count_distinct("u").alias("dau")
    )
    return (
        rolling.join(dau, "rd", "left")
        .crossJoin(F.broadcast(bounds))
        .filter((F.col("rd") >= F.col("_lo")) & (F.col("rd") <= F.col("_hi")))
        .select(
            F.col("rd").alias("day"),
            F.coalesce(F.col("dau"), F.lit(0)).alias("dau"),
            "rolling_active",
            qround(
                F.coalesce(F.col("dau"), F.lit(0))
                / F.col("rolling_active"),
                digits,
            ).alias("stickiness"),
        )
    )


def kfold_assign(
    df: DataFrame,
    key: Column | str,
    k: int = 5,
    seed: str = "fold",
    fast: bool = False,
) -> DataFrame:
    """Deterministic k-fold cross-validation assignment: fold =
    portable_hash(key) % k — the k-way generalization of
    :func:`~..operators.corpus.leakage_safe_split`. Hashing the SPLIT
    KEY (not the row) keeps every row of an entity in one fold, so
    cross-fold leakage through duplicated keys is structurally
    impossible; identical across engines, reruns, partitionings, and
    task retries.

    Zero shuffle — a pure projection; rows with a NULL key get a NULL
    fold (route them explicitly rather than silently training on them).
    Adds a ``fold`` int column.
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    c = F.col(key) if isinstance(key, str) else key
    h = portable_hash64(c.cast("string"), seed=seed, fast=fast)
    return df.withColumn("fold", (h % k).cast("int"))


def weighted_stratified_sample(
    df: DataFrame,
    key: Column | str,
    weight: Column | str,
    group_cols: list[str],
    k: int,
    seed: str = "wssample",
    fast: bool = False,
) -> DataFrame:
    """Per-group weighted sample without replacement: the
    Efraimidis-Spirakis scheme of :func:`weighted_hash_sample`, ranked
    WITHIN each group — min(k, group size) rows per group with
    inclusion probability proportional to weight, deterministic across
    engines/reruns/retries (hash-derived uniforms, no RNG).

    Per-group window instead of the global TakeOrdered: each group
    sorts independently inside its shuffle partition, so the operator
    scales with the largest GROUP, not the table. Weights must be
    strictly positive; NULL keys/weights drop (no rankable evidence).
    """
    from ..functions.scalars import qround

    c = F.col(key) if isinstance(key, str) else key
    w = (F.col(weight) if isinstance(weight, str) else weight).cast("double")
    m = 1 << 20
    u = (
        portable_hash64(c.cast("string"), seed=seed, fast=fast) % m
        + F.lit(0.5)
    ) / F.lit(float(m))
    es_key = qround(F.log(u) / w, 9)
    ranked = (
        df.filter(c.isNotNull() & w.isNotNull() & (w > 0))
        .withColumn("es_key", es_key)
        .withColumn(
            "_wr",
            F.row_number().over(
                Window.partitionBy(*group_cols).orderBy(
                    F.col("es_key").desc(), c.asc()
                )
            ),
        )
    )
    return ranked.filter(F.col("_wr") <= k).drop("_wr")
