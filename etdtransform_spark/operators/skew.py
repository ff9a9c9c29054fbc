"""Skew mitigation: salted aggregation and salted join.

At 100 TB a handful of hot keys (a viral user_id, a default/garbage id, one
giant project) can make a single reducer process most of a shuffle while the
other 999 executors idle. AQE's skew-join splitting handles the JOIN case at
runtime; these operators handle it *structurally*:

- ``salted_agg``: two-stage aggregation. Stage 1 aggregates on
  (keys, salt) — the hot key's rows spread over ``n_salt`` reducers — and
  stage 2 combines the ``n_salt`` partials per key. Works for any algebraic
  aggregate (sum/count/min/max, and avg as sum+count); results are EXACTLY
  equal to the direct groupBy because the combine is associative. For most
  aggregations Spark's own partial aggregation (map-side combine) already
  does this implicitly — salting matters when the *grouped domain itself*
  (keys x distinct values hitting one reducer) is skewed, e.g. huge groups
  flowing into a single post-shuffle hash aggregate.

- ``salted_join``: fact-side rows get a deterministic salt in [0, n); the
  (small-ish but not broadcastable) dimension side is replicated n times, one
  copy per salt value, so each hot key's rows land on n different reducers.
  Exact same result multiset as the unsalted equi-join.

Salts are DETERMINISTIC (hash of the row's own columns, not rand()) so
retried/recomputed tasks produce identical output — a requirement for
correctness under Spark's task-retry model on real clusters.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.scalars import qround

_COMBINE = {
    "sum": F.sum,
    "count": F.sum,  # partial counts combine by summing
    "min": F.min,
    "max": F.max,
}

_PARTIAL = {
    "sum": F.sum,
    "count": lambda c: F.count(c),
    "min": F.min,
    "max": F.max,
}


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: Sequence[tuple[str, str, str]],
    n_salt: int = 16,
) -> DataFrame:
    """Two-stage skew-safe groupBy.

    ``aggs`` is a list of (column, op, alias) with op in
    sum|count|min|max|avg. Returns one row per key combination with the
    aliased aggregates — bitwise identical to ``df.groupBy(keys).agg(...)``
    for min/max/count and equal up to double-accumulation order for sums.
    """
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salt))
    partials = []
    finals = []
    for col, op, alias in aggs:
        if op == "avg":
            partials.append(_PARTIAL["sum"](col).alias(f"_s_{alias}"))
            partials.append(_PARTIAL["count"](col).alias(f"_c_{alias}"))
            finals.append(
                (F.sum(f"_s_{alias}") / F.sum(f"_c_{alias}")).alias(alias)
            )
        elif op in _PARTIAL:
            partials.append(_PARTIAL[op](col).alias(f"_p_{alias}"))
            finals.append(_COMBINE[op](f"_p_{alias}").alias(alias))
        else:
            raise ValueError(f"unsupported op {op!r}")
    stage1 = df.withColumn("_salt", salt).groupBy(*keys, "_salt").agg(*partials)
    return stage1.groupBy(*keys).agg(*finals)


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: Sequence[str],
    n_salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the fact side, replicate the dim side
    ``n_salt`` ways, join on (keys, salt). Result multiset is identical to
    ``fact.join(dim, on, how)`` for inner/left joins.

    Use when the dim side is too big to broadcast but small enough to
    replicate n_salt times; for broadcastable dims just use
    ``F.broadcast`` (no skew problem at all), and for two huge skewed sides
    rely on AQE skew-join splitting.
    """
    on = list(on)
    f = fact.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(n_salt))
    )
    d = dim.withColumn("_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1))))
    return f.join(d, [*on, "_salt"], how).drop("_salt")


def skew_profile(
    df: DataFrame,
    key_cols: Sequence[str],
    top_k: int = 10,
    parallelism: int = 200,
    digits: int = 6,
) -> DataFrame:
    """Join/agg-key skew diagnostic — the measurement that decides
    whether :func:`salted_agg` / :func:`salted_join` (or AQE skew
    splitting) is worth wiring: the ``top_k`` heaviest key values with

        (rank, key..., n_rows, share, est_reducer_share, suggested_salt)

    where ``share`` = key rows / total rows, ``est_reducer_share`` =
    share · parallelism (how many average reducers' worth of work this
    single key pins on ONE reducer in a ``parallelism``-way shuffle —
    above ~2 the stragglers are visible, above ~10 the stage is
    effectively serialized), and ``suggested_salt`` =
    ceil(share · parallelism) — the salt fan-out that spreads the key
    back to average-reducer size (1 = no salting needed). NULL keys
    profile like any value (a NULL-key flood is the classic
    default-value hot spot). Deterministic: ties rank by key value.

    ONE hash aggregate (map-side combined — the scan never shuffles
    rows, only per-key partials) + a top-k TakeOrdered; output is
    top_k-sized. This is a diagnostic SAMPLE of the key distribution's
    head, not a full histogram — the tail is irrelevant to skew.
    """
    klist = list(key_cols)
    counts = df.groupBy(*klist).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows")
    )
    tot = counts.agg(
        F.coalesce(F.sum("n_rows"), F.lit(0)).cast("bigint").alias("_tot")
    )
    top = (
        counts.orderBy(
            F.col("n_rows").desc(), *[F.col(k).asc_nulls_first() for k in klist]
        )
        .limit(int(top_k))
        .crossJoin(F.broadcast(tot))
    )
    share = F.col("n_rows").cast("double") / F.col("_tot").cast("double")
    w = Window.orderBy(
        F.col("n_rows").desc(), *[F.col(k).asc_nulls_first() for k in klist]
    )
    return top.select(
        F.row_number().over(w).cast("bigint").alias("rank"),
        *klist,
        "n_rows",
        qround(share, digits).alias("share"),
        qround(share * F.lit(float(parallelism)), digits).alias(
            "est_reducer_share"
        ),
        F.ceil(share * F.lit(float(parallelism))).cast("bigint").alias(
            "suggested_salt"
        ),
    )


def join_key_health(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    digits: int = 6,
) -> DataFrame:
    """Pre-flight profile of an equi-join's key columns — the numbers
    to read BEFORE launching the join at 100 TB: null rates (rows that
    silently drop from an inner join), distinct counts (broadcast or
    shuffle?), the maximum per-key multiplicity on each side, the EXACT
    join output cardinality Σ_k cnt_l(k)·cnt_r(k), and the share of
    that output owned by the single heaviest key (the one-reducer
    hotspot a salt or AQE skew split must handle).

    Shape: one (key) count aggregate per side, an equi-join of the two
    COUNT tables (distinct-key-sized, not data-sized), one rollup.
    NULL keys never match in an equi-join, so they are profiled
    (null_left/null_right) but excluded from the cardinality math.

    Returns ONE row: (n_left, n_right, null_left, null_right,
    distinct_left, distinct_right, max_mult_left, max_mult_right,
    est_output_rows, top_key_share, amplification) — amplification =
    output rows / max(input sides); 0 when the inputs are non-empty but
    no keys match (an all-dropping join IS amplification 0), NULL only
    when both inputs are empty (no denominator).
    """
    def side(df: DataFrame, key: str, tag: str):
        kc = F.col(key)
        counts = (
            df.filter(kc.isNotNull())
            .groupBy(kc.alias("_k"))
            .agg(F.count(F.lit(1)).alias(f"_c{tag}"))
        )
        totals = df.agg(
            F.count(F.lit(1)).alias(f"n_{tag}"),
            F.sum(kc.isNull().cast("bigint")).alias(f"null_{tag}"),
        )
        return counts, totals

    lc, lt = side(left, left_key, "l")
    rc, rt = side(right, right_key, "r")
    joined = lc.join(rc, lc["_k"] == rc["_k"]).select(
        (F.col("_cl") * F.col("_cr")).alias("_out")
    )
    jagg = joined.agg(
        F.coalesce(F.sum("_out"), F.lit(0)).cast("bigint")
        .alias("est_output_rows"),
        F.max("_out").alias("_top"),
    )
    lagg = lc.agg(
        F.count(F.lit(1)).alias("distinct_l"),
        F.max("_cl").alias("max_mult_l"),
    )
    ragg = rc.agg(
        F.count(F.lit(1)).alias("distinct_r"),
        F.max("_cr").alias("max_mult_r"),
    )
    row = (
        lt.crossJoin(F.broadcast(rt))
        .crossJoin(F.broadcast(lagg))
        .crossJoin(F.broadcast(ragg))
        .crossJoin(F.broadcast(jagg))
    )
    out = F.col("est_output_rows").cast("double")
    return row.select(
        F.col("n_l").alias("n_left"),
        F.col("n_r").alias("n_right"),
        F.coalesce(F.col("null_l"), F.lit(0)).alias("null_left"),
        F.coalesce(F.col("null_r"), F.lit(0)).alias("null_right"),
        F.coalesce(F.col("distinct_l"), F.lit(0)).alias("distinct_left"),
        F.coalesce(F.col("distinct_r"), F.lit(0)).alias("distinct_right"),
        F.coalesce(F.col("max_mult_l"), F.lit(0)).cast("bigint")
        .alias("max_mult_left"),
        F.coalesce(F.col("max_mult_r"), F.lit(0)).cast("bigint")
        .alias("max_mult_right"),
        F.col("est_output_rows"),
        qround(
            F.when(out > 0, F.col("_top").cast("double") / out), digits
        ).alias("top_key_share"),
        qround(
            F.when(
                F.greatest(F.col("n_l"), F.col("n_r")) > 0,
                out / F.greatest(F.col("n_l"), F.col("n_r")).cast("double"),
            ),
            digits,
        ).alias("amplification"),
    )
