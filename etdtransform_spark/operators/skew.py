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
