"""As-of (nearest-timestamp) join — a time-series operator the reference
lacks but any production meter/event pipeline needs (match each reading to
the latest configuration/tariff/weather row at or before its timestamp).

Spark has no ASOF JOIN primitive (DuckDB and Pandas ``merge_asof`` do), and
the naive formulation — an inequality join + per-left-row argmax — degrades
to a broadcast-nested-loop plan. This implementation uses the classic
union-and-carry shape instead:

1. tag both inputs and ``unionByName`` them (right rows carry their payload
   in a struct, left rows carry null),
2. one window per ``by`` key ordered by (ts, side): ``F.last(payload,
   ignorenulls=True)`` carries the most recent right payload onto every
   subsequent left row,
3. filter back to left rows and unpack the struct.

Cost: ONE shuffle on the ``by`` keys + a linear sort-based window — the same
plan shape as any per-key window op, so it scales to 100 TB exactly like the
imputation windows do (partition by key, no pair explosion, no driver
involvement). Skewed keys behave like any window op (AQE-compatible).

The payload rides in a struct so a right row whose payload *fields* are null
still matches (``last(ignorenulls)`` skips null structs, not structs with
null fields) — the struct itself is non-null for every right row.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.scalars import ts_micros


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: Sequence[str] = ("user_id",),
    value_cols: Sequence[str] | None = None,
    direction: str = "backward",
    tolerance_seconds: float | None = None,
    right_on: str | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """Left as-of join: for every left row, attach ``value_cols`` from the
    right row with the largest ``right_on <= on`` (direction="backward",
    inclusive) or smallest ``right_on >= on`` ("forward") within the same
    ``by`` group. Unmatched left rows keep nulls (left-join semantics).

    The matched right timestamp is exposed as ``{prefix}{right_on}`` and each
    value column as ``{prefix}{col}``. With ``tolerance_seconds`` set,
    matches farther than the tolerance are nulled out (pandas
    ``merge_asof(tolerance=...)`` semantics).

    Right rows must be unique per (by, right_on); pre-aggregate ties upstream
    (the tie-winner would otherwise depend on shuffle order).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    right_on = right_on or on
    by = list(by)
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in (*by, right_on)]
    value_cols = list(value_cols)

    payload = F.struct(
        F.col(right_on).alias("_ts"), *[F.col(c).alias(c) for c in value_cols]
    )
    # Side tag orders equal timestamps so the window frame *includes* the
    # right row at exactly the left timestamp: backward scans need the right
    # row first (carry sees it), forward scans need it after the left row
    # reversed ordering puts it "first" again.
    # NULL-timestamp hygiene: a right row with a null timestamp would sort
    # first (asc NULLS FIRST) and be carried onto every left row before the
    # first real right row — drop such rows; they cannot be "as of" anything.
    r = right.filter(F.col(right_on).isNotNull()).select(
        *[F.col(c) for c in by],
        F.col(right_on).alias("_asof_t"),
        payload.alias("_payload"),
        F.lit(0).alias("_side"),
    )
    left_cols = left.columns
    l = left.select(
        *left_cols,
        F.col(on).alias("_asof_t"),
        F.lit(None).cast(r.schema["_payload"].dataType).alias("_payload"),
        F.lit(1).alias("_side"),
    )
    unioned = l.unionByName(r, allowMissingColumns=True)

    if direction == "backward":
        w = (
            Window.partitionBy(*by)
            .orderBy(F.col("_asof_t").asc(), F.col("_side").asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        carried = F.last("_payload", ignorenulls=True).over(w)
    else:
        w = (
            Window.partitionBy(*by)
            .orderBy(F.col("_asof_t").desc(), F.col("_side").asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        carried = F.last("_payload", ignorenulls=True).over(w)

    # A left row with a null timestamp has no position on the time axis:
    # it must stay unmatched (in forward mode desc NULLS LAST would
    # otherwise hand it the earliest right payload).
    out = unioned.withColumn(
        "_match", F.when(F.col("_asof_t").isNotNull(), carried)
    ).filter(F.col("_side") == 1)

    if tolerance_seconds is not None:
        gap = F.abs(
            ts_micros(F.col("_asof_t")) - ts_micros(F.col("_match._ts"))
        ) / F.lit(1e6)
        out = out.withColumn(
            "_match", F.when(gap <= tolerance_seconds, F.col("_match"))
        )

    return out.select(
        *left_cols,
        F.col("_match._ts").alias(f"{prefix}{right_on}"),
        *[F.col(f"_match.{c}").alias(f"{prefix}{c}") for c in value_cols],
    )
