"""Declarative data-quality expectation checks (Deequ/Great-Expectations
style) as a single-pass Spark aggregate.

A 100 TB ingest pipeline gates every batch on a constraint report:
completeness (null counts), key uniqueness, value ranges, accepted value
sets, minimum row counts, and referential integrity against dimension
tables. Everything except the FK checks is ONE full-scan hash aggregate —
the metrics are conditional counts computed side by side, so adding a check
adds a column to the agg, not a pass over the data. FK checks are one
anti-join aggregate each (broadcast when the dimension is small).

The report is long-format (check, target, metric, passed) so it can be
written to a monitoring sink or joined against previous batches without
schema churn as checks are added.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.scalars import qround


def check_expectations(
    df: DataFrame,
    not_null: Sequence[str] = (),
    unique: Sequence[Sequence[str]] = (),
    ranges: dict[str, tuple[float, float]] | None = None,
    accepted_values: dict[str, Sequence[str]] | None = None,
    min_rows: int | None = None,
    foreign_keys: Sequence[tuple[str, DataFrame, str]] = (),
    threshold_completeness: Mapping[str, float] | None = None,
    compliance: Mapping[str, tuple[str | Column, float]] | None = None,
    digits: int = 6,
) -> DataFrame:
    """Evaluate the declared expectations and return the constraint report.

    ``metric`` is the violation count for every check except ``min_rows``
    (where it is the observed row count); ``passed`` is metric == 0 (resp.
    metric >= min_rows). ``unique`` takes column *groups*; uniqueness is
    measured as ``count(*) - count(distinct group)`` over rows where the
    whole group is non-null (null keys are a completeness problem, not a
    uniqueness one). Exact distinct counts — at extreme group cardinality
    switch the caller to approx_count_distinct and a tolerance.

    Two FRACTIONAL check families ride the same aggregate (production
    gates are usually "at least 99.x%", not "zero violations"):
    ``threshold_completeness`` maps column -> minimum non-null fraction,
    and ``compliance`` maps a rule name -> (boolean SQL expression or
    Column, minimum fraction of ALL rows satisfying it — NULL predicate
    rows count as non-compliant, as in Deequ). For both, ``metric`` is
    the observed fraction (rounded to ``digits`` so the verdict is
    cross-engine deterministic) and ``passed`` compares it to the
    threshold; an EMPTY table yields NULL metric and passed = false — an
    empty batch proves nothing and must not greenlight a gate (unlike
    the violation-count checks, whose 0-of-0 semantics pass vacuously).

    Returns (check, target, metric, passed), FK rows appended via union —
    the report row count equals the number of declared checks.
    """
    ranges = ranges or {}
    accepted_values = accepted_values or {}
    threshold_completeness = threshold_completeness or {}
    compliance = compliance or {}
    aggs: list[F.Column] = [F.count(F.lit(1)).alias("_n_rows")]
    rows: list[tuple[str, str, str]] = []  # (check, target, agg alias)

    # Aggregate aliases are INDEX-based (_m_0, _m_1, ...), never interpolated
    # from user-supplied column/rule names: a name containing a dot or
    # backtick would break F.col(alias) resolution (struct-access parse) or
    # collide with another alias. Display names appear only as struct
    # literals in the report.
    def _alias() -> str:
        a = f"_m_{len(rows) + len(frac_rows)}"
        return a

    frac_rows: list[tuple[str, str, str, float]] = []
    for c in not_null:
        a = _alias()
        aggs.append(F.count(F.when(F.col(c).isNull(), 1)).alias(a))
        rows.append(("not_null", c, a))
    for grp in unique:
        grp = list(grp)
        a = _alias()
        nn = None
        for c in grp:
            e = F.col(c).isNotNull()
            nn = e if nn is None else (nn & e)
        aggs.append(
            (
                F.count(F.when(nn, 1))
                - F.count_distinct(*[F.when(nn, F.col(c)) for c in grp])
            ).alias(a)
        )
        rows.append(("unique", ",".join(grp), a))
    for c, (lo, hi) in ranges.items():
        a = _alias()
        aggs.append(
            F.count(
                F.when((F.col(c) < F.lit(lo)) | (F.col(c) > F.lit(hi)), 1)
            ).alias(a)
        )
        rows.append(("range", c, a))
    for c, vals in accepted_values.items():
        a = _alias()
        aggs.append(
            F.count(
                F.when(
                    F.col(c).isNotNull() & ~F.col(c).isin(list(vals)), 1
                )
            ).alias(a)
        )
        rows.append(("accepted_values", c, a))

    for c, thr in threshold_completeness.items():
        a = _alias()
        aggs.append(F.count(F.col(c)).alias(a))
        frac_rows.append(("completeness", c, a, float(thr)))
    for name, (pred, thr) in compliance.items():
        a = _alias()
        pred = F.expr(pred) if isinstance(pred, str) else pred
        if not isinstance(pred, Column):
            raise ValueError(
                f"compliance rule {name!r}: predicate must be SQL or Column"
            )
        aggs.append(F.sum(F.when(pred, 1).otherwise(0)).alias(a))
        frac_rows.append(("compliance", name, a, float(thr)))

    one = df.agg(*aggs)
    n_rows = F.col("_n_rows").cast("double")
    reports = [
        F.struct(
            F.lit(check).alias("check"),
            F.lit(target).alias("target"),
            F.col(alias).cast("double").alias("metric"),
            (F.col(alias) == 0).alias("passed"),
        )
        for check, target, alias in rows
    ]
    for check, target, alias, thr in frac_rows:
        frac = qround(F.when(n_rows > 0, F.col(alias) / n_rows), digits)
        reports.append(
            F.struct(
                F.lit(check).alias("check"),
                F.lit(target).alias("target"),
                frac.alias("metric"),
                F.coalesce(frac >= F.lit(thr), F.lit(False)).alias("passed"),
            )
        )
    if min_rows is not None:
        reports.append(
            F.struct(
                F.lit("min_rows").alias("check"),
                F.lit("*").alias("target"),
                F.col("_n_rows").cast("double").alias("metric"),
                (F.col("_n_rows") >= min_rows).alias("passed"),
            )
        )
    report = one.select(
        F.explode(F.array(*reports)).alias("_r")
    ).select("_r.check", "_r.target", "_r.metric", "_r.passed")

    for col, dim, dim_col in foreign_keys:
        orphans = (
            df.filter(F.col(col).isNotNull())
            .join(
                F.broadcast(dim.select(F.col(dim_col).alias(col)).distinct()),
                col,
                "left_anti",
            )
            .agg(F.count(F.lit(1)).alias("_m"))
            .select(
                F.lit("foreign_key").alias("check"),
                F.lit(col).alias("target"),
                F.col("_m").cast("double").alias("metric"),
                (F.col("_m") == 0).alias("passed"),
            )
        )
        report = report.unionByName(orphans)
    return report
