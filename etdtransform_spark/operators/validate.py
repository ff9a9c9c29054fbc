"""Household column validation — the reference's per-household data-quality
check re-expressed as ONE set-based aggregate.

Reference: ``validate_household_column`` (`/root/reference/etdtransform/
impute.py:262-326`) loops household-by-household, column-by-column, logging
and returning a bool per (house, column): invalid when the column is
all-missing, sums to zero, or never changes (each comparison on
``round(x, 10)``); >40% missing and a zero diff-sum are warnings only. It is
marked "currently unused in the main processing pipeline" — implemented here
anyway for surface completeness, as a validation REPORT: one row per
(household, column) with every flag, produced by a single groupBy over the
fact table (per-column conditional aggregates + explode to long form), so
100k households x 13 columns is one shuffle instead of 1.3M pandas loops.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.scalars import qround


def validate_household_columns(
    df: DataFrame,
    columns: Sequence[tuple[str, str | None]],
    key_col: str = "HuisIdBSV",
    na_warn_ratio: float = 0.4,
) -> DataFrame:
    """Validation report per (key, column).

    ``columns`` is a list of (cumulative_col, diff_col-or-None) pairs.
    Output flags mirror the reference's checks: ``all_missing``,
    ``zero_sum``, ``no_change`` (any of which make ``valid`` false, in the
    reference's short-circuit order), plus warning flags ``high_na``
    (> na_warn_ratio missing) and ``zero_diff_sum``. Sums/ranges compare at
    10 decimals like the reference's ``round(x, 10)``.
    """
    aggs = []
    for cum, _diff in columns:
        aggs += [
            (F.count(F.lit(1)) - F.count(F.col(cum))).alias(f"_na_{cum}"),
            F.count(F.lit(1)).alias(f"_n_{cum}"),
            qround(F.coalesce(F.sum(cum), F.lit(0.0)), 10).alias(f"_sum_{cum}"),
            qround(
                F.coalesce(F.max(cum) - F.min(cum), F.lit(0.0)), 10
            ).alias(f"_rng_{cum}"),
        ]
    for cum, diff in columns:
        if diff is not None:
            aggs.append(
                qround(F.coalesce(F.sum(diff), F.lit(0.0)), 10).alias(
                    f"_dsum_{cum}"
                )
            )
    agged = df.groupBy(key_col).agg(*aggs)

    per_col = []
    for cum, diff in columns:
        dsum = (
            F.col(f"_dsum_{cum}") if diff is not None else F.lit(None).cast("double")
        )
        per_col.append(
            F.struct(
                F.lit(cum).alias("column"),
                F.col(f"_na_{cum}").cast("bigint").alias("n_missing"),
                F.col(f"_n_{cum}").cast("bigint").alias("n_rows"),
                (F.col(f"_na_{cum}") == F.col(f"_n_{cum}")).alias("all_missing"),
                (F.col(f"_na_{cum}") / F.col(f"_n_{cum}") > na_warn_ratio).alias(
                    "high_na"
                ),
                (F.col(f"_sum_{cum}") == 0.0).alias("zero_sum"),
                (F.col(f"_rng_{cum}") == 0.0).alias("no_change"),
                F.coalesce(dsum == 0.0, F.lit(False)).alias("zero_diff_sum"),
            )
        )
    long = agged.select(
        key_col, F.explode(F.array(*per_col)).alias("v")
    ).select(key_col, "v.*")
    return long.withColumn(
        "valid",
        ~F.col("all_missing") & ~F.col("zero_sum") & ~F.col("no_change"),
    )
