"""Derived energy-balance columns.

Reference ``add_calculated_columns_imputed_data`` (calculated_columns.py:9-139),
fillna=True semantics only — the fillna=False branch in the reference is
broken (dangling ``+ expr`` statements, calculated_columns.py:92-93; SURVEY
§2.10) and is not reproduced.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def add_calculated_columns(df: DataFrame) -> DataFrame:
    """Add the 8 derived columns and rename Zon-opwekTotaalDiff ->
    ZonopwekBruto. Single ``withColumns`` pass; later columns reference
    earlier ones exactly as the reference chains them.

    Input diff columns absent from ``df`` are treated as all-zero (the
    reference operates on the full wide frame where every diff column
    exists and is ``fillna(0)``-ed; on narrower frames missing sensors
    contribute 0 to the balance)."""
    zon = "Zon-opwekTotaalDiff"
    if zon in df.columns:
        if "ZonopwekBruto" in df.columns:
            # renaming would create a DUPLICATE ZonopwekBruto column (Spark
            # allows it) and every later reference would be ambiguous
            df = df.drop(zon)
        else:
            df = df.withColumnRenamed(zon, "ZonopwekBruto")

    present = set(df.columns) | set(CALCULATED_COLUMNS)

    from ..functions.scalars import coalesce0 as _c0

    def coalesce0(name):
        # missing sensors contribute 0; present columns use the shared
        # fillna(0) helper (functions.scalars.coalesce0)
        if name not in present:
            return F.lit(0.0)
        return _c0(F.col(f"`{name}`"))

    teruglevering = coalesce0("ElektriciteitTerugleveringLaagDiff") + coalesce0(
        "ElektriciteitTerugleveringHoogDiff"
    )
    netto = coalesce0("ElektriciteitNetgebruikLaagDiff") + coalesce0(
        "ElektriciteitNetgebruikHoogDiff"
    )
    df = df.withColumns(
        {
            "TerugleveringTotaalNetto": teruglevering,
            "ElektriciteitsgebruikTotaalNetto": netto,
        }
    )
    df = df.withColumn(
        "Netuitwisseling",
        coalesce0("ElektriciteitsgebruikTotaalNetto")
        - coalesce0("TerugleveringTotaalNetto"),
    )
    df = df.withColumn(
        "ElektriciteitsgebruikTotaalWarmtepomp",
        coalesce0("ElektriciteitsgebruikWarmtepompDiff")
        + coalesce0("ElektriciteitsgebruikBoosterDiff"),
    )
    df = df.withColumn(
        "ElektriciteitsgebruikTotaalGebouwgebonden",
        coalesce0("ElektriciteitsgebruikTotaalWarmtepomp")
        + coalesce0("ElektriciteitsgebruikBoilervatDiff")
        + coalesce0("ElektriciteitsgebruikWTWDiff")
        + coalesce0("ElektriciteitsgebruikRadiatorDiff"),
    )
    df = df.withColumn(
        "ElektriciteitsgebruikTotaalHuishoudelijk",
        coalesce0("Netuitwisseling")
        + coalesce0("ZonopwekBruto")
        - coalesce0("ElektriciteitsgebruikTotaalGebouwgebonden"),
    )
    df = df.withColumn(
        "Zelfgebruik",
        coalesce0("ZonopwekBruto") - coalesce0("TerugleveringTotaalNetto"),
    )
    df = df.withColumn(
        "ElektriciteitsgebruikTotaalBruto",
        coalesce0("ElektriciteitsgebruikTotaalNetto") + coalesce0("Zelfgebruik"),
    )
    return df


CALCULATED_COLUMNS = [
    "TerugleveringTotaalNetto",
    "ElektriciteitsgebruikTotaalNetto",
    "Netuitwisseling",
    "ElektriciteitsgebruikTotaalWarmtepomp",
    "ElektriciteitsgebruikTotaalGebouwgebonden",
    "ElektriciteitsgebruikTotaalHuishoudelijk",
    "Zelfgebruik",
    "ElektriciteitsgebruikTotaalBruto",
]
