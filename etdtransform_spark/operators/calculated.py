"""Derived energy-balance columns.

Reference ``add_calculated_columns_imputed_data`` (calculated_columns.py:9-139),
fillna=True semantics only — the fillna=False branch in the reference is
broken (dangling ``+ expr`` statements, calculated_columns.py:92-93; SURVEY
§2.10) and is not reproduced.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.scalars import coalesce0


def add_calculated_columns(df: DataFrame) -> DataFrame:
    """Add the 8 derived columns and rename Zon-opwekTotaalDiff ->
    ZonopwekBruto. Single ``withColumns`` pass; later columns reference
    earlier ones exactly as the reference chains them."""
    zon = "Zon-opwekTotaalDiff"
    if zon in df.columns:
        df = df.withColumnRenamed(zon, "ZonopwekBruto")

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
