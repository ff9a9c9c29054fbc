"""Synthetic ETD 'mapped' folder for the reference-differential parity run.

Generates the etdmap-shaped inputs the reference pipeline consumes
(reference aggregate.py:84-121): one ``household_{HuisIdBSV}_table.parquet``
per household carrying ReadingDate + the 13 cumulative columns + their
precomputed ``<Var>Diff`` columns (etdmap's mapping stage computes diffs
upstream of the reference), plus ``index.parquet`` keyed
(HuisIdBSV, ProjectIdBSV) with ``Meenemen`` and ``Dataleverancier``.

The fixture is engineered to exercise every imputation code path:

- project 1 (houses 1-4): clean house; short (2-step) + medium (12-step)
  gaps; long 600-step gap + leading gap; an all-NA column, a trailing
  gap, and isolated above-threshold spikes (fires THRESHOLD_ADJUSTED
  outside gaps);
- project 2 (houses 101-112): eleven clean houses and one extreme
  outlier house (1000x increments in one column) so the 2x-p95
  household exclusion in avg-diff preparation actually drops a house
  (needs >=12 houses: the 0.95 quantile's interpolation weight
  0.95*(n-1) must land < .5 above the penultimate max, reference
  impute.py:55-100);
- one estate-wide zero-usage column (all diffs exactly 0, no NAs) so
  the reference's "no values to impute" shortcut branch
  (vectorized_impute.py:214-233) runs;
- one Meenemen=false house (data present, must be excluded by both
  engines).

All increments are deterministic (seeded numpy), non-negative (negative
diffs raise ValueError in reference impute.py:108), and ~100x below the
physical thresholds except the engineered spikes/outliers.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

from etdtransform_spark.config import CUMULATIVE_COLUMNS

N_STEPS = 288 * 14  # 14 days of 5-minute readings
T0 = pd.Timestamp("2023-01-01 00:00:00")

ZERO_COL = "ElektriciteitsgebruikBoilervat"  # estate-wide zero usage
OUTLIER_COL = "ElektriciteitsgebruikWarmtepomp"
OUTLIER_HOUSE = 112
MEENEMEN_FALSE_HOUSE = 9

HOUSES: dict[int, int] = {**{h: 1 for h in (1, 2, 3, 4, MEENEMEN_FALSE_HOUSE)},
                          **{h: 2 for h in range(101, 113)}}

# (house, column) -> list of (start, stop) half-open gap ranges
GAPS: dict[tuple[int, str], list[tuple[int, int]]] = {
    (2, "ElektriciteitNetgebruikHoog"): [(100, 102)],
    (2, "ElektriciteitNetgebruikLaag"): [(500, 512)],
    (3, "Zon-opwekTotaal"): [(1000, 1600)],
    (3, "ElektriciteitTerugleveringHoog"): [(0, 20)],
    (4, "ElektriciteitTerugleveringLaag"): [(N_STEPS - 32, N_STEPS)],
    (105, "ElektriciteitNetgebruikHoog"): [(300, 303)],
}
ALL_NA: set[tuple[int, str]] = {(4, "ElektriciteitsgebruikRadiator")}
# (house, column) -> rows where the increment is an above-threshold spike
SPIKES: dict[tuple[int, str], list[int]] = {
    (4, "ElektriciteitsgebruikWTW"): [200, 2000],
}
SPIKE_VALUE = 5.0  # > every THRESHOLDS Max


def _series(house: int, col: str, col_idx: int) -> tuple[pd.Series, pd.Series]:
    """(cumulative, diff) float64 series for one house/column."""
    if (house, col) in ALL_NA:
        na = pd.Series([np.nan] * N_STEPS, dtype="float64")
        return na, na.copy()
    rng = np.random.RandomState(house * 97 + col_idx)
    inc = np.round(rng.uniform(0.0, 0.02), 4)  # scalar base offset per series
    incs = np.round(rng.uniform(0.0, 0.03, N_STEPS) + inc, 4)
    if col == ZERO_COL:
        incs = np.zeros(N_STEPS)
    if house == OUTLIER_HOUSE and col == OUTLIER_COL:
        incs = np.round(incs * 1000.0, 4)
    for row in SPIKES.get((house, col), ()):
        incs[row] = SPIKE_VALUE
    cum = pd.Series(np.round(np.cumsum(incs), 4), dtype="float64")
    for start, stop in GAPS.get((house, col), ()):
        cum.iloc[start:stop] = np.nan
    diff = cum.diff()
    if col == ZERO_COL:
        diff.iloc[0] = 0.0  # no NAs at all -> "nothing to impute" shortcut
    return cum, diff


def write_mapped_folder(mapped_dir: str) -> pd.DataFrame:
    """Write per-household parquets + index.parquet; returns the index df."""
    os.makedirs(mapped_dir, exist_ok=True)
    dates = pd.date_range(T0, periods=N_STEPS, freq="5min")
    for house in HOUSES:
        data: dict[str, pd.Series] = {"ReadingDate": pd.Series(dates)}
        for i, col in enumerate(CUMULATIVE_COLUMNS):
            cum, diff = _series(house, col, i)
            data[col] = cum
            data[f"{col}Diff"] = diff
        pd.DataFrame(data).to_parquet(
            os.path.join(mapped_dir, f"household_{house}_table.parquet"),
            engine="pyarrow",
        )
    index_df = pd.DataFrame(
        {
            "HuisIdBSV": pd.Series(sorted(HOUSES), dtype="int64"),
            "ProjectIdBSV": pd.Series(
                [HOUSES[h] for h in sorted(HOUSES)], dtype="int64"
            ),
            "Meenemen": pd.Series(
                [h != MEENEMEN_FALSE_HOUSE for h in sorted(HOUSES)], dtype="bool"
            ),
            "Dataleverancier": pd.Series(
                [f"leverancier_{HOUSES[h]}" for h in sorted(HOUSES)],
                dtype="string",
            ),
        }
    ).sort_values(["ProjectIdBSV", "HuisIdBSV"]).reset_index(drop=True)
    index_df.to_parquet(os.path.join(mapped_dir, "index.parquet"), engine="pyarrow")
    return index_df
