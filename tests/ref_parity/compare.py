"""Family-by-family differ for the reference-parity harness.

Loads each dataset family from the reference's pandas output and the
Spark pipeline's output, canonicalizes (artifact columns dropped, rows
key-sorted, nullable dtypes unified, method lists sorted), and compares
values with a tight float tolerance. Returns a structured report so the
pytest layer can assert on it and print actionable diffs.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

# reference-side artifact columns, deliberately absent from the Spark side
# (documented SURVEY §2.10 dispositions):
# - index/level_0: pandas reset_index churn (impute.py:685,
#   aggregate.py:744,864);
# - comparable_to_impute_mask/diff_avg_sum/cum_diff_sum: imputation temp
#   columns of the LAST processed cumulative column that the reference's own
#   drop_temp_cols misses (vectorized_impute.py:311-331 logs them as
#   "leftover columns to remove from the code")
ARTIFACT_COLS = {
    "index",
    "level_0",
    "comparable_to_impute_mask",
    "diff_avg_sum",
    "cum_diff_sum",
}

SORT_KEYS = ["ProjectIdBSV", "HuisIdBSV", "column", "ReadingDate"]

FAMILIES: list[str] = [
    "household_default",
    "avg_diffs",
    "household_diff_max_bounds",
    "household_imputed",
    "impute_gap_stats",
    "impute_summary_household",
    "impute_summary_project",
    "household_aggregated_diff",
    "household_calculated",
    *[f"household_{iv}" for iv in ("5min", "15min", "60min", "6h", "24h")],
    *[f"project_{iv}" for iv in ("5min", "15min", "60min", "6h", "24h")],
]

RTOL = 1e-9
ATOL = 1e-12


def load_reference(ref_dir: str, family: str) -> pd.DataFrame:
    return pd.read_parquet(os.path.join(ref_dir, f"{family}.parquet"))


def load_spark(spark, written: dict[str, str], family: str) -> pd.DataFrame:
    return spark.read.parquet(written[family]).toPandas()


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.drop(columns=[c for c in ARTIFACT_COLS if c in df.columns])
    keys = [k for k in SORT_KEYS if k in df.columns]
    if keys:
        df = df.sort_values(keys, kind="mergesort")
    df = df.reset_index(drop=True)
    out = {}
    for c in df.columns:
        s = df[c]
        if s.dtype == object and s.map(
            lambda v: v is None or isinstance(v, (list, np.ndarray))
        ).all():
            # method lists: order is engine-dependent (pandas first-seen vs
            # Spark array_sort) -> compare as sorted int lists
            out[c] = s.map(
                lambda v: tuple(sorted(int(x) for x in v))
                if v is not None
                else ()
            )
        elif str(s.dtype) in ("Float64", "float32"):
            out[c] = s.astype("float64")
        elif str(s.dtype) in ("Int64", "Int32", "int32"):
            # nullable ints: keep NA, widen class
            out[c] = s.astype("Int64")
        elif str(s.dtype) == "int64":
            out[c] = s
        elif str(s.dtype) == "boolean":
            out[c] = s.astype("object").where(s.notna(), None)
        else:
            out[c] = s
    return pd.DataFrame(out)


def diff_family(
    ref: pd.DataFrame,
    got: pd.DataFrame,
    allow_ref_only: set[str] = frozenset(),
    allow_got_only: set[str] = frozenset(),
) -> list[str]:
    """Returns a list of human-readable mismatch strings (empty = parity)."""
    problems: list[str] = []
    ref = canonicalize(ref)
    got = canonicalize(got)
    ref_only = set(ref.columns) - set(got.columns)
    got_only = set(got.columns) - set(ref.columns)
    if ref_only - allow_ref_only:
        problems.append(f"reference-only columns: {sorted(ref_only - allow_ref_only)}")
    if got_only - allow_got_only:
        problems.append(f"spark-only columns: {sorted(got_only - allow_got_only)}")
    if len(ref) != len(got):
        problems.append(f"row count: reference={len(ref)} spark={len(got)}")
        return problems
    for c in sorted(set(ref.columns) & set(got.columns)):
        r, g = ref[c], got[c]
        if pd.api.types.is_float_dtype(r) or pd.api.types.is_float_dtype(g):
            r = r.astype("float64").to_numpy()
            g = g.astype("float64").to_numpy()
            both_nan = np.isnan(r) & np.isnan(g)
            close = np.isclose(r, g, rtol=RTOL, atol=ATOL) | both_nan
            if not close.all():
                i = int(np.argmin(close))
                problems.append(
                    f"column {c}: {int((~close).sum())} value mismatches, "
                    f"first at row {i}: reference={r[i]!r} spark={g[i]!r}"
                )
        elif str(r.dtype) == "Int64" or str(g.dtype) == "Int64":
            r = r.astype("Int64")
            g = g.astype("Int64")
            neq = ~((r.isna() & g.isna()) | (r == g).fillna(False))
            if neq.any():
                i = int(np.argmax(neq.to_numpy()))
                problems.append(
                    f"column {c}: {int(neq.sum())} value mismatches, "
                    f"first at row {i}: reference={r.iloc[i]!r} spark={g.iloc[i]!r}"
                )
        else:
            eq = (r == g) | (r.isna() & g.isna())
            if not eq.all():
                i = int(np.argmax((~eq).to_numpy()))
                problems.append(
                    f"column {c}: {int((~eq).sum())} value mismatches, "
                    f"first at row {i}: reference={r.iloc[i]!r} spark={g.iloc[i]!r}"
                )
    return problems
