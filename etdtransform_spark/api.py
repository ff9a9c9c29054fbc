"""Analytical load API — the reference's "read path" (SURVEY §3B).

Reference ``get_household_tables`` / ``get_project_tables``
(load_data.py:23-67, 320-351) return a dict of lazy Ibis tables, index- and
weather-joined; here they return lazy Spark DataFrames with the same shape.
``get_weather_data_table`` reproduces the weather analytics chain
(load_data.py:103-246): timestamps from the (YYYYMMDD, HH) keys, 14-day
rolling means, ISO-week aggregates, coldest-2-weeks flags joined back.

Everything stays one declarative DAG per table — Catalyst prunes columns and
pushes filters into the Parquet scans, replacing the Ibis/DuckDB pushdown the
reference relies on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .config import INTERVALS
from .operators.periods import add_rolling_avg, mark_coldest_weeks, weekly_stats
from .sources.knmi import join_weather_data
from .sources.parquet import join_index, read_family

HOUSEHOLD_TABLES = ["default", "calculated"]


def get_household_tables(
    spark: SparkSession,
    folder: str,
    intervals: list[str] | None = None,
    index_df: DataFrame | None = None,
    weather: DataFrame | None = None,
    station_mapping: DataFrame | None = None,
    metadata_columns: list[str] | None = None,
) -> dict[str, DataFrame]:
    """Lazy household tables per interval (plus ``default``/``calculated``
    when present), each left-joined with the (broadcast) index and optionally
    weather (reference get_household_tables, load_data.py:23-67)."""
    out: dict[str, DataFrame] = {}
    names = [(t, None) for t in HOUSEHOLD_TABLES] + [
        ("household", iv) for iv in (intervals or INTERVALS)
    ]
    for name, iv in names:
        family = f"household_{name}" if iv is None else name
        try:
            df = read_family(spark, folder, family, iv)
        except Exception:  # noqa: BLE001 — family not materialized
            continue
        if index_df is not None:
            df = join_index(df, index_df, metadata_columns)
        if weather is not None and station_mapping is not None:
            df = join_weather_data(df, weather, station_mapping)
        out[name if iv is None else iv] = df
    return out


def get_project_tables(
    spark: SparkSession,
    folder: str,
    intervals: list[str] | None = None,
    weather: DataFrame | None = None,
    station_mapping: DataFrame | None = None,
) -> dict[str, DataFrame]:
    """Lazy project-level tables per interval, optionally weather-joined
    (reference get_project_tables, load_data.py:320-351)."""
    out: dict[str, DataFrame] = {}
    for iv in intervals or INTERVALS:
        try:
            df = read_family(spark, folder, "project", iv)
        except Exception:  # noqa: BLE001
            continue
        if weather is not None and station_mapping is not None:
            df = join_weather_data(df, weather, station_mapping)
        out[iv] = df
    return out


def get_weather_data_table(
    weather: DataFrame,
    rolling_hours: int = 14 * 24,
) -> DataFrame:
    """Weather analytics chain (reference get_weather_data_table,
    load_data.py:103-246): build a timestamp from the integer (YYYYMMDD, HH)
    keys (HH is 1-24), add 14-day rolling means of Temperatuur and
    Gevoelstemperatuur (min half-window), ISO-week averages, and the
    coldest-2-ISO-weeks flags joined back onto the hourly rows."""
    ts = F.to_timestamp(F.col("YYYYMMDD").cast("string"), "yyyyMMdd") + (
        (F.col("HH") - 1) * F.expr("INTERVAL 1 HOUR")
    )
    df = weather.withColumn("ts", ts)
    # label follows the actual window (14d only when rolling_hours=336)
    days = max(1, round(rolling_hours / 24))
    for c in ["Temperatuur", "Gevoelstemperatuur"]:
        if c in df.columns:
            df = add_rolling_avg(
                df, c, rolling_hours, ["STN"], order_col="ts",
                out_col=f"Rolling{c}{days}d",
            )
    if "Temperatuur" not in df.columns:
        # weekly/coldest flags need Temperatuur; a frame without it (the
        # rolling loop above tolerates that) still gets the keyed rows back
        return df
    weekly = weekly_stats(df, "Temperatuur", ["STN"], ts_col="ts")
    flagged = mark_coldest_weeks(
        weekly, "Temperatuur_weekly_avg", ["STN"], k=2
    ).select(
        "STN",
        "iso_year",
        "week_of_year",
        F.col("Temperatuur_weekly_avg").alias("WeeklyAvgTemp"),
        F.col("rank").alias("ColdestWeekRank"),
        F.col("is_coldest_week").alias("Koudste2ISOWkn"),
    )
    keyed = df.withColumns(
        {
            "iso_year": F.expr("extract(yearofweek FROM ts)").cast("int"),
            "week_of_year": F.weekofyear("ts"),
        }
    )
    # select-before-join instead of the reference's "_right"-suffix cleanup
    # (load_data.py:241-243)
    return keyed.join(
        F.broadcast(flagged), ["STN", "iso_year", "week_of_year"], "left"
    )


def register_sql_views(
    spark: SparkSession,
    folder: str,
    intervals: list[str] | None = None,
    index_df: DataFrame | None = None,
) -> list[str]:
    """SQL façade over the dataset catalog: every materialized family in
    ``folder`` becomes a temp view (``household_60min``, ``project_24h``,
    ``avg_diffs``, ...), so users can run plain ``spark.sql`` over the
    pipeline outputs — the capability the reference delegates to Ibis'
    DuckDB backend (SURVEY §3B), here served by Catalyst directly. Views
    are lazy: registering costs one schema read per family; predicate
    pushdown/pruning apply to queries against them as to any scan.

    Returns the list of registered view names.
    """
    from .sources.parquet import family_path
    import os

    names: list[tuple[str, str | None]] = [
        ("household_default", None),
        ("household_calculated", None),
        ("household_imputed", None),
        ("household_aggregated_diff", None),
        ("avg_diffs", None),
        ("household_diff_max_bounds", None),
        ("impute_gap_stats", None),
        ("impute_summary_household", None),
        ("impute_summary_project", None),
    ]
    for iv in intervals or INTERVALS:
        names += [("household", iv), ("project", iv)]
    registered: list[str] = []
    for name, iv in names:
        path = family_path(folder, name, iv)
        if not os.path.exists(path):
            continue
        df = read_family(spark, folder, name, iv)
        if (
            index_df is not None
            and name.startswith("household")
            # some household-prefixed families are project-level aggregates
            # (household_aggregated_diff has no HuisIdBSV) — joining the
            # index there would abort registration of every view
            and {"HuisIdBSV", "ProjectIdBSV"}.issubset(set(df.columns))
        ):
            df = join_index(df, index_df)
        view = name if iv is None else f"{name}_{iv}"
        df.createOrReplaceTempView(view)
        registered.append(view)
    return registered


def catalog(spark: SparkSession, folder: str) -> DataFrame:
    """Discovery surface for the dataset catalog: one row per materialized
    family with its on-disk size, file count, column count, and commit
    state — what a user (or an ops dashboard) lists before querying.
    Metadata-only: directory listings plus one schema read per family,
    no data scanned.

    Returns (family, interval, path, n_files, size_bytes, n_columns,
    committed).
    """
    import os

    from .sources.parquet import family_path, read_family

    base_names: list[tuple[str, str | None]] = [
        ("household_default", None),
        ("household_calculated", None),
        ("household_imputed", None),
        ("household_aggregated_diff", None),
        ("avg_diffs", None),
        ("household_diff_max_bounds", None),
        ("impute_gap_stats", None),
        ("impute_summary_household", None),
        ("impute_summary_project", None),
    ]
    for iv in INTERVALS:
        base_names += [("household", iv), ("project", iv)]
    rows = []
    for name, iv in base_names:
        path = family_path(folder, name, iv)
        if not os.path.exists(path):
            continue
        n_files = size = 0
        committed = False
        for root, _dirs, files in os.walk(path):
            for f in files:
                if f == "_SUCCESS":
                    committed = True
                elif not f.startswith(("_", ".")):
                    n_files += 1
                    size += os.path.getsize(os.path.join(root, f))
        n_cols = len(read_family(spark, folder, name, iv).columns)
        rows.append(
            (
                name,
                iv,
                path,
                n_files,
                size,
                n_cols,
                committed,
            )
        )
    return spark.createDataFrame(
        rows,
        "family string, interval string, path string, n_files long, "
        "size_bytes long, n_columns long, committed boolean",
    )
