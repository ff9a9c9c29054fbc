"""End-to-end ETL pipeline orchestration.

Mirrors the reference's stage chain (README.md:157-297, SURVEY §3A) with the
same Parquet checkpoint-by-file contract, so each stage stays independently
runnable/testable:

    combine -> avg-diff prep -> impute+normalize -> calculated columns
            -> resample (5min..24h) -> project aggregation

Within a stage everything is one lazy DAG; between stages we write/read
partitioned Parquet. Stage sinks partition by ProjectIdBSV so downstream
project-level aggregations get partition pruning for free.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..config import (
    IMPUTE_CUMULATIVE_COLUMNS,
    INTERVALS,
    get_diff_columns,
)
from ..operators.aggregate import aggregate_project_data
from ..operators.calculated import add_calculated_columns
from ..operators.impute import (
    calculate_average_diff,
    household_diff_max_bounds,
    impute_and_normalize,
    imputation_summaries,
)
from ..operators.resample import resample
from ..sources.parquet import read_family, write_family


def run_pipeline(
    spark: SparkSession,
    household_df: DataFrame,
    output_folder: str,
    cumulative_columns: list[str] | None = None,
    intervals: list[str] | None = None,
) -> dict[str, str]:
    """Run the full chain from a combined household DataFrame; returns the
    map of family name -> written path."""
    os.makedirs(output_folder, exist_ok=True)
    cum_cols = cumulative_columns or [
        c for c in IMPUTE_CUMULATIVE_COLUMNS if c in household_df.columns
    ]
    diff_cols = get_diff_columns(cum_cols)
    ivs = intervals or INTERVALS
    written: dict[str, str] = {}

    written["household_default"] = write_family(
        household_df, output_folder, "household_default", partition_by=["ProjectIdBSV"]
    )
    household_df = read_family(spark, output_folder, "household_default")

    # stage: avg-diff preparation (impute.py:469-537)
    bounds = household_diff_max_bounds(household_df, diff_cols)
    written["household_diff_max_bounds"] = write_family(
        bounds, output_folder, "household_diff_max_bounds"
    )
    bounds = read_family(spark, output_folder, "household_diff_max_bounds")
    avg_diffs = calculate_average_diff(household_df, diff_cols, max_bounds=bounds)
    written["avg_diffs"] = write_family(avg_diffs, output_folder, "avg_diffs")
    avg_diffs = read_family(spark, output_folder, "avg_diffs")

    # stage: imputation + normalization (impute.py:564-768)
    imputed, gap_stats = impute_and_normalize(
        household_df, cum_cols, avg_diffs=avg_diffs
    )
    written["household_imputed"] = write_family(
        imputed, output_folder, "household_imputed", partition_by=["ProjectIdBSV"]
    )
    imputed = read_family(spark, output_folder, "household_imputed")
    written["impute_gap_stats"] = write_family(
        gap_stats, output_folder, "impute_gap_stats"
    )
    gap_stats = read_family(spark, output_folder, "impute_gap_stats")
    sum_house, sum_project = imputation_summaries(gap_stats, imputed)
    written["impute_summary_household"] = write_family(
        sum_house, output_folder, "impute_summary_household"
    )
    written["impute_summary_project"] = write_family(
        sum_project, output_folder, "impute_summary_project"
    )

    # stage: project-mean of diffs (aggregate.py:190-194)
    from pyspark.sql import functions as F

    aggregated_diff = imputed.groupBy("ProjectIdBSV", "ReadingDate").agg(
        *[F.avg(c).alias(c) for c in diff_cols]
    )
    written["household_aggregated_diff"] = write_family(
        aggregated_diff, output_folder, "household_aggregated_diff"
    )

    # stage: calculated columns (calculated_columns.py:9-139)
    calculated = add_calculated_columns(imputed)
    written["household_calculated"] = write_family(
        calculated, output_folder, "household_calculated", partition_by=["ProjectIdBSV"]
    )
    calculated = read_family(spark, output_folder, "household_calculated")

    # stage: resample matrix + project aggregation (aggregate.py:356-539)
    for iv in ivs:
        hh_iv = resample(calculated, iv)
        written[f"household_{iv}"] = write_family(
            hh_iv, output_folder, "household", interval=iv
        )
        hh_iv = read_family(spark, output_folder, "household", interval=iv)
        proj_iv = aggregate_project_data(hh_iv)
        written[f"project_{iv}"] = write_family(
            proj_iv, output_folder, "project", interval=iv
        )
    return written
