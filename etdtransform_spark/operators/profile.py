"""Table-profile snapshots and snapshot drift — the schema-level
pre-flight companion to the value-level drift family (psi_drift /
ks_2samp / qq_table): per-column null rates, cardinalities and means,
and the release-over-release diff of those numbers.

At 100 TB this is the table a pipeline reads BEFORE deciding whether
to reprocess: a column whose null rate jumped 0.1 % → 40 % between two
snapshot dates is an upstream break that every value-level monitor
downstream would mis-attribute. One aggregate pass per snapshot,
column-count-sized output.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.scalars import qround


def column_profile(
    df: DataFrame,
    numeric_cols: Sequence[str] = (),
    categorical_cols: Sequence[str] = (),
    digits: int = 6,
) -> DataFrame:
    """Per-column profile in ONE aggregate pass: row count, null rate
    (NaN counted as null for numerics), exact distinct count, and mean
    (numeric columns only; NULL for categoricals).

    Exact ``count_distinct`` keeps the oracle comparable; at 100 TB
    swap for ``approx_count_distinct`` (one Expand stage fewer, same
    output shape — the documented trade, as with the percentile
    family). Returns one row per column:
    (column, n_rows, null_rate, n_distinct, mean).
    """
    cols = [(c, True) for c in numeric_cols] + [
        (c, False) for c in categorical_cols
    ]
    if not cols:
        raise ValueError("profile needs at least one column")
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c, is_num in cols:
        col = F.col(c)
        # numeric missing = NULL, NaN, or NOT CASTABLE to double: a
        # string value in a declared-numeric column try_casts to NULL
        # (a bare ANSI cast would THROW), and Spark's isnan(NULL) is
        # false — so without the explicit cast-is-null term the row
        # would vanish from BOTH the null count and the valid set
        # (null_rate understates and n_rows != null + valid).
        casted = col.try_cast("double")
        missing = (
            col.isNull() | casted.isNull() | F.isnan(casted)
            if is_num
            else col.isNull()
        )
        valid = F.when(~missing, col)
        aggs.append(
            F.sum(missing.cast("bigint")).alias(f"_null_{c}")
        )
        aggs.append(F.count_distinct(valid).alias(f"_dist_{c}"))
        aggs.append(
            (
                F.avg(valid.try_cast("double"))
                if is_num
                else F.lit(None).cast("double")
            ).alias(f"_mean_{c}")
        )
    g = df.agg(*aggs)
    # unpivot the 1-row aggregate via ONE explode — a union of per-column
    # selects would re-run the count_distinct-expanded aggregate (and its
    # table scan) once per profiled column (measured: 12 FileScans for a
    # 3-column profile)
    return g.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.col("_n").cast("bigint").alias("n_rows"),
                        qround(
                            F.when(
                                F.col("_n") > 0,
                                F.col(f"_null_{c}").cast("double")
                                / F.col("_n").cast("double"),
                            ),
                            digits,
                        ).alias("null_rate"),
                        F.col(f"_dist_{c}")
                        .cast("bigint")
                        .alias("n_distinct"),
                        qround(F.col(f"_mean_{c}"), digits).alias("mean"),
                    )
                    for c, _ in cols
                ]
            )
        ).alias("_s")
    ).select("_s.*")


def profile_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    numeric_cols: Sequence[str] = (),
    categorical_cols: Sequence[str] = (),
    digits: int = 6,
) -> DataFrame:
    """Column-profile diff between two snapshots of the same table
    (baseline *a* vs candidate *b*): the null-rate delta, the distinct-
    count ratio, and the mean delta per column — the numbers a
    reprocess/rollback decision reads first.

    Two single-pass profiles (one per snapshot) joined on column name
    (column-count-sized). Returns one row per column:
    (column, n_a, n_b, null_rate_a, null_rate_b, null_rate_delta,
    distinct_a, distinct_b, distinct_ratio, mean_a, mean_b,
    mean_delta); ratios are NULL when the baseline side is 0.
    """
    pa = column_profile(df_a, numeric_cols, categorical_cols, digits)
    pb = column_profile(df_b, numeric_cols, categorical_cols, digits)
    a = pa.select(
        "column",
        F.col("n_rows").alias("n_a"),
        F.col("null_rate").alias("null_rate_a"),
        F.col("n_distinct").alias("distinct_a"),
        F.col("mean").alias("mean_a"),
    )
    b = pb.select(
        "column",
        F.col("n_rows").alias("n_b"),
        F.col("null_rate").alias("null_rate_b"),
        F.col("n_distinct").alias("distinct_b"),
        F.col("mean").alias("mean_b"),
    )
    return a.join(b, "column", "full").select(
        "column",
        "n_a",
        "n_b",
        "null_rate_a",
        "null_rate_b",
        qround(
            F.col("null_rate_b") - F.col("null_rate_a"), digits
        ).alias("null_rate_delta"),
        "distinct_a",
        "distinct_b",
        qround(
            F.when(
                F.col("distinct_a") > 0,
                F.col("distinct_b").cast("double")
                / F.col("distinct_a").cast("double"),
            ),
            digits,
        ).alias("distinct_ratio"),
        "mean_a",
        "mean_b",
        qround(F.col("mean_b") - F.col("mean_a"), digits).alias(
            "mean_delta"
        ),
    )


def benford_deviation(
    df: DataFrame,
    value_col: str,
    digits: int = 6,
) -> DataFrame:
    """Benford's-law first-digit audit of a numeric column — the
    classic fabricated-/truncated-data detector for metric pipelines
    (a synthetic or unit-capped column's leading-digit distribution
    departs from log10(1 + 1/d) in ways value-level monitors miss).

    The first significant digit is computed numerically with a
    1-ulp-robust normalization: e = floor(log10(|x|)), m = |x|/10^e,
    then m is re-normalized into [1, 10) with an explicit CASE — engine
    log10 implementations may differ in the last ulp exactly at powers
    of ten, and the correction makes the digit depend only on IEEE
    division (identical across engines), not on libm. Zero, NULL and
    NaN values carry no leading digit and are excluded.

    ONE count aggregate over the 9-digit domain, scaffolded against a
    broadcast 1-9 grid so absent digits report n = 0. Returns 9 rows:
    (digit, n, share, expected_share, chi2_term) with
    chi2_term = n_total · (share − expected)² / expected (summing the
    column gives the 8-dof Pearson statistic).
    """
    x = F.abs(F.col(value_col).cast("double"))
    # ±Infinity has no leading digit either: inf/inf would be NaN and
    # floor(NaN) engine-divergent, so exclude non-finite alongside 0/NaN
    base = df.filter(
        F.col(value_col).isNotNull()
        & ~F.isnan(F.col(value_col).cast("double"))
        & (x > 0)
        & (x < F.lit(float("inf")))
    )
    e = F.floor(F.log10(x))
    m0 = x / F.pow(F.lit(10.0), e.cast("double"))
    m1 = (
        F.when(m0 < 1.0, m0 * 10.0)
        .when(m0 >= 10.0, m0 / 10.0)
        .otherwise(m0)
    )
    d = F.least(F.greatest(F.floor(m1).cast("int"), F.lit(1)), F.lit(9))
    counts = base.select(d.alias("digit")).groupBy("digit").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    spark = df.sparkSession
    grid = F.broadcast(
        spark.createDataFrame([(i,) for i in range(1, 10)], "digit int")
    )
    tot = counts.agg(F.sum("n").alias("_nt"))
    joined = (
        grid.join(counts, "digit", "left")
        .withColumn("n", F.coalesce(F.col("n"), F.lit(0)))
        .crossJoin(F.broadcast(tot))
    )
    nt = F.col("_nt").cast("double")
    share = F.col("n").cast("double") / nt
    expected = F.log10(1.0 + 1.0 / F.col("digit").cast("double"))
    return joined.select(
        F.col("digit").cast("bigint").alias("digit"),
        "n",
        qround(F.when(F.col("_nt") > 0, share), digits).alias("share"),
        qround(expected, digits).alias("expected_share"),
        qround(
            F.when(
                F.col("_nt") > 0,
                nt * (share - expected) * (share - expected) / expected,
            ),
            digits,
        ).alias("chi2_term"),
    )
