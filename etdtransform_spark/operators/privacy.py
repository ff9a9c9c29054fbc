"""Privacy-risk audits over quasi-identifier columns: k-anonymity,
l-diversity, and a re-identification risk summary.

Training corpora and analytics extracts are routinely audited before
release: a record whose quasi-identifier combination (e.g. nation +
market segment + account-balance band) is shared by fewer than k rows is
re-identifiable, and an equivalence class whose sensitive attribute
takes fewer than l distinct values leaks that attribute even at high k
(homogeneity attack). Complements ``corpus.scrub_pii`` (which removes
surface PII strings) with the structural audit the reference pipeline
lacks — cited alongside the reference's validation surface
(/root/reference/etdtransform/vectorized_impute.py validators) as the
same "gate before publish" role.

Scale shape: ONE map-side-combined hash aggregate over the
quasi-identifier columns produces every per-class statistic (k, distinct
sensitive values, sensitive-value histogram); the summary is a second
dictionary-sized aggregate over the class table. Nothing shuffles rows —
only (QI-combination, counts) pairs, bounded by the QI domain, not the
row count. l-diversity uses exact ``count_distinct`` inside the same
aggregate; at extreme sensitive-value cardinality swap in
``approx_count_distinct`` (documented knob, same plan shape).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.scalars import qround


def k_anonymity(
    df: DataFrame,
    quasi_cols: Sequence[str],
    sensitive_col: str | None = None,
) -> DataFrame:
    """Per-equivalence-class anonymity statistics.

    Groups by ``quasi_cols`` (NULL is a legitimate QI value — Spark and
    ANSI SQL GROUP BY both treat NULLs as one group, so no null-safe
    special-casing is needed) and returns one row per class with:

    - ``k``            — class size (rows sharing the QI combination)
    - ``l_distinct``   — distinct sensitive values in the class (only
                         when ``sensitive_col`` is given)
    - ``top_sensitive_share`` — frequency share of the most common
      sensitive value in the class (only with ``sensitive_col``).
      This is the statistic behind *probabilistic* l-diversity: a class
      where 95% of rows share one diagnosis is leaky even if l >= 2.
      A NULL sensitive value is a candidate mode here, same as in
      ``l_distinct``: "sensitive value unrecorded" is itself leaky
      information (an attacker learning 95% of a class has no recorded
      diagnosis has learned something), so the max ranges over the NULL
      group too rather than silently skipping it.

    One hash aggregate; the per-class mode share is computed from a
    (QI, sensitive) pre-aggregate so the row-level scan is aggregated at
    the finest grain once and every coarser statistic derives from it —
    at 100 TB the shuffle carries counts, never rows.
    """
    qi = [F.col(c) for c in quasi_cols]
    if sensitive_col is None:
        return df.groupBy(*qi).agg(F.count(F.lit(1)).cast("long").alias("k"))

    fine = df.groupBy(*qi, F.col(sensitive_col)).agg(
        F.count(F.lit(1)).cast("long").alias("_n")
    )
    return fine.groupBy(*[F.col(c) for c in quasi_cols]).agg(
        F.sum("_n").cast("long").alias("k"),
        # NULL sensitive values count as a distinct value for diversity:
        # count_distinct skips NULLs, so add an indicator for their group.
        (
            F.count_distinct(F.col(sensitive_col))
            + F.max(F.when(F.col(sensitive_col).isNull(), 1).otherwise(0))
        )
        .cast("long")
        .alias("l_distinct"),
        qround(F.max("_n") / F.sum("_n"), 6).alias("top_sensitive_share"),
    )


def l_diversity_violations(
    df: DataFrame,
    quasi_cols: Sequence[str],
    sensitive_col: str,
    k_min: int = 2,
    l_min: int = 2,
) -> DataFrame:
    """Equivalence classes that violate k-anonymity or l-diversity.

    Returns the per-class audit rows (same schema as :func:`k_anonymity`
    plus boolean ``k_violation`` / ``l_violation``) restricted to
    violating classes — the actionable worklist for suppression or
    generalization. A class violates k if ``k < k_min`` and violates l
    if ``l_distinct < l_min``.
    """
    audit = k_anonymity(df, quasi_cols, sensitive_col)
    return audit.withColumns(
        {
            "k_violation": F.col("k") < F.lit(int(k_min)),
            "l_violation": F.col("l_distinct") < F.lit(int(l_min)),
        }
    ).filter(F.col("k_violation") | F.col("l_violation"))


def reidentification_risk(
    df: DataFrame,
    quasi_cols: Sequence[str],
    sensitive_col: str | None = None,
    k_thresholds: Sequence[int] = (2, 5, 10),
) -> DataFrame:
    """One-row dataset-level re-identification risk summary.

    Reports, over the equivalence-class table of ``quasi_cols``:

    - ``n_rows`` / ``n_classes``  — total rows and QI combinations
    - ``min_k``                   — smallest class (worst case)
    - ``rows_at_risk_k{t}`` and ``pct_at_risk_k{t}`` for each threshold
      ``t`` — rows living in classes smaller than ``t``
    - ``min_l`` (with ``sensitive_col``) — least-diverse class

    Two aggregates total: the class build (data-sized keys, count
    payload) and a dictionary-sized rollup. The percentage is qround'd
    so the report is bit-stable across engines and retries.
    """
    audit = k_anonymity(df, quasi_cols, sensitive_col)
    aggs: list[Column] = [
        F.sum("k").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_classes"),
        F.min("k").cast("long").alias("min_k"),
    ]
    for t in k_thresholds:
        t = int(t)
        at_risk = F.sum(F.when(F.col("k") < t, F.col("k")).otherwise(0))
        aggs.append(at_risk.cast("long").alias(f"rows_at_risk_k{t}"))
        aggs.append(
            qround(at_risk / F.sum("k"), 6).alias(f"pct_at_risk_k{t}")
        )
    if sensitive_col is not None:
        aggs.append(F.min("l_distinct").cast("long").alias("min_l"))
    return audit.agg(*aggs)


def t_closeness(
    df: DataFrame,
    quasi_cols: Sequence[str],
    sensitive_col: str,
    threshold: float = 0.3,
    digits: int = 6,
) -> DataFrame:
    """t-closeness audit (Li, Li & Venkatasubramanian 2007) for a
    categorical sensitive attribute: per quasi-identifier group, the
    total-variation distance between the group's sensitive-value
    distribution and the GLOBAL one — the diversity notion l-diversity
    misses (a group can hold l distinct diagnoses and still leak by
    skew).

    t(g) = ½ Σ_v |p_g(v) − p(v)|, computed WITHOUT materializing the
    (groups × values) grid: values absent from a group contribute
    Σ_{v∉g} p(v) = 1 − Σ_{v∈g} p(v), so only group-PRESENT cells are
    enumerated — one (quasi, value) count aggregate joined to the
    dictionary-sized global value distribution (broadcast), then one
    per-group rollup. Rows with a NULL sensitive value are excluded
    (no distribution evidence); NULL quasi values form their own group,
    consistent with :func:`k_anonymity`.

    Returns (quasi…, n, t_distance, violates) with
    violates = t_distance > threshold (never NULL: every group has a
    distribution once it has rows).
    """
    qcols = list(quasi_cols)
    if not qcols:
        raise ValueError("quasi_cols must be non-empty")
    s = F.col(sensitive_col)
    base = df.filter(s.isNotNull()).select(*qcols, s.alias("_v"))
    cells = base.groupBy(*qcols, "_v").agg(F.count(F.lit(1)).alias("_c"))
    glob = cells.groupBy("_v").agg(F.sum("_c").alias("_gv"))
    tot = cells.agg(F.sum("_c").alias("_gt"))
    from pyspark.sql import Window

    # group size via a window over the (quasi, value) CELL table — the
    # cells are already co-partitioned by the groupBy above, so this
    # window is dictionary-sized per group, not a data shuffle
    w_g = Window.partitionBy(*qcols)
    joined = (
        cells.withColumn("_gn", F.sum("_c").over(w_g))
        .join(F.broadcast(glob), "_v")
        .crossJoin(F.broadcast(tot))
    )
    grp = joined.groupBy(*qcols).agg(
        F.sum("_c").alias("n"),
        F.sum(
            F.abs(
                F.col("_c").cast("double") / F.col("_gn").cast("double")
                - F.col("_gv").cast("double") / F.col("_gt").cast("double")
            )
        ).alias("_present"),
        F.sum(F.col("_gv").cast("double") / F.col("_gt").cast("double"))
        .alias("_pmass"),
    )
    t = 0.5 * (F.col("_present") + (1.0 - F.col("_pmass")))
    return grp.select(
        *qcols,
        "n",
        qround(t, digits).alias("t_distance"),
        (t > F.lit(threshold)).alias("violates"),
    )
