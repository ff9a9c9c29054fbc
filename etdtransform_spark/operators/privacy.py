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
