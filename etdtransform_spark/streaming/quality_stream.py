"""Structured Streaming quality monitor — the streaming half of
operators/classify.py (SURVEY §2.9 streaming-analogue axis).

Deployment shape: the MODEL is frozen offline (a hashed-feature weight
map, dictionary-sized); scoring is a STATELESS projection folded into the
stream (the literal-map path of ``hashed_linear_score`` — zero state,
zero shuffle), and the only stateful operator is one watermarked tumbling
window aggregating (count, mean score, gate pass-rate) per window. State
per open window is a single row. Streaming is a deployment mode, not a
different answer: the contract query checks the sink against the SAME
batch SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.scalars import qround
from ..operators.classify import hashed_linear_score


def streaming_quality_monitor(
    stream_df: DataFrame,
    text_col: str,
    ts_col: str,
    weights: dict[int, float],
    n_features: int,
    threshold: float = 0.5,
    ngram_sizes: tuple[int, ...] = (1, 2),
    window: str = "1 day",
    watermark: str = "1 hour",
    digits: int = 6,
) -> DataFrame:
    """Per tumbling window: scored-document count, mean model score, and
    the fraction clearing ``threshold``.

    Unscorable rows (NULL/empty text -> NULL score) are excluded from all
    three statistics — they carry no quality evidence, mirroring
    ``quality_gate``'s fail-closed default. Returns a streaming frame
    (bucket_ts, n, avg_score, pass_rate).
    """
    scored = hashed_linear_score(
        stream_df,
        text_col,
        weights,
        n_features,
        ngram_sizes=ngram_sizes,
        score_col="_q_score",
    )
    s = F.col("_q_score")
    marked = scored.filter(s.isNotNull()).withWatermark(ts_col, watermark)
    return (
        marked.groupBy(F.window(F.col(ts_col), window).alias("_w"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            qround(F.avg(s), digits).alias("avg_score"),
            qround(
                F.avg((s >= F.lit(float(threshold))).cast("double")), digits
            ).alias("pass_rate"),
        )
        .select(F.col("_w.start").alias("bucket_ts"), "n", "avg_score", "pass_rate")
    )


def streaming_classification_monitor(
    stream_df: DataFrame,
    score_col: str,
    label_col: str,
    ts_col: str,
    threshold: float = 0.5,
    window: str = "1 day",
    watermark: str = "1 hour",
    digits: int = 6,
) -> DataFrame:
    """Windowed model-performance monitor — the streaming deployment of
    ``operators/evaluation.py:binary_classification_report``: as delayed
    ground-truth labels join the scored stream (human review, user
    feedback), each tumbling window accumulates its confusion counts and
    the derived rates, so a post-deploy accuracy regression surfaces as
    the window series bending. Stateless scoring comparison; the only
    stateful operator is one watermarked window holding FOUR counts per
    open window.

    Emits (bucket_ts, n, tp, fp, tn, fn, accuracy, precision, recall)
    per window; NULL/NaN score/label rows carry no evidence (a NaN
    label would otherwise count as a positive under Spark NaN
    semantics), undefined ratios are NULL (no predicted positives means
    precision is undefined, not 0 or 1 — the batch twin's convention
    exactly).
    """
    s = F.col(score_col).cast("double")
    y = F.col(label_col).cast("double")
    pred = s >= F.lit(float(threshold))
    pos = y != 0
    base = stream_df.filter(
        s.isNotNull() & y.isNotNull() & ~F.isnan(s) & ~F.isnan(y)
    ).withWatermark(ts_col, watermark)
    agg = base.groupBy(F.window(F.col(ts_col), window).alias("_w")).agg(
        F.count(F.when(pred & pos, 1)).cast("bigint").alias("tp"),
        F.count(F.when(pred & ~pos, 1)).cast("bigint").alias("fp"),
        F.count(F.when(~pred & ~pos, 1)).cast("bigint").alias("tn"),
        F.count(F.when(~pred & pos, 1)).cast("bigint").alias("fn"),
    )
    tp, fp, tn, fn = (
        F.col(c).cast("double") for c in ("tp", "fp", "tn", "fn")
    )
    n = tp + fp + tn + fn
    return agg.select(
        F.col("_w.start").alias("bucket_ts"),
        (F.col("tp") + F.col("fp") + F.col("tn") + F.col("fn")).alias("n"),
        "tp",
        "fp",
        "tn",
        "fn",
        qround(F.when(n > 0, (tp + tn) / n), digits).alias("accuracy"),
        qround(F.when(tp + fp > 0, tp / (tp + fp)), digits).alias(
            "precision"
        ),
        qround(F.when(tp + fn > 0, tp / (tp + fn)), digits).alias("recall"),
    )


def streaming_regression_monitor(
    stream_df: DataFrame,
    pred_col: str,
    target_col: str,
    ts_col: str,
    window: str = "1 day",
    watermark: str = "1 hour",
    digits: int = 6,
) -> DataFrame:
    """Windowed regression-quality monitor — the streaming deployment of
    ``operators/evaluation.py:regression_report``: as ground-truth
    outcomes join the predicted stream, each tumbling window accumulates
    error partials, so a reward-model or forecast regression surfaces as
    the window series bending. Stateless error projection; the only
    stateful operator is one watermarked window holding FOUR partials.

    Emits (bucket_ts, n, mae, rmse, bias) per window, bias =
    mean(pred − target) (systematic over/under-prediction, signed —
    mae/rmse hide direction). NULL/NaN rows on either column carry no
    evidence; empty windows simply don't exist in the output. r² is
    deliberately absent: a per-window target variance makes windows
    incomparable — track rmse against a fixed baseline instead.
    """
    p = F.col(pred_col).cast("double")
    y = F.col(target_col).cast("double")
    e = p - y
    base = stream_df.filter(
        p.isNotNull() & y.isNotNull() & ~F.isnan(p) & ~F.isnan(y)
    ).withWatermark(ts_col, watermark)
    agg = base.groupBy(F.window(F.col(ts_col), window).alias("_w")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.abs(e)).alias("_sae"),
        F.sum(e * e).alias("_sse"),
        F.sum(e).alias("_se"),
    )
    n = F.col("n").cast("double")
    return agg.select(
        F.col("_w.start").alias("bucket_ts"),
        "n",
        qround(F.col("_sae") / n, digits).alias("mae"),
        qround(F.sqrt(F.col("_sse") / n), digits).alias("rmse"),
        qround(F.col("_se") / n, digits).alias("bias"),
    )


def streaming_srm_monitor(
    stream_df: DataFrame,
    arm_col: str,
    ts_col: str,
    expected: dict[str, float],
    alpha: float = 0.001,
    window: str = "1 day",
    watermark: str = "1 hour",
    digits: int = 6,
) -> DataFrame:
    """Windowed sample-ratio-mismatch alarm — the streaming deployment
    of ``operators/stats.py:srm_check``: every tumbling window carries
    one count per declared arm plus an off-dictionary count, and emits
    the χ² against the declared allocation with the driver-side
    Wilson-Hilferty critical value. SRM is precisely the failure you
    want DURING the experiment, not at readout — a broken assignment
    service shows up in the first window it breaks.

    State per open window: |arms| + 1 counts — nothing else. Rows
    whose arm is NULL or off-dictionary count into ``n_unexpected``
    (themselves an SRM signal) and stay out of the statistic. Windows
    emit (bucket_ts, n, n_unexpected, chi2, chi2_crit, srm_detected);
    an all-unexpected window has n=0 and NULL chi2/flag (fail closed).
    """
    from ..operators.stats import chi2_critical

    if not expected:
        raise ValueError("expected allocation must be non-empty")
    if any(v <= 0 for v in expected.values()):
        raise ValueError("expected shares must be positive")
    tot_w = float(sum(expected.values()))
    shares = {k: v / tot_w for k, v in expected.items()}
    arms = sorted(shares)
    dof = len(arms) - 1
    crit = chi2_critical(dof, alpha) if dof >= 1 else 0.0
    a = F.col(arm_col)
    base = stream_df.withWatermark(ts_col, watermark)
    agg = base.groupBy(F.window(F.col(ts_col), window).alias("_w")).agg(
        *[
            F.count(F.when(a == k, 1)).cast("bigint").alias(f"_c_{i}")
            for i, k in enumerate(arms)
        ],
        F.count(F.when(a.isNull() | ~a.isin(arms), 1))
        .cast("bigint")
        .alias("n_unexpected"),
    )
    n = None
    for i in range(len(arms)):
        c = F.col(f"_c_{i}").cast("double")
        n = c if n is None else n + c
    chi2 = None
    for i, k in enumerate(arms):
        o = F.col(f"_c_{i}").cast("double")
        e = n * F.lit(shares[k])
        term = (o - e) * (o - e) / e
        chi2 = term if chi2 is None else chi2 + term
    chi2 = F.when(n > 0, chi2)
    return agg.select(
        F.col("_w.start").alias("bucket_ts"),
        n.cast("bigint").alias("n"),
        "n_unexpected",
        qround(chi2, digits).alias("chi2"),
        qround(F.lit(crit), digits).alias("chi2_crit"),
        F.when(chi2.isNotNull(), chi2 > F.lit(crit)).cast("int")
        .alias("srm_detected"),
    )
