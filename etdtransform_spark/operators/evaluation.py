"""Model-evaluation statistics for labeled / scored data.

The companion stage to ``operators/classify.py``: once a pipeline scores
documents with a model (quality filter, topic router, toxicity gate), it
needs to know whether the scores can be TRUSTED — calibration against
observed labels — and, when labels come from multiple annotators or
LLM judges, whether the labels themselves agree. Both are standard
training-data-pipeline measurements (reliability diagrams / expected
calibration error; Cohen's kappa for inter-annotator agreement) and both
reduce to ONE hash aggregate at any scale: the shuffle carries bin or
contingency-cell counts, never rows.

No reference counterpart (the reference is an energy ETL); part of the
beyond-reference LLM-pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.scalars import qround


def calibration_bins(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_bins: int = 10,
    digits: int = 6,
) -> DataFrame:
    """Reliability-diagram bins: per equal-width score bin over [0, 1],
    the row count, mean predicted score, and observed positive rate.

    ``label_col`` is boolean or 0/1 numeric. Rows with a NULL score or
    label are excluded (they carry no calibration evidence). A score of
    exactly 1.0 lands in the top bin (least(floor(s*n), n-1) — the
    standard half-open binning with a closed top), and out-of-range
    scores are clamped to the edge bins (greatest(0, …)): the function
    accepts arbitrary score columns, so a raw logit or a mildly
    out-of-range calibrated score must not fabricate negative or
    off-spine bin ids. Returns one row per
    NON-EMPTY bin: (bin, n, avg_score, pos_rate) — a full spine would
    fabricate 0-evidence rows; callers that need one can left-join a
    sequence.

    One hash aggregate; at 100 TB the shuffle carries at most ``n_bins``
    partial rows per map task (map-side combine).
    """
    s = F.col(score_col).cast("double")
    y = F.col(label_col).cast("double")
    # NaN carries no calibration evidence either — and diverges from the
    # DuckDB oracle's binning (Spark floor(NaN)=0 vs DuckDB NaN-is-largest)
    binned = df.filter(
        s.isNotNull() & y.isNotNull() & ~F.isnan(s) & ~F.isnan(y)
    ).select(
        F.greatest(F.least(F.floor(s * n_bins), F.lit(n_bins - 1)), F.lit(0))
        .cast("bigint")
        .alias("bin"),
        s.alias("_s"),
        y.alias("_y"),
    )
    return binned.groupBy("bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        qround(F.avg("_s"), digits).alias("avg_score"),
        qround(F.avg("_y"), digits).alias("pos_rate"),
    )


def expected_calibration_error(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_bins: int = 10,
    digits: int = 6,
) -> DataFrame:
    """One-row ECE summary: sum over bins of (n_b / N) * |avg_score_b -
    pos_rate_b|, plus the maximum per-bin gap (MCE) and N.

    Empty input yields one row with n = 0 and NULL ece/mce — an unscored
    batch proves nothing (same fail-closed convention as the fractional
    expectation gates in ``operators/quality.py``).
    """
    bins = calibration_bins(df, score_col, label_col, n_bins, digits=None)
    gap = F.abs(F.col("avg_score") - F.col("pos_rate"))
    out = bins.agg(
        F.coalesce(F.sum("n"), F.lit(0)).cast("bigint").alias("n"),
        F.sum(F.col("n") * gap).alias("_wgap"),
        F.max(gap).alias("_maxgap"),
    )
    return out.select(
        "n",
        qround(
            F.when(F.col("n") > 0, F.col("_wgap") / F.col("n")), digits
        ).alias("ece"),
        qround(F.col("_maxgap"), digits).alias("mce"),
    )


def auc_roc(
    df: DataFrame,
    score_col: str,
    label_col: str,
    keys: list[str] | tuple[str, ...] = (),
    digits: int = 6,
    prefix_buckets: int = 32,
) -> DataFrame:
    """Area under the ROC curve, exactly, via the rank statistic:
    AUC = (R_pos − n_pos(n_pos+1)/2) / (n_pos · n_neg) with average ranks
    for tied scores (the standard tie-corrected estimator; equals the
    Mann-Whitney U normalization).

    Rides the SAME distinct-value cumulative substrate as
    ``stats.ks_2samp`` / ``stats.mann_whitney_u``
    (:func:`~..operators.stats._value_cumulatives`): per distinct score
    the positive/negative multiplicities aggregate once, avg pooled rank
    is derived from the cumulative — no per-row global ranking; keyless
    inputs use the range-partitioned prefix sum, never a single-partition
    window. Returns (keys..., n_pos, n_neg, auc); one-class segments
    yield NULL auc. Keyless calls are EAGER at build time (one
    boundary-collection job; upstream executes twice) and not
    streaming-safe — see the eagerness note on
    ``stats._value_cumulatives``.
    """
    from .stats import _value_cumulatives

    x = F.col(score_col).cast("double")
    y = F.col(label_col).cast("double")
    klist = list(keys)
    counts = (
        # NULL AND NaN excluded on both columns — the family convention
        # (a NaN score ranks greatest, a NaN label reads positive under
        # Spark NaN semantics; roc_curve/pr_curve on the same substrate
        # must agree with this scalar on identical data)
        df.filter(x.isNotNull() & y.isNotNull() & ~F.isnan(x) & ~F.isnan(y))
        .groupBy(*klist, x.alias("_v"))
        .agg(
            F.sum(F.when(y != 0, 1).otherwise(0)).alias("_ca"),
            F.sum(F.when(y == 0, 1).otherwise(0)).alias("_cb"),
        )
    )
    cum = _value_cumulatives(counts, klist, prefix_buckets)
    c = (F.col("_ca") + F.col("_cb")).cast("double")
    below = (F.col("_cum_a") + F.col("_cum_b")).cast("double") - c
    avg_rank = below + (c + 1.0) / 2.0
    agged = cum.select(
        *klist,
        F.col("_ca").cast("double").alias("_ca"),
        (F.col("_ca").cast("double") * avg_rank).alias("_ra"),
        F.col("_cb").cast("double").alias("_cb"),
    ).groupBy(*klist).agg(
        F.sum("_ca").alias("_np"),
        F.sum("_cb").alias("_nn"),
        F.sum("_ra").alias("_rsum"),
    )
    np_, nn = F.col("_np"), F.col("_nn")
    auc = F.when(
        (np_ > 0) & (nn > 0),
        (F.col("_rsum") - np_ * (np_ + 1.0) / 2.0) / (np_ * nn),
    )
    return agged.select(
        *klist,
        np_.cast("bigint").alias("n_pos"),
        nn.cast("bigint").alias("n_neg"),
        qround(auc, digits).alias("auc"),
    )


def binary_classification_report(
    df: DataFrame,
    score_col: str,
    label_col: str,
    threshold: float = 0.5,
    digits: int = 6,
) -> DataFrame:
    """One-row confusion summary at a decision threshold: tp/fp/tn/fn
    counts plus precision, recall, f1, accuracy (NULL, not 0, when a
    denominator is empty — no predicted positives means precision is
    undefined, not perfect or zero).

    Rows with NULL or NaN score/label are excluded (a NaN label would
    count as a positive under Spark NaN semantics — the
    :func:`fairness_audit` convention). ONE aggregate pass.
    """
    s = F.col(score_col).cast("double")
    y = F.col(label_col).cast("double")
    pred = s >= F.lit(float(threshold))
    pos = y != 0
    base = df.filter(
        s.isNotNull() & y.isNotNull() & ~F.isnan(s) & ~F.isnan(y)
    )
    agg = base.agg(
        F.count(F.when(pred & pos, 1)).cast("bigint").alias("tp"),
        F.count(F.when(pred & ~pos, 1)).cast("bigint").alias("fp"),
        F.count(F.when(~pred & ~pos, 1)).cast("bigint").alias("tn"),
        F.count(F.when(~pred & pos, 1)).cast("bigint").alias("fn"),
    )
    tp, fp, tn, fn = (F.col(c).cast("double") for c in ("tp", "fp", "tn", "fn"))
    n = tp + fp + tn + fn
    precision = F.when(tp + fp > 0, tp / (tp + fp))
    recall = F.when(tp + fn > 0, tp / (tp + fn))
    f1 = F.when(
        (tp + fp > 0) & (tp + fn > 0) & (tp > 0),
        2.0 * (tp / (tp + fp)) * (tp / (tp + fn))
        / (tp / (tp + fp) + tp / (tp + fn)),
    ).otherwise(
        F.when((tp + fp > 0) & (tp + fn > 0), F.lit(0.0))
    )
    accuracy = F.when(n > 0, (tp + tn) / n)
    return agg.select(
        "tp", "fp", "tn", "fn",
        qround(precision, digits).alias("precision"),
        qround(recall, digits).alias("recall"),
        qround(f1, digits).alias("f1"),
        qround(accuracy, digits).alias("accuracy"),
    )


def krippendorff_alpha(
    df: DataFrame,
    item_col: str,
    label_col: str,
    digits: int = 6,
) -> DataFrame:
    """One-row Krippendorff's alpha (nominal) over (item, label) ratings.

    The multi-annotator generalization of :func:`cohens_kappa` — rater
    identity is irrelevant for nominal data and MISSING ratings are
    handled natively: items with fewer than 2 ratings carry no
    (dis)agreement information and are dropped from both the observed
    disagreement and the margins (the standard treatment).

        D_o = (1/n) * sum_u (m_u^2 - sum_c n_uc^2) / (m_u - 1)
        D_e = (n^2 - sum_c n_c^2) / (n * (n - 1))
        alpha = 1 - D_o / D_e

    with m_u = ratings on item u, n_uc = count of category c on item u,
    n_c = total count of category c, n = total ratings (over the kept
    items). Returns (n_items, n_ratings, d_o, d_e, alpha); alpha is NULL
    when D_e = 0 (every rating is the same category — no chance baseline)
    or no item has 2+ ratings.

    Plan shape: ONE finest-grain (item, label) count aggregate; the
    per-item and per-category rollups both derive from it (item- and
    category-domain-sized), joined as two 1-row frames at the end.
    """
    base = df.filter(
        F.col(item_col).isNotNull() & F.col(label_col).isNotNull()
    )
    fine = base.groupBy(
        F.col(item_col).alias("_u"), F.col(label_col).alias("_c")
    ).agg(F.count(F.lit(1)).cast("double").alias("_nuc"))
    per_item = (
        fine.groupBy("_u")
        .agg(
            F.sum("_nuc").alias("_m"),
            F.sum(F.col("_nuc") * F.col("_nuc")).alias("_sq"),
        )
        .filter(F.col("_m") >= 2)
    )
    obs = per_item.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_items"),
        F.sum("_m").alias("_n"),
        F.sum(
            (F.col("_m") * F.col("_m") - F.col("_sq")) / (F.col("_m") - 1.0)
        ).alias("_do_num"),
    )
    # margins over the SAME kept items (an item dropped from D_o must not
    # inflate D_e either)
    margins = (
        fine.join(per_item.select("_u"), "_u", "left_semi")
        .groupBy("_c")
        .agg(F.sum("_nuc").alias("_nc"))
        .agg(F.sum(F.col("_nc") * F.col("_nc")).alias("_sum_nc_sq"))
    )
    out = obs.crossJoin(F.broadcast(margins))  # two 1-row frames
    n = F.col("_n")
    d_o = F.when(n > 0, F.col("_do_num") / n)
    d_e = F.when(
        n > 1, (n * n - F.col("_sum_nc_sq")) / (n * (n - 1.0))
    )
    alpha = F.when(d_e > 0, F.lit(1.0) - d_o / d_e)
    return out.select(
        "n_items",
        F.coalesce(n, F.lit(0.0)).cast("bigint").alias("n_ratings"),
        qround(d_o, digits).alias("d_o"),
        qround(d_e, digits).alias("d_e"),
        qround(alpha, digits).alias("alpha"),
    )


def confusion_counts(
    df: DataFrame, a_col: str, b_col: str
) -> DataFrame:
    """Contingency table between two label columns: (a, b, n).

    NULL labels are kept as their own row/column (an annotator abstaining
    IS information); callers wanting complete-case analysis filter first.
    """
    return df.groupBy(
        F.col(a_col).alias("a"), F.col(b_col).alias("b")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))


def cohens_kappa(
    df: DataFrame,
    a_col: str,
    b_col: str,
    digits: int = 6,
) -> DataFrame:
    """One-row Cohen's kappa between two annotators/models.

    kappa = (p_o - p_e) / (1 - p_e) with p_o the observed agreement rate
    and p_e the chance agreement (sum over classes of the annotators'
    marginal proportions multiplied). Rows where EITHER label is NULL are
    excluded (complete-case, the standard kappa convention). Returns
    (n, po, pe, kappa); kappa is NULL when p_e == 1 (both annotators
    constant — agreement is undefined, not perfect) or n == 0.

    Plan shape: one finest-grain (a, b) count aggregate; marginals and
    the chance term derive from that dictionary-sized table, so the only
    data-sized pass is the contingency build (map-side combined).
    """
    cells = confusion_counts(
        df.filter(F.col(a_col).isNotNull() & F.col(b_col).isNotNull()),
        a_col,
        b_col,
    )
    # marginals per class from the cell table (class-domain-sized)
    a_marg = cells.groupBy(F.col("a").alias("cls")).agg(
        F.sum("n").alias("_na")
    )
    b_marg = cells.groupBy(F.col("b").alias("cls")).agg(
        F.sum("n").alias("_nb")
    )
    totals = cells.agg(
        F.sum("n").alias("_n"),
        F.sum(F.when(F.col("a") == F.col("b"), F.col("n"))).alias("_agree"),
    )
    chance = (
        a_marg.join(b_marg, "cls", "inner")
        .agg(F.sum(F.col("_na").cast("double") * F.col("_nb")).alias("_pe_num"))
    )
    out = totals.crossJoin(F.broadcast(chance))  # two 1-row frames
    n = F.coalesce(F.col("_n"), F.lit(0)).cast("bigint")
    # zero agreeing rows -> sum(when(...)) is NULL, but p_o is genuinely 0
    po = F.coalesce(F.col("_agree"), F.lit(0)).cast("double") / F.col("_n")
    pe = F.col("_pe_num") / (F.col("_n").cast("double") * F.col("_n"))
    kappa = F.when(pe < 1.0, (po - pe) / (F.lit(1.0) - pe))
    return out.select(
        n.alias("n"),
        qround(F.when(n > 0, po), digits).alias("po"),
        qround(F.when(n > 0, pe), digits).alias("pe"),
        qround(F.when(n > 0, kappa), digits).alias("kappa"),
    )


def classification_report_multi(
    df: DataFrame,
    pred_col: str,
    label_col: str,
    digits: int = 6,
) -> DataFrame:
    """Per-class precision/recall/F1 long table for multiclass
    single-label predictions — the multiclass sibling of
    :func:`binary_classification_report`.

    One row per class in the UNION of predicted and true label domains:
    (class, support, predicted, tp, precision, recall, f1).
    Rows where either label is NULL are excluded (complete-case).
    Undefined ratios are NULL, not 0: a never-predicted class has no
    precision and a zero-support class has no recall; F1 is 0.0 when both
    ratios are defined but tp = 0, NULL when either is undefined.

    Plan shape: the only data-sized pass is the ``confusion_counts``
    contingency build (map-side combined); the per-class rollups are two
    aggregates over the cell table and one class-domain-sized full outer
    join. At 100 TB the shuffle carries |pred classes| x |true classes|
    cell partials per map task, never rows.
    """
    cells = confusion_counts(
        df.filter(F.col(pred_col).isNotNull() & F.col(label_col).isNotNull()),
        pred_col,
        label_col,
    )
    pred_m = cells.groupBy(F.col("a").alias("cls")).agg(
        F.sum("n").alias("_pred"),
        F.coalesce(
            F.sum(F.when(F.col("a") == F.col("b"), F.col("n"))), F.lit(0)
        ).alias("_tp"),
    )
    true_m = cells.groupBy(F.col("b").alias("cls")).agg(
        F.sum("n").alias("_sup")
    )
    per = pred_m.join(true_m, "cls", "full_outer")
    tp = F.coalesce(F.col("_tp"), F.lit(0)).cast("double")
    pred_n = F.coalesce(F.col("_pred"), F.lit(0)).cast("double")
    sup = F.coalesce(F.col("_sup"), F.lit(0)).cast("double")
    precision = F.when(pred_n > 0, tp / pred_n)
    recall = F.when(sup > 0, tp / sup)
    f1 = F.when(
        (pred_n > 0) & (sup > 0) & (tp > 0),
        2.0 * (tp / pred_n) * (tp / sup) / (tp / pred_n + tp / sup),
    ).otherwise(F.when((pred_n > 0) & (sup > 0), F.lit(0.0)))
    return per.select(
        F.col("cls").alias("class"),
        sup.cast("bigint").alias("support"),
        pred_n.cast("bigint").alias("predicted"),
        tp.cast("bigint").alias("tp"),
        qround(precision, digits).alias("precision"),
        qround(recall, digits).alias("recall"),
        qround(f1, digits).alias("f1"),
    )


def classification_summary_multi(
    df: DataFrame,
    pred_col: str,
    label_col: str,
    digits: int = 6,
) -> DataFrame:
    """One-row macro/micro/weighted averages over the per-class table of
    :func:`classification_report_multi`.

    - micro: pooled counts — for single-label multiclass, micro
      precision = recall = F1 = accuracy (= sum tp / n), reported as
      ``accuracy``/``micro_f1``.
    - macro: unweighted mean over ALL classes in the union domain, with
      undefined per-class ratios ZERO-FILLED first (the sklearn
      ``zero_division=0`` convention) — a never-predicted class drags
      the macro down rather than silently dropping out of the mean.
    - weighted: support-weighted mean of the zero-filled ratios
      (zero-support classes contribute nothing by construction).

    Empty input yields n = 0 with NULL metrics (fail closed). Same plan
    shape as the per-class table: one data-sized contingency aggregate,
    then class-domain-sized arithmetic.
    """
    per = classification_report_multi(df, pred_col, label_col, digits=None)
    p0 = F.coalesce(F.col("precision"), F.lit(0.0))
    r0 = F.coalesce(F.col("recall"), F.lit(0.0))
    f0 = F.coalesce(F.col("f1"), F.lit(0.0))
    agg = per.agg(
        F.coalesce(F.sum("support"), F.lit(0)).cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("n_classes"),
        F.sum("tp").alias("_tp"),
        F.avg(p0).alias("_map"),
        F.avg(r0).alias("_mar"),
        F.avg(f0).alias("_maf"),
        F.sum(p0 * F.col("support")).alias("_wp"),
        F.sum(r0 * F.col("support")).alias("_wr"),
        F.sum(f0 * F.col("support")).alias("_wf"),
    )
    n = F.col("n").cast("double")
    acc = F.when(n > 0, F.col("_tp").cast("double") / n)
    return agg.select(
        "n",
        "n_classes",
        qround(acc, digits).alias("accuracy"),
        qround(acc, digits).alias("micro_f1"),
        qround(F.when(n > 0, F.col("_map")), digits).alias("macro_precision"),
        qround(F.when(n > 0, F.col("_mar")), digits).alias("macro_recall"),
        qround(F.when(n > 0, F.col("_maf")), digits).alias("macro_f1"),
        qround(F.when(n > 0, F.col("_wp") / n), digits).alias(
            "weighted_precision"
        ),
        qround(F.when(n > 0, F.col("_wr") / n), digits).alias(
            "weighted_recall"
        ),
        qround(F.when(n > 0, F.col("_wf") / n), digits).alias("weighted_f1"),
    )


def annotator_bias(
    df: DataFrame,
    annotator_col: str,
    item_col: str,
    label_col: str,
    digits: int = 6,
) -> DataFrame:
    """Per-annotator leniency/severity audit against a leave-one-out
    consensus: for each rating, the consensus is the mean of the OTHER
    annotators' labels on the same item; an annotator's bias is their
    mean label minus their mean consensus, with a binomial z
    (z = Σ(y − p) / sqrt(Σ p(1−p)), p = the rating's LOO consensus) —
    the per-annotator drill-down that :func:`cohens_kappa` /
    :func:`krippendorff_alpha` aggregate away.

    ``label_col`` is boolean or 0/1 numeric (the binomial variance model
    assumes it). Complete-case on all three columns; ratings on items
    with fewer than 2 ratings have no one to disagree with and are
    excluded (same treatment as krippendorff_alpha's single-rating
    items). Returns one row per annotator:
    (annotator, n, pos_rate, consensus_rate, bias, z); z is NULL when
    the variance is 0 (every consensus unanimous) or n = 0.

    Plan shape: one (item) rollup aggregate + one item-keyed join of the
    ratings against it — two data-sized passes over the ratings table,
    both map-side-combinable/shuffled by item, then an annotator-domain
    aggregate. No per-annotator loops, no crossJoin of raters.
    """
    a = F.col(annotator_col)
    u = F.col(item_col)
    y = F.col(label_col).cast("double")
    # NaN labels excluded like NULLs (one NaN would propagate through
    # every consensus mean it touches — the family convention)
    base = df.filter(
        a.isNotNull() & u.isNotNull() & y.isNotNull() & ~F.isnan(y)
    ).select(a.alias("_an"), u.alias("_it"), y.alias("_y"))
    item_stats = base.groupBy("_it").agg(
        F.sum("_y").alias("_sy"), F.count(F.lit(1)).alias("_cy")
    )
    rated = base.join(item_stats, "_it").filter(F.col("_cy") >= 2)
    p = (F.col("_sy") - F.col("_y")) / (F.col("_cy") - F.lit(1)).cast(
        "double"
    )
    per = rated.groupBy(F.col("_an").alias("annotator")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.avg("_y").alias("_own"),
        F.avg(p).alias("_cons"),
        F.sum(F.col("_y") - p).alias("_bsum"),
        F.sum(p * (F.lit(1.0) - p)).alias("_v"),
    )
    return per.select(
        "annotator",
        "n",
        qround(F.col("_own"), digits).alias("pos_rate"),
        qround(F.col("_cons"), digits).alias("consensus_rate"),
        qround(F.col("_own") - F.col("_cons"), digits).alias("bias"),
        qround(
            F.when(F.col("_v") > 0, F.col("_bsum") / F.sqrt(F.col("_v"))),
            digits,
        ).alias("z"),
    )


def fairness_audit(
    df: DataFrame,
    score_col: str,
    label_col: str,
    group_col: str,
    threshold: float = 0.5,
    digits: int = 6,
) -> DataFrame:
    """Per-group classifier-behavior audit at a decision threshold — the
    standard pre-deployment fairness table (demographic parity reads off
    ``pred_pos_rate``, equalized odds off ``tpr``/``fpr``): one row per
    group value with

        (group, n, base_rate, pred_pos_rate, tpr, fpr, precision)

    Rows with NULL score, label, or group are excluded (an unattributed
    row audits nothing); undefined ratios are NULL, never 0 — a group
    with no positives has no TPR, the same convention as
    :func:`binary_classification_report`. NaN scores AND NaN labels are
    excluded like NULLs (same rationale as :func:`calibration_bins`;
    under Spark NaN semantics a NaN label would otherwise satisfy
    ``label != 0`` and silently count as a positive).

    ONE hash aggregate: the shuffle carries four counts per group
    (map-side combined); every rate derives from the group-domain table.
    """
    s = F.col(score_col).cast("double")
    y = F.col(label_col).cast("double")
    pred = s >= F.lit(float(threshold))
    pos = y != 0
    base = df.filter(
        s.isNotNull()
        & y.isNotNull()
        & ~F.isnan(s)
        & ~F.isnan(y)
        & F.col(group_col).isNotNull()
    )
    g = base.groupBy(F.col(group_col).alias("group")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.count(F.when(pos, 1)).cast("bigint").alias("_npos"),
        F.count(F.when(pred, 1)).cast("bigint").alias("_npred"),
        F.count(F.when(pred & pos, 1)).cast("bigint").alias("_tp"),
        F.count(F.when(pred & ~pos, 1)).cast("bigint").alias("_fp"),
    )
    n = F.col("n").cast("double")
    npos = F.col("_npos").cast("double")
    nneg = n - npos
    return g.select(
        "group",
        "n",
        qround(npos / n, digits).alias("base_rate"),
        qround(F.col("_npred").cast("double") / n, digits).alias(
            "pred_pos_rate"
        ),
        qround(
            F.when(npos > 0, F.col("_tp").cast("double") / npos), digits
        ).alias("tpr"),
        qround(
            F.when(nneg > 0, F.col("_fp").cast("double") / nneg), digits
        ).alias("fpr"),
        qround(
            F.when(
                F.col("_npred") > 0,
                F.col("_tp").cast("double") / F.col("_npred").cast("double"),
            ),
            digits,
        ).alias("precision"),
    )


def fairness_gaps(
    df: DataFrame,
    score_col: str,
    label_col: str,
    group_col: str,
    threshold: float = 0.5,
    digits: int = 6,
) -> DataFrame:
    """One-row max-gap summary over :func:`fairness_audit`:
    (n_groups, demographic_parity_gap, equal_opportunity_gap, fpr_gap)
    where each gap is max−min of the per-group rate over groups where
    the rate is DEFINED (a group with no positives cannot witness a TPR
    gap). NULL gap when fewer than 2 groups define the rate. Group-
    domain-sized arithmetic on top of the audit's single data pass.
    """
    per = fairness_audit(
        df, score_col, label_col, group_col, threshold, digits=None
    )
    def gap(c):
        return F.when(
            F.count(F.col(c)) >= 2, F.max(F.col(c)) - F.min(F.col(c))
        )
    out = per.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        gap("pred_pos_rate").alias("_dp"),
        gap("tpr").alias("_eo"),
        gap("fpr").alias("_fg"),
    )
    return out.select(
        "n_groups",
        qround(F.col("_dp"), digits).alias("demographic_parity_gap"),
        qround(F.col("_eo"), digits).alias("equal_opportunity_gap"),
        qround(F.col("_fg"), digits).alias("fpr_gap"),
    )


def label_noise_estimate(
    df: DataFrame,
    score_col: str,
    label_col: str,
    digits: int = 6,
) -> DataFrame:
    """Confident-learning-style label-noise estimate for binary labels
    (Northcutt et al. 2021, "Confident Learning", simplified to one
    score column): the per-class confidence threshold is the MEAN model
    score among rows carrying that label (t_pos = avg score | label=1;
    t_neg likewise), and a row is a suspected mislabel when the model is
    confidently on the other side of its own class mean —

        suspected_fn: label = 0 AND score >= t_pos   (missed positive)
        suspected_fp: label = 1 AND score <= t_neg   (spurious positive)

    Returns ONE row: (n, n_pos, n_neg, t_pos, t_neg, suspected_fn,
    suspected_fp, noise_rate) with noise_rate = (fn+fp)/n. A one-class
    input has no opposing threshold, so the corresponding suspicion
    count is NULL (not 0 — absence of a threshold is not evidence of
    cleanliness) and noise_rate is NULL. NULL/NaN scores and NULL/NaN
    labels are excluded (a NaN label would otherwise read as a positive
    under Spark NaN comparison semantics).

    Plan shape: TWO data-sized aggregates over the same filtered scan —
    the class-mean pass and the counting pass joined through a broadcast
    1-row threshold frame (lazy; no driver collect). At 100 TB both
    shuffles carry a handful of partials per map task.
    """
    s = F.col(score_col).cast("double")
    y = F.col(label_col).cast("double")
    base = df.filter(
        s.isNotNull() & y.isNotNull() & ~F.isnan(s) & ~F.isnan(y)
    ).select(s.alias("_s"), (y != 0).alias("_pos"))
    thr = base.agg(
        F.avg(F.when(F.col("_pos"), F.col("_s"))).alias("_tp"),
        F.avg(F.when(~F.col("_pos"), F.col("_s"))).alias("_tn"),
    )
    joined = base.crossJoin(F.broadcast(thr))  # 1-row threshold frame
    agg = joined.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.count(F.when(F.col("_pos"), 1)).cast("bigint").alias("n_pos"),
        F.count(F.when(~F.col("_pos"), 1)).cast("bigint").alias("n_neg"),
        F.max("_tp").alias("_t_pos"),
        F.max("_tn").alias("_t_neg"),
        F.count(
            F.when(~F.col("_pos") & (F.col("_s") >= F.col("_tp")), 1)
        ).alias("_fn"),
        F.count(
            F.when(F.col("_pos") & (F.col("_s") <= F.col("_tn")), 1)
        ).alias("_fp"),
    )
    fn = F.when(F.col("_t_pos").isNotNull(), F.col("_fn").cast("bigint"))
    fp = F.when(F.col("_t_neg").isNotNull(), F.col("_fp").cast("bigint"))
    rate = F.when(
        (F.col("n") > 0)
        & F.col("_t_pos").isNotNull()
        & F.col("_t_neg").isNotNull(),
        (F.col("_fn") + F.col("_fp")).cast("double") / F.col("n").cast("double"),
    )
    return agg.select(
        "n",
        "n_pos",
        "n_neg",
        qround(F.col("_t_pos"), digits).alias("t_pos"),
        qround(F.col("_t_neg"), digits).alias("t_neg"),
        fn.alias("suspected_fn"),
        fp.alias("suspected_fp"),
        qround(rate, digits).alias("noise_rate"),
    )


def top_label_calibration(
    df: DataFrame,
    probs_col: str,
    label_col: str,
    n_bins: int = 10,
    digits: int = 6,
) -> DataFrame:
    """Multiclass top-label reliability bins (Guo et al. 2017's
    confidence-calibration measurement): per equal-width bin of the
    TOP predicted probability, the row count, mean confidence, and
    accuracy of the argmax prediction — the multiclass sibling of
    :func:`calibration_bins` (whose binary score IS its top-label
    confidence up to relabeling).

    ``probs_col`` is an array<numeric> over class indexes 0..k−1;
    ``label_col`` the true class index. pred = first argmax (lowest
    index wins ties — ``array_position`` of the max, identical to the
    oracle's ``list_position``). Rows with NULL label, NULL/empty probs,
    or a NULL/NaN max confidence are excluded; out-of-range confidences
    clamp to the edge bins like :func:`calibration_bins`. Returns one
    row per non-empty bin: (bin, n, avg_conf, accuracy) — a perfectly
    calibrated model reads avg_conf ≈ accuracy per bin.

    ONE hash aggregate; the shuffle carries ≤ ``n_bins`` partials per
    map task.
    """
    probs = F.transform(F.col(probs_col), lambda x: x.cast("double"))
    y = F.col(label_col).cast("bigint")
    base = df.select(
        probs.alias("_p"), y.alias("_y")
    ).filter(
        F.col("_y").isNotNull()
        & F.col("_p").isNotNull()
        & (F.size("_p") > 0)
    ).select(
        F.array_max(F.col("_p")).alias("_c"),
        (F.array_position(F.col("_p"), F.array_max(F.col("_p"))) - 1)
        .cast("bigint")
        .alias("_pred"),
        "_y",
    ).filter(F.col("_c").isNotNull() & ~F.isnan(F.col("_c")))
    binned = base.select(
        F.greatest(
            F.least(F.floor(F.col("_c") * n_bins), F.lit(n_bins - 1)),
            F.lit(0),
        )
        .cast("bigint")
        .alias("bin"),
        "_c",
        (F.col("_pred") == F.col("_y")).cast("double").alias("_hit"),
    )
    return binned.groupBy("bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        qround(F.avg("_c"), digits).alias("avg_conf"),
        qround(F.avg("_hit"), digits).alias("accuracy"),
    )


def roc_curve(
    df: DataFrame,
    score_col: str,
    label_col: str,
    keys: list[str] | tuple[str, ...] = (),
    digits: int = 6,
    prefix_buckets: int = 32,
    max_points: int | None = None,
) -> DataFrame:
    """The full ROC curve as a table — one row per DISTINCT score value,
    read as the decision threshold ``pred = score >= threshold``:
    (keys..., threshold, tp, fp, tpr, fpr). :func:`auc_roc` gives the
    scalar; this is what an eval pipeline actually plots, and the
    threshold-picker's input (choose the operating point, then freeze it
    into :func:`binary_classification_report` / :func:`fairness_audit`).

    Same substrate as the scalar: distinct-value cumulative counts
    (``stats._value_cumulatives``) — tp at threshold v is the suffix
    count of positives (n_pos − cum_pos(v) + count_at(v)), so the whole
    curve costs ONE distinct-value aggregate plus the keyed window /
    keyless range-partitioned prefix sum; the output is
    distinct-score-sized, never row-sized. NULL/NaN scores and labels
    are excluded (a NaN score cannot be thresholded; a NaN label would
    count as positive under Spark NaN semantics); one-class segments
    give NULL tpr or fpr, never 0/0 = 0. Keyless calls are EAGER at
    build time — see the eagerness note on ``stats._value_cumulatives``.

    ``max_points``: scale lever for PLOTTING — a 100 TB score column
    has billions of distinct thresholds, a chart needs ~1000 points.
    Keeps a row iff its cumulative-count range crosses a rank-grid
    boundary (floor(below·m/n) ≠ floor(cum·m/n)) plus the first row per
    segment, so ≤ max_points+1 rows per segment survive, BOTH curve
    endpoints are always kept, every kept point is an EXACT curve point
    (no interpolation), and the horizontal gap between kept points is
    ≤ n/m rows. Pure projection on columns already computed — zero
    extra shuffle, deterministic.
    """
    cum, klist = _curve_cumulatives(
        df, score_col, label_col, keys, prefix_buckets
    )
    cum = _thin_curve(cum, max_points)
    tp = (F.col("_na") - F.col("_cum_a") + F.col("_ca")).cast("bigint")
    fp = (F.col("_nb") - F.col("_cum_b") + F.col("_cb")).cast("bigint")
    return cum.select(
        *klist,
        F.col("_v").alias("threshold"),
        tp.alias("tp"),
        fp.alias("fp"),
        qround(
            F.when(
                F.col("_na") > 0,
                tp.cast("double") / F.col("_na").cast("double"),
            ),
            digits,
        ).alias("tpr"),
        qround(
            F.when(
                F.col("_nb") > 0,
                fp.cast("double") / F.col("_nb").cast("double"),
            ),
            digits,
        ).alias("fpr"),
    )


def pr_curve(
    df: DataFrame,
    score_col: str,
    label_col: str,
    keys: list[str] | tuple[str, ...] = (),
    digits: int = 6,
    prefix_buckets: int = 32,
    max_points: int | None = None,
) -> DataFrame:
    """Precision-recall curve as a table — one row per distinct score
    threshold: (keys..., threshold, tp, fp, precision, recall). The PR
    sibling of :func:`roc_curve` on the identical cumulative substrate
    (same cost, same exclusions, same keyless-eagerness caveat, same
    ``max_points`` rank-grid thinning for plotting at scale).
    Precision is always defined on an attained threshold (tp + fp ≥ 1 —
    at least the rows AT the threshold score are predicted positive);
    recall is NULL when the segment has no positives."""
    cum, klist = _curve_cumulatives(
        df, score_col, label_col, keys, prefix_buckets
    )
    cum = _thin_curve(cum, max_points)
    tp = (F.col("_na") - F.col("_cum_a") + F.col("_ca")).cast("bigint")
    fp = (F.col("_nb") - F.col("_cum_b") + F.col("_cb")).cast("bigint")
    return cum.select(
        *klist,
        F.col("_v").alias("threshold"),
        tp.alias("tp"),
        fp.alias("fp"),
        qround(
            tp.cast("double") / (tp + fp).cast("double"), digits
        ).alias("precision"),
        qround(
            F.when(
                F.col("_na") > 0,
                tp.cast("double") / F.col("_na").cast("double"),
            ),
            digits,
        ).alias("recall"),
    )


def _thin_curve(cum: DataFrame, max_points: int | None) -> DataFrame:
    """Rank-grid curve thinning on the cumulative table: keep a row iff
    its cumulative range [below, cum] crosses a boundary of the
    ``max_points``-cell rank grid, or it is the segment's first row
    (below = 0 — the all-predicted-positive corner, which a sparse head
    would otherwise drop). Projection-only; the kept rows are exact
    curve points."""
    if max_points is None:
        return cum
    m = int(max_points)
    below = F.col("_cum_a") + F.col("_cum_b") - (F.col("_ca") + F.col("_cb"))
    # grid-cell test in PURE BIGINT arithmetic (SQL `div`): all inputs are
    # non-negative cumulative counts, so truncating div == floor, and the
    # double-rounding hazard of floor(bigint*m / bigint) — which loses low
    # bits past 2^53/m cumulative rows and could misdetect boundary
    # crossings — cannot occur; in ANSI mode an (astronomical) bigint
    # overflow of cum*m would throw rather than silently corrupt
    lhs = F.expr(
        f"((_cum_a + _cum_b) - (_ca + _cb)) * CAST({m} AS BIGINT)"
        f" div (_na + _nb)"
    )
    rhs = F.expr(f"(_cum_a + _cum_b) * CAST({m} AS BIGINT) div (_na + _nb)")
    return cum.filter((below == 0) | (lhs != rhs))


def _curve_cumulatives(
    df: DataFrame,
    score_col: str,
    label_col: str,
    keys,
    prefix_buckets: int,
):
    """Shared distinct-score cumulative table for the curve operators:
    per (keys..., score) the positive/negative multiplicities with
    inclusive cumulatives and segment totals, NULL/NaN excluded on both
    columns."""
    from .stats import _value_cumulatives

    x = F.col(score_col).cast("double")
    y = F.col(label_col).cast("double")
    klist = list(keys)
    counts = (
        df.filter(
            x.isNotNull() & y.isNotNull() & ~F.isnan(x) & ~F.isnan(y)
        )
        .groupBy(*klist, x.alias("_v"))
        .agg(
            F.sum(F.when(y != 0, 1).otherwise(0)).alias("_ca"),
            F.sum(F.when(y == 0, 1).otherwise(0)).alias("_cb"),
        )
    )
    return _value_cumulatives(counts, klist, prefix_buckets), klist


def fairness_auc(
    df: DataFrame,
    score_col: str,
    label_col: str,
    group_col: str,
    digits: int = 6,
) -> DataFrame:
    """Threshold-FREE fairness: per-group AUC — does the model rank a
    random positive above a random negative equally well in every
    cohort? Complements :func:`fairness_audit`, whose rates are all
    pinned to one decision threshold (a model can pass the thresholded
    audit and still rank one group's positives systematically worse —
    or vice versa). Returns (group, n_pos, n_neg, auc), one row per
    non-NULL group; a one-class group has NULL auc (no ranking evidence,
    the :func:`auc_roc` convention).

    Exactly :func:`auc_roc` keyed by the group — the keyed (windowed)
    cumulative path, so no extra machinery and no keyless eagerness:
    group segments partition the distinct-score table. NULL/NaN scores
    and labels are excluded, matching :func:`fairness_audit`.
    """
    x = F.col(score_col).cast("double")
    y = F.col(label_col).cast("double")
    base = df.filter(
        x.isNotNull()
        & y.isNotNull()
        & ~F.isnan(x)
        & ~F.isnan(y)
        & F.col(group_col).isNotNull()
    ).select(F.col(group_col).alias("group"), x.alias("_s"), y.alias("_y"))
    return auc_roc(base, "_s", "_y", keys=["group"], digits=digits)


def fairness_auc_gap(
    df: DataFrame,
    score_col: str,
    label_col: str,
    group_col: str,
    digits: int = 6,
) -> DataFrame:
    """One-row max−min summary over :func:`fairness_auc`:
    (n_groups, n_defined, auc_gap) where the gap spans groups whose AUC
    is DEFINED (both classes present) and is NULL below 2 defining
    groups — the same conventions as :func:`fairness_gaps`, making the
    pair the thresholded + threshold-free fairness gate. Group-domain
    arithmetic on top of the audit's windowed pass."""
    per = fairness_auc(df, score_col, label_col, group_col, digits=None)
    out = per.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.count(F.col("auc")).cast("bigint").alias("n_defined"),
        F.when(
            F.count(F.col("auc")) >= 2, F.max("auc") - F.min("auc")
        ).alias("_gap"),
    )
    return out.select(
        "n_groups",
        "n_defined",
        qround(F.col("_gap"), digits).alias("auc_gap"),
    )


def regression_report(
    df: DataFrame,
    pred_col: str,
    target_col: str,
    digits: int = 6,
    keys: list[str] | tuple[str, ...] = (),
) -> DataFrame:
    """One-row regression-quality summary for continuous predictions —
    the reward-model / scalar-judge QA sibling of
    :func:`binary_classification_report`:

        (keys..., n, mae, rmse, r2, mean_pred, mean_target)

    r2 uses the computational identity 1 − Σe² / (Σy² − (Σy)²/n) and is
    NULL when the target is constant (zero variance ranks nothing —
    undefined, not 0 or 1) or n = 0; mae/rmse are NULL only on empty
    input. NULL/NaN rows on either column are excluded (same convention
    as the classification family). With ``keys`` the report is grouped
    (per-cohort reward-model QA — the regression face of
    :func:`fairness_audit`); a NULL key row is excluded like the
    fairness family (an unattributed row audits nothing).

    ONE hash aggregate: the shuffle carries six partials per map task
    (n, Σ|e|, Σe², Σy, Σy², Σŷ) — nothing row-sized survives the map
    side at any scale; keyed output is group-domain-sized.
    """
    p = F.col(pred_col).cast("double")
    y = F.col(target_col).cast("double")
    e = p - y
    klist = list(keys)
    cond = p.isNotNull() & y.isNotNull() & ~F.isnan(p) & ~F.isnan(y)
    for k in klist:
        cond = cond & F.col(k).isNotNull()
    base = df.filter(cond)
    agg = base.groupBy(*klist).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.abs(e)).alias("_sae"),
        F.sum(e * e).alias("_sse"),
        F.sum(y).alias("_sy"),
        F.sum(y * y).alias("_syy"),
        F.sum(p).alias("_sp"),
    )
    n = F.col("n").cast("double")
    ss_tot = F.col("_syy") - F.col("_sy") * F.col("_sy") / n
    return agg.select(
        *klist,
        "n",
        qround(F.when(F.col("n") > 0, F.col("_sae") / n), digits).alias(
            "mae"
        ),
        qround(
            F.when(F.col("n") > 0, F.sqrt(F.col("_sse") / n)), digits
        ).alias("rmse"),
        qround(
            F.when(
                (F.col("n") > 0) & (ss_tot > 0),
                F.lit(1.0) - F.col("_sse") / ss_tot,
            ),
            digits,
        ).alias("r2"),
        qround(F.when(F.col("n") > 0, F.col("_sp") / n), digits).alias(
            "mean_pred"
        ),
        qround(F.when(F.col("n") > 0, F.col("_sy") / n), digits).alias(
            "mean_target"
        ),
    )


def regression_calibration_deciles(
    df: DataFrame,
    pred_col: str,
    target_col: str,
    n_bins: int = 10,
    digits: int = 6,
    exact: bool = True,
) -> DataFrame:
    """Calibration-by-decile for continuous predictions: rank-bin the
    predictions into ``n_bins`` quantile bins (exact ``F.percentile``
    boundaries — prediction deciles, NOT fixed-width score bins, since a
    regression target has no [0,1] spine) and report, per non-empty bin,

        (bin, n, avg_pred, avg_target, bias)      bias = avg_pred − avg_target

    — a monotone-increasing avg_target with small per-bin bias is what a
    calibrated reward model looks like; a flat avg_target says the
    scores don't rank. NULL/NaN rows excluded on both columns.

    Plan shape: one aggregate computes the ≤ n_bins−1 boundary scalars
    into a 1-ROW frame that rides a broadcast crossJoin into the binning
    projection (the :func:`label_noise_estimate` pattern — lazy, no
    driver collect); bin = count of boundaries strictly below the
    prediction, so ties at a boundary land deterministically in the
    lower bin on any engine. Then ONE data-sized hash aggregate over
    ≤ n_bins groups. Exact percentile is a distributed sort-based
    aggregate — at 100 TB pass ``exact=False`` for Greenwald-Khanna
    approximate boundaries (deterministic, no sort) when the prediction
    column has unbounded cardinality; the bin SEMANTICS tolerate any
    order-preserving boundary choice, only bin balance shifts.
    """
    if n_bins < 1:
        raise ValueError(f"n_bins must be >= 1, got {n_bins}")
    p = F.col(pred_col).cast("double")
    y = F.col(target_col).cast("double")
    base = df.filter(
        p.isNotNull() & y.isNotNull() & ~F.isnan(p) & ~F.isnan(y)
    ).select(p.alias("_p"), y.alias("_y"))
    if n_bins == 1:
        # no boundaries to compute: F.array() would be an empty NullType
        # array whose size(filter(...)) is NULL, not 0 — short-circuit to
        # the single bin directly (one hash aggregate, no crossJoin)
        return base.groupBy(
            F.lit(0).cast("bigint").alias("bin")
        ).agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            qround(F.avg("_p"), digits).alias("avg_pred"),
            qround(F.avg("_y"), digits).alias("avg_target"),
            qround(F.avg("_p") - F.avg("_y"), digits).alias("bias"),
        )
    qs = F.array(*[F.lit(i / n_bins) for i in range(1, n_bins)])
    # exact=False is the 100 TB path named in the docstring: approximate
    # boundaries (Greenwald-Khanna, deterministic) replace the exact
    # distributed sort-aggregate; the bin semantics tolerate any
    # order-preserving boundary choice, only bin balance shifts
    bd_expr = (
        F.percentile("_p", qs)
        if exact
        else F.percentile_approx("_p", qs, F.lit(10000))
    )
    bounds = base.agg(bd_expr.alias("_bd"))
    binned = base.crossJoin(F.broadcast(bounds)).select(
        F.size(
            F.filter(F.col("_bd"), lambda b: F.col("_p") > b)
        ).cast("bigint").alias("bin"),
        "_p",
        "_y",
    )
    return binned.groupBy("bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        qround(F.avg("_p"), digits).alias("avg_pred"),
        qround(F.avg("_y"), digits).alias("avg_target"),
        qround(F.avg("_p") - F.avg("_y"), digits).alias("bias"),
    )


def best_threshold(
    df: DataFrame,
    score_col: str,
    label_col: str,
    digits: int = 6,
    prefix_buckets: int = 32,
) -> DataFrame:
    """Operating-point picker: the attained score threshold maximizing
    F1, from the same distinct-score cumulative substrate as
    :func:`roc_curve` — the step between plotting the curve and freezing
    a threshold into :func:`binary_classification_report` /
    :func:`fairness_audit`. Returns ONE row
    (threshold, tp, fp, precision, recall, f1), or ZERO rows when no
    threshold is scoreable (empty input or no positive labels — with no
    positives every F1 is 0/undefined and no choice is better than any
    other). Ties on F1 break to the LOWEST threshold (the most
    permissive operating point achieving the best F1), deterministically
    via max(struct(f1, −threshold)) — exact for float thresholds.

    F1 is computed as 2·tp / (tp + fp + n_pos) — algebraically
    2PR/(P+R), but defined whenever tp+fp ≥ 1 (always, at an attained
    threshold) without NULL-precision special cases. One distinct-value
    aggregate + the shared cumulative + ONE argmax aggregate; keyless
    and therefore EAGER at build (the ``_value_cumulatives`` note).
    """
    cum, _ = _curve_cumulatives(df, score_col, label_col, (), prefix_buckets)
    tp = (F.col("_na") - F.col("_cum_a") + F.col("_ca")).cast("bigint")
    fp = (F.col("_nb") - F.col("_cum_b") + F.col("_cb")).cast("bigint")
    f1 = (
        F.lit(2.0)
        * tp.cast("double")
        / (tp + fp + F.col("_na")).cast("double")
    )
    cand = cum.filter(F.col("_na") > 0).select(
        F.struct(
            f1.alias("f1"),
            (-F.col("_v")).alias("_negthr"),
            F.col("_v").alias("threshold"),
            tp.alias("tp"),
            fp.alias("fp"),
            F.col("_na").cast("bigint").alias("_np"),
        ).alias("_s")
    )
    best = cand.agg(F.max("_s").alias("_b")).filter(F.col("_b").isNotNull())
    tpd = F.col("_b.tp").cast("double")
    fpd = F.col("_b.fp").cast("double")
    npd = F.col("_b._np").cast("double")
    return best.select(
        F.col("_b.threshold").alias("threshold"),
        F.col("_b.tp").alias("tp"),
        F.col("_b.fp").alias("fp"),
        qround(tpd / (tpd + fpd), digits).alias("precision"),
        qround(tpd / npd, digits).alias("recall"),
        qround(F.col("_b.f1"), digits).alias("f1"),
    )


def probability_scores_report(
    df: DataFrame,
    score_col: str,
    label_col: str,
    eps: float = 1e-15,
    digits: int = 6,
) -> DataFrame:
    """Proper-scoring-rule summary for probabilistic binary predictions:
    ONE row (n, log_loss, brier) — the two standard losses a calibrated
    probability column should minimize (ECE measures bin-level honesty;
    these penalize per-row sharpness AND calibration together, so a
    model can't win by hedging).

        log_loss = −mean(y·ln p̂ + (1−y)·ln(1−p̂)),  p̂ = clamp(p, eps, 1−eps)
        brier    = mean((p − y)²)                   (unclamped)

    The eps clamp is the standard guard for exact-0/1 predictions on the
    wrong side (infinite log loss would poison the mean; sklearn's
    convention). NULL/NaN rows excluded; empty input → n = 0 with NULL
    losses. ONE hash aggregate, three partials per map task.
    """
    p = F.col(score_col).cast("double")
    y = F.col(label_col).cast("double")
    base = df.filter(
        p.isNotNull() & y.isNotNull() & ~F.isnan(p) & ~F.isnan(y)
    ).select(p.alias("_p"), (y != 0).cast("double").alias("_y"))
    pc = F.least(
        F.greatest(F.col("_p"), F.lit(float(eps))), F.lit(1.0 - float(eps))
    )
    ll = -(
        F.col("_y") * F.log(pc)
        + (F.lit(1.0) - F.col("_y")) * F.log(F.lit(1.0) - pc)
    )
    sq = (F.col("_p") - F.col("_y")) * (F.col("_p") - F.col("_y"))
    agg = base.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(ll).alias("_sll"),
        F.sum(sq).alias("_ssq"),
    )
    n = F.col("n").cast("double")
    return agg.select(
        "n",
        qround(F.when(F.col("n") > 0, F.col("_sll") / n), digits).alias(
            "log_loss"
        ),
        qround(F.when(F.col("n") > 0, F.col("_ssq") / n), digits).alias(
            "brier"
        ),
    )


def mcnemar_test(
    df: DataFrame,
    score_a_col: str,
    score_b_col: str,
    label_col: str,
    threshold: float = 0.5,
    digits: int = 6,
) -> DataFrame:
    """McNemar's paired test for two classifiers scored on the SAME rows
    — the correct significance test when comparing model A vs model B on
    one eval set (unpaired tests ignore that both saw identical
    examples). Returns ONE row:

        (n, n_disagree, a_only_correct, b_only_correct, chi2)

    with the continuity-corrected statistic (|b−c|−1)²/(b+c) over the
    discordant counts; chi2 is NULL when the models never disagree
    (no evidence either way — undefined, not 0). Rows with NULL/NaN in
    either score or the label are excluded. ONE hash aggregate.
    """
    a = F.col(score_a_col).cast("double")
    b = F.col(score_b_col).cast("double")
    y = F.col(label_col).cast("double")
    base = df.filter(
        a.isNotNull() & b.isNotNull() & y.isNotNull()
        & ~F.isnan(a) & ~F.isnan(b) & ~F.isnan(y)
    )
    t = F.lit(float(threshold))
    pos = y != 0
    a_ok = (a >= t) == pos
    b_ok = (b >= t) == pos
    agg = base.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.count(F.when(a_ok & ~b_ok, 1)).cast("bigint").alias("_ao"),
        F.count(F.when(~a_ok & b_ok, 1)).cast("bigint").alias("_bo"),
    )
    ao, bo = F.col("_ao").cast("double"), F.col("_bo").cast("double")
    d = F.abs(ao - bo) - F.lit(1.0)
    chi2 = F.when(
        F.col("_ao") + F.col("_bo") > 0, d * d / (ao + bo)
    )
    return agg.select(
        "n",
        (F.col("_ao") + F.col("_bo")).cast("bigint").alias("n_disagree"),
        F.col("_ao").alias("a_only_correct"),
        F.col("_bo").alias("b_only_correct"),
        qround(chi2, digits).alias("chi2"),
    )


def average_precision(
    df: DataFrame,
    score_col: str,
    label_col: str,
    keys: list[str] | tuple[str, ...] = (),
    digits: int = 6,
    prefix_buckets: int = 32,
) -> DataFrame:
    """Average precision (area under the PR curve by the step rule —
    sklearn's estimator): AP = Σ_i (R_i − R_{i−1}) · P_i over descending
    distinct thresholds. The PR twin of :func:`auc_roc` — preferred when
    positives are rare (ROC-AUC saturates; AP stays sensitive to the
    head of the ranking, which is what a filtering pipeline acts on).

    Because ties are already merged per distinct score, ΔR at a
    threshold is simply count_at/n_pos, so AP needs NO ordering pass at
    all — it is ONE more rollup over the same cumulative table:
    AP = Σ ca · (tp/(tp+fp)) / n_pos. Returns (keys..., n_pos, n_neg,
    average_precision); NULL when a segment has no positives. Same
    exclusions and keyless-eagerness as the rest of the family.
    """
    cum, klist = _curve_cumulatives(
        df, score_col, label_col, keys, prefix_buckets
    )
    tp = (F.col("_na") - F.col("_cum_a") + F.col("_ca")).cast("double")
    fp = (F.col("_nb") - F.col("_cum_b") + F.col("_cb")).cast("double")
    term = F.col("_ca").cast("double") * (tp / (tp + fp))
    agged = cum.groupBy(*klist).agg(
        F.max("_na").cast("bigint").alias("n_pos"),
        F.max("_nb").cast("bigint").alias("n_neg"),
        F.sum(term).alias("_s"),
    )
    return agged.select(
        *klist,
        "n_pos",
        "n_neg",
        qround(
            F.when(
                F.col("n_pos") > 0,
                F.col("_s") / F.col("n_pos").cast("double"),
            ),
            digits,
        ).alias("average_precision"),
    )


def isotonic_calibration(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_bins: int = 32,
    digits: int = 6,
) -> DataFrame:
    """Isotonic (monotone) calibration of a score against observed
    labels — the non-parametric upgrade of :func:`calibration_bins`:
    instead of reporting per-bin positive rates that may zig-zag, fit
    the least-squares MONOTONE rate curve (classic model-calibration
    recipe; Zadrozny & Elkan 2002).

    Exactness without iteration: pool-adjacent-violators is computed by
    its closed minimax form, fitted(i) = max_{j≤i} min_{k≥i} A(j,k)
    where A(j,k) is the label mean over bins j..k (Robertson, Wright &
    Dykstra 1988, Thm 1.4.4) — pure prefix sums + two dictionary-sized
    windows, identical in both engines, no loop to converge. The fit is
    the exact weighted-PAV solution on the BINNED substrate (equal-width
    bins over [0,1], clamped edges, same binning as calibration_bins);
    binning is the documented 100 TB lever — the data-sized work is ONE
    hash aggregate to (bin, count, positives), everything after runs on
    ≤ n_bins rows (the j≤i≤k triple enumeration is ≤ n_bins³ ≪ data).

    Rows with NULL/NaN score or label are excluded (no calibration
    evidence). Returns one row per non-empty bin:
    (bin, n, avg_score, raw_rate, iso_rate) with iso_rate monotone
    non-decreasing in bin.
    """
    if n_bins < 1:
        raise ValueError(f"n_bins must be >= 1, got {n_bins}")
    s = F.col(score_col).cast("double")
    y = F.col(label_col).cast("double")
    binned = df.filter(
        s.isNotNull() & y.isNotNull() & ~F.isnan(s) & ~F.isnan(y)
    ).select(
        F.greatest(F.least(F.floor(s * n_bins), F.lit(n_bins - 1)), F.lit(0))
        .cast("bigint")
        .alias("bin"),
        s.alias("_s"),
        y.alias("_y"),
    )
    bins = binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("_s").alias("_avg_s"),
        F.sum("_y").alias("_pos"),
    )
    w_cum = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = bins.select(
        "bin",
        "n",
        "_avg_s",
        "_pos",
        F.sum("n").over(w_cum).alias("_cw"),
        F.sum("_pos").over(w_cum).alias("_cs"),
    )
    # A(j,k) over non-empty bins: (cs_k - cs_{j-1}) / (cw_k - cw_{j-1});
    # prefix "before j" values ride along on the j side of the pair join.
    j_side = cum.select(
        F.col("bin").alias("_j"),
        (F.col("_cs") - F.col("_pos")).alias("_cs_before"),
        (F.col("_cw") - F.col("n")).alias("_cw_before"),
    )
    k_side = cum.select(
        F.col("bin").alias("_k"),
        F.col("_cs").alias("_cs_k"),
        F.col("_cw").alias("_cw_k"),
    )
    pairs = j_side.join(k_side, F.col("_j") <= F.col("_k")).select(
        "_j",
        "_k",
        (
            (F.col("_cs_k") - F.col("_cs_before"))
            / (F.col("_cw_k") - F.col("_cw_before"))
        ).alias("_a"),
    )
    # For every (j, i): M(j,i) = min_{k ≥ i} A(j,k) — suffix min per j …
    w_suffix = (
        Window.partitionBy("_j")
        .orderBy(F.col("_k").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    m_ji = pairs.select(
        "_j",
        F.col("_k").alias("_i"),
        F.min("_a").over(w_suffix).alias("_m"),
    )
    # … then fitted(i) = max over j ≤ i (rows with j > i never existed).
    fitted = m_ji.groupBy("_i").agg(F.max("_m").alias("_iso"))
    return (
        bins.join(fitted, bins["bin"] == fitted["_i"])
        .select(
            "bin",
            "n",
            qround(F.col("_avg_s"), digits).alias("avg_score"),
            qround(F.col("_pos") / F.col("n"), digits).alias("raw_rate"),
            qround(F.col("_iso"), digits).alias("iso_rate"),
        )
    )


def split_conformal(
    df: DataFrame,
    pred_col: str,
    actual_col: str,
    id_col: str,
    alpha: float = 0.1,
    cal_frac: float = 0.5,
    seed: str = "conformal",
    digits: int = 6,
    fast: bool = False,
) -> DataFrame:
    """Split-conformal prediction interval for a regression model, with
    its empirical coverage on the held-out side — the
    distribution-free error bar a pipeline should attach to any score
    it thresholds (Vovk et al.; Lei et al. 2018 "split conformal").

    The evidence rows (non-NULL/NaN pred, actual, and id) are split by
    the portable hash of id into a calibration side (fraction
    ``cal_frac``) and an evaluation side — deterministic across engines,
    reruns, and retries. q̂ is the ⌈(n_cal+1)(1−α)⌉-th smallest absolute
    residual on the calibration side (the finite-sample-valid order
    statistic, NOT an interpolated percentile); coverage is the fraction
    of evaluation rows with |y−ŷ| ≤ q̂. Guaranteed ≥ 1−α in expectation
    under exchangeability.

    Shape: the split is a projection; q̂ comes from a rank over the
    calibration side — calibration sets are sample-sized by construction
    (that is the point of SPLIT conformal), so the single-partition rank
    window is over the calibration sample, never the corpus; at true
    100 TB calibration sizes swap in the two-pass TakeOrdered recipe
    (count → orderBy.limit(k).agg(max)) — same result, noted not built.
    Coverage is one broadcast of the 1-row q̂ frame + one aggregate.

    Returns ONE row: (n_cal, n_eval, qhat, coverage, target_coverage,
    avg_width). Empty calibration or rank overflow (k > n_cal, possible
    at tiny n_cal) yields NULL qhat and NULL coverage — fail closed.
    """
    if not 0.0 < alpha < 1.0:
        raise ValueError(f"alpha must be in (0, 1), got {alpha}")
    if not 0.0 < cal_frac < 1.0:
        raise ValueError(f"cal_frac must be in (0, 1), got {cal_frac}")
    from ..functions.hashing import hash_uniform

    yhat = F.col(pred_col).cast("double")
    y = F.col(actual_col).cast("double")
    u = hash_uniform(F.col(id_col).cast("string"), seed=seed, fast=fast)
    base = df.filter(
        yhat.isNotNull() & ~F.isnan(yhat)
        & y.isNotNull() & ~F.isnan(y)
        & F.col(id_col).isNotNull()
    ).select(
        qround(F.abs(y - yhat), digits).alias("_r"),
        (u < F.lit(cal_frac)).alias("_is_cal"),
        F.col(id_col).cast("string").alias("_id"),
    )
    cal = base.filter(F.col("_is_cal"))
    w_rank = Window.orderBy(F.col("_r").asc(), F.col("_id").asc())
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = cal.select(
        "_r",
        F.row_number().over(w_rank).alias("_rn"),
        F.count(F.lit(1)).over(w_all).alias("_n_cal"),
    )
    k = F.ceil((F.col("_n_cal") + 1) * F.lit(1.0 - alpha))
    qhat_row = ranked.agg(
        F.max("_n_cal").alias("n_cal"),
        F.min(F.when(F.col("_rn") >= k, F.col("_r"))).alias("qhat"),
    )
    ev = base.filter(~F.col("_is_cal"))
    cov = ev.crossJoin(F.broadcast(qhat_row)).agg(
        F.max("n_cal").alias("_nc"),
        F.max("qhat").alias("_q"),
        F.count(F.lit(1)).alias("n_eval"),
        qround(
            F.avg((F.col("_r") <= F.col("qhat")).cast("double")), digits
        ).alias("coverage"),
    )
    # empty eval side: the aggregate still returns one row, but the
    # broadcast qhat columns aggregated to NULL — recover them by a
    # second broadcast join so (n_cal, qhat) survive an empty eval set
    return cov.crossJoin(F.broadcast(qhat_row.select(
        F.col("n_cal").alias("_nc2"), F.col("qhat").alias("_q2"),
    ))).select(
        F.coalesce(F.col("_nc"), F.col("_nc2"), F.lit(0)).alias("n_cal"),
        "n_eval",
        F.coalesce(F.col("_q"), F.col("_q2")).alias("qhat"),
        F.when(F.col("n_eval") > 0, F.col("coverage")).alias("coverage"),
        F.lit(1.0 - alpha).alias("target_coverage"),
        qround(
            2.0 * F.coalesce(F.col("_q"), F.col("_q2")), digits
        ).alias("avg_width"),
    )


def ngram_overlap_scores(
    df: DataFrame,
    ref_col: str,
    cand_col: str,
    id_col: str,
    n: int = 2,
    digits: int = 6,
) -> DataFrame:
    """ROUGE-N-style n-gram overlap between a reference and a candidate
    text per row: clipped-count precision / recall / F1 over word
    n-gram MULTISETS (each candidate gram credits at most its count in
    the reference — the standard clipping that stops "the the the"
    gaming precision). The text-generation eval primitive (summaries,
    rewrites, distillation targets) the classification metrics here
    don't cover.

    Shape: per side, tokenize + positional n-gram explode + ONE
    (id, gram) count aggregate; overlap = equijoin of the two count
    tables on (id, gram) with min(count) — shuffles carry (id, gram,
    count), never text. Rows parallelize embarrassingly by id.

    Evidence rules: a row missing either text yields no row; a row
    where either side has zero n-grams (shorter than n tokens) yields
    NULL scores with the gram counts visible (undefined, not 0 — the
    caller decides whether an empty candidate scores 0).

    Returns (id, ref_grams, cand_grams, overlap, precision, recall, f1).
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")

    def gram_counts(col_name: str, tag: str) -> DataFrame:
        toks = F.filter(
            F.split(F.col(col_name), r"\s+"), lambda x: x != F.lit("")
        )
        # let-bind the token array (single-element transform) so the
        # split runs once per row, not once per gram — the
        # word_shingles discipline
        grams = F.explode(
            F.flatten(
                F.transform(
                    F.array(toks),
                    # guard: sequence(0, -1) DESCENDS ([0, -1]) and the
                    # -1 position would slice(start=0) — short texts get
                    # an empty gram list, never an error
                    lambda t: F.when(
                        F.size(t) >= n,
                        F.transform(
                            F.sequence(F.lit(0), F.size(t) - n),
                            lambda i: F.array_join(
                                F.slice(t, i + 1, n), " "
                            ),
                        ),
                    ).otherwise(F.array().cast("array<string>")),
                )
            )
        )
        return (
            df.filter(
                F.col(ref_col).isNotNull() & F.col(cand_col).isNotNull()
            )
            .select(F.col(id_col).alias("id"), grams.alias("_g"))
            .groupBy("id", "_g")
            .agg(F.count(F.lit(1)).alias(f"_c{tag}"))
        )

    ref = gram_counts(ref_col, "r")
    cand = gram_counts(cand_col, "c")
    both = ref.join(cand, ["id", "_g"], "full").select(
        "id",
        F.coalesce(F.col("_cr"), F.lit(0)).alias("_cr"),
        F.coalesce(F.col("_cc"), F.lit(0)).alias("_cc"),
    )
    per_id = both.groupBy("id").agg(
        F.sum("_cr").alias("ref_grams"),
        F.sum("_cc").alias("cand_grams"),
        F.sum(F.least(F.col("_cr"), F.col("_cc"))).alias("overlap"),
    )
    # rows whose BOTH sides had zero grams never reached the count
    # tables — restore them from the evidence-filtered input so the
    # caller sees (0, 0, NULL…) rather than silence
    ids = df.filter(
        F.col(ref_col).isNotNull() & F.col(cand_col).isNotNull()
    ).select(F.col(id_col).alias("id")).distinct()
    filled = ids.join(per_id, ["id"], "left").select(
        "id",
        F.coalesce(F.col("ref_grams"), F.lit(0)).alias("ref_grams"),
        F.coalesce(F.col("cand_grams"), F.lit(0)).alias("cand_grams"),
        F.coalesce(F.col("overlap"), F.lit(0)).alias("overlap"),
    )
    p = F.when(
        F.col("cand_grams") > 0,
        F.col("overlap").cast("double") / F.col("cand_grams").cast("double"),
    )
    r = F.when(
        F.col("ref_grams") > 0,
        F.col("overlap").cast("double") / F.col("ref_grams").cast("double"),
    )
    return filled.select(
        "id",
        "ref_grams",
        "cand_grams",
        "overlap",
        qround(p, digits).alias("precision"),
        qround(r, digits).alias("recall"),
        qround(
            F.when(
                p.isNotNull() & r.isNotNull() & ((p + r) > 0),
                2.0 * p * r / (p + r),
            ).when(p.isNotNull() & r.isNotNull(), F.lit(0.0)),
            digits,
        ).alias("f1"),
    )


def fleiss_kappa(
    df: DataFrame,
    item_col: str,
    label_col: str,
    n_raters: int,
    digits: int = 6,
) -> DataFrame:
    """One-row Fleiss' kappa — multi-rater chance-corrected agreement on
    categorical labels, the companion of :func:`cohens_kappa` (two fixed
    raters) and :func:`krippendorff_alpha` when the rater panel rotates
    but every item receives exactly ``n_raters`` judgments (the fixed-k
    labeling queue a preference/QA pipeline runs):

        P_i  = (Σ_c n_ic² − k) / (k(k−1))      per-item agreement
        P̄    = mean_i P_i
        P_e  = Σ_c p_c²,  p_c = Σ_i n_ic / (N·k)
        κ    = (P̄ − P_e) / (1 − P_e)

    Items observed with a judgment count ≠ ``n_raters`` are EXCLUDED and
    counted in ``n_items_dropped`` (classic Fleiss is undefined for
    ragged panels — use krippendorff_alpha for those). NULL labels and
    NULL items are excluded before counting. κ is NULL when P_e = 1
    (every judgment the same label — chance correction is undefined) or
    no item qualifies. ``n_raters`` must be ≥ 2.

    Plan shape: ONE (item, label) count aggregate is the only data-sized
    pass (map-side combined); per-item and per-class rollups run on the
    cell table. Returns
    (n_items, n_items_dropped, n_raters, p_bar, p_e, kappa).
    """
    if n_raters < 2:
        raise ValueError(f"n_raters must be >= 2, got {n_raters}")
    k = float(n_raters)
    cells = (
        df.filter(F.col(item_col).isNotNull() & F.col(label_col).isNotNull())
        .groupBy(F.col(item_col).alias("_i"), F.col(label_col).alias("_c"))
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    per_item = cells.groupBy("_i").agg(
        F.sum("_n").alias("_ki"),
        F.sum(F.col("_n") * F.col("_n")).alias("_sq"),
    )
    ok_item = F.col("_ki") == n_raters
    # kept/dropped counts and P̄ in ONE conditional aggregate over the
    # item table (no second scan, no extra crossJoin)
    item_stats = per_item.agg(
        F.count(F.when(ok_item, 1)).cast("bigint").alias("n_items"),
        F.count(F.when(~ok_item, 1))
        .cast("bigint")
        .alias("n_items_dropped"),
        F.avg(
            F.when(
                ok_item, (F.col("_sq").cast("double") - k) / (k * (k - 1.0))
            )
        ).alias("_pbar"),
    )
    # class marginals over KEPT items only (the panel the test is about)
    class_tot = (
        cells.join(per_item.filter(ok_item).select("_i"), "_i")
        .groupBy("_c")
        .agg(F.sum("_n").alias("_nc"))
    )
    pe_row = class_tot.crossJoin(
        F.broadcast(item_stats.select("n_items"))
    ).agg(
        F.sum(
            (
                F.col("_nc").cast("double")
                / (F.col("n_items").cast("double") * k)
            )
            ** 2
        ).alias("_pe")
    )
    out = item_stats.crossJoin(F.broadcast(pe_row))
    ok = F.col("n_items") > 0
    kappa = F.when(
        ok & (F.col("_pe") < 1.0),
        (F.col("_pbar") - F.col("_pe")) / (F.lit(1.0) - F.col("_pe")),
    )
    return out.select(
        "n_items",
        F.coalesce(F.col("n_items_dropped"), F.lit(0))
        .cast("bigint")
        .alias("n_items_dropped"),
        F.lit(n_raters).cast("bigint").alias("n_raters"),
        qround(F.when(ok, F.col("_pbar")), digits).alias("p_bar"),
        qround(F.when(ok, F.col("_pe")), digits).alias("p_e"),
        qround(kappa, digits).alias("kappa"),
    )
