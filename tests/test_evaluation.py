"""Unit tests for operators/evaluation.py: calibration bins / ECE / MCE
against hand-computed values, boundary binning, Cohen's kappa vs the
textbook formula (and a sklearn-style worked example), NULL handling,
degenerate inputs, and the one-aggregate plan claim."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from etdtransform_spark.operators.evaluation import (
    calibration_bins,
    cohens_kappa,
    confusion_counts,
    expected_calibration_error,
)


def test_calibration_bins_hand_computed(spark):
    rows = [
        (0.05, 0), (0.08, 1),          # bin 0: avg .065, rate .5
        (0.95, 1), (1.00, 1),          # bin 9 (1.0 closes into top bin)
        (0.55, 0),                     # bin 5
        (None, 1), (0.5, None),        # excluded
    ]
    df = spark.createDataFrame(rows, "score double, label int")
    out = {r.bin: r for r in calibration_bins(df, "score", "label").collect()}
    assert set(out) == {0, 5, 9}
    assert out[0].n == 2 and out[0].avg_score == pytest.approx(0.065)
    assert out[0].pos_rate == pytest.approx(0.5)
    assert out[9].n == 2 and out[9].pos_rate == 1.0
    assert out[5].n == 1 and out[5].pos_rate == 0.0


def test_calibration_bins_out_of_range_clamped(spark):
    # arbitrary score columns (raw logits, slightly out-of-range calibrated
    # scores) clamp to the edge bins instead of fabricating bin ids
    rows = [(-0.3, 0), (-2.0, 1), (1.7, 1), (0.5, 1)]
    df = spark.createDataFrame(rows, "score double, label int")
    out = {r.bin: r for r in calibration_bins(df, "score", "label").collect()}
    assert set(out) == {0, 5, 9}
    assert out[0].n == 2 and out[0].pos_rate == pytest.approx(0.5)
    assert out[9].n == 1 and out[9].avg_score == pytest.approx(1.7)


def test_ece_mce_hand_computed(spark):
    # bin 0: 2 rows, gap |.065-.5|=.435 ; bin 9: 2 rows gap |.975-1|=.025
    rows = [(0.05, 0), (0.08, 1), (0.95, 1), (1.00, 1)]
    df = spark.createDataFrame(rows, "score double, label int")
    r = expected_calibration_error(df, "score", "label").collect()[0]
    assert r.n == 4
    assert r.ece == pytest.approx((2 * 0.435 + 2 * 0.025) / 4, abs=1e-9)
    assert r.mce == pytest.approx(0.435, abs=1e-9)


def test_ece_empty_fails_closed(spark):
    df = spark.createDataFrame([], "score double, label int")
    r = expected_calibration_error(df, "score", "label").collect()[0]
    assert r.n == 0 and r.ece is None and r.mce is None


def test_perfectly_calibrated_ece_zero(spark):
    # in each bin, avg score == positive rate exactly
    rows = [(0.25, 1), (0.25, 0), (0.25, 0), (0.25, 0),
            (0.75, 1), (0.75, 1), (0.75, 1), (0.75, 0)]
    df = spark.createDataFrame(rows, "score double, label int")
    r = expected_calibration_error(df, "score", "label", n_bins=2).collect()[0]
    assert r.ece == 0.0 and r.mce == 0.0


def test_kappa_textbook_example(spark):
    """Classic 2x2 worked example: raters agree on 20 yes + 15 no of 50;
    A says yes 25, B says yes 30. po=.7, pe=(25*30+25*20)/2500=.5,
    kappa=.4."""
    rows = (
        [("y", "y")] * 20 + [("n", "n")] * 15
        + [("y", "n")] * 5 + [("n", "y")] * 10
    )
    df = spark.createDataFrame(rows, "a string, b string")
    r = cohens_kappa(df, "a", "b").collect()[0]
    assert r.n == 50
    assert r.po == pytest.approx(0.7)
    assert r.pe == pytest.approx(0.5)
    assert r.kappa == pytest.approx(0.4)


def test_kappa_null_labels_excluded_and_constant_undefined(spark):
    df = spark.createDataFrame(
        [("y", "y"), ("y", None), (None, "y"), ("y", "y")],
        "a string, b string",
    )
    r = cohens_kappa(df, "a", "b").collect()[0]
    # complete cases: 2 rows, both constant 'y' -> pe=1 -> kappa undefined
    assert r.n == 2 and r.po == 1.0 and r.pe == 1.0 and r.kappa is None


def test_kappa_empty(spark):
    df = spark.createDataFrame([], "a string, b string")
    r = cohens_kappa(df, "a", "b").collect()[0]
    assert r.n == 0 and r.po is None and r.pe is None and r.kappa is None


def test_kappa_zero_agreement(spark):
    df = spark.createDataFrame(
        [("y", "n")] * 3 + [("n", "y")] * 3, "a string, b string"
    )
    r = cohens_kappa(df, "a", "b").collect()[0]
    assert r.po == 0.0
    assert r.pe == pytest.approx(0.5)
    assert r.kappa == pytest.approx(-1.0)


def test_confusion_counts_keeps_nulls(spark):
    df = spark.createDataFrame(
        [("y", "y"), ("y", None), ("y", None)], "a string, b string"
    )
    out = {(r.a, r.b): r.n for r in confusion_counts(df, "a", "b").collect()}
    assert out == {("y", "y"): 1, ("y", None): 2}


def _py_auc(pairs):
    """Tie-corrected AUC via average ranks (independent reimplementation)."""
    scores = sorted({s for s, _ in pairs})
    rank = {}
    i = 1
    for s in scores:
        c = sum(1 for x, _ in pairs if x == s)
        rank[s] = i + (c - 1) / 2.0
        i += c
    pos = [s for s, y in pairs if y]
    neg = [s for s, y in pairs if not y]
    if not pos or not neg:
        return None
    r = sum(rank[s] for s in pos)
    return (r - len(pos) * (len(pos) + 1) / 2.0) / (len(pos) * len(neg))


def test_auc_matches_reimplementation_with_ties(spark):
    pairs = [(0.9, 1), (0.8, 1), (0.8, 0), (0.7, 0), (0.5, 1),
             (0.5, 0), (0.5, 0), (0.2, 0), (0.9, 1), (0.1, 0)]
    from etdtransform_spark.operators.evaluation import auc_roc

    # NaN score/label rows are excluded (family convention — a NaN
    # label would otherwise count as a positive, a NaN score would
    # rank above every real score)
    rows = [(s, float(y)) for s, y in pairs] + [
        (float("nan"), 1.0), (0.95, float("nan")),
    ]
    df = spark.createDataFrame(rows, "score double, label double")
    r = auc_roc(df, "score", "label").collect()[0]
    assert (r.n_pos, r.n_neg) == (4, 6)
    assert r.auc == pytest.approx(_py_auc(pairs), abs=1e-6)  # qround(6)


def test_auc_perfect_and_degenerate(spark):
    from etdtransform_spark.operators.evaluation import auc_roc

    perfect = spark.createDataFrame(
        [(0.9, 1), (0.8, 1), (0.2, 0), (0.1, 0)], "score double, label int"
    )
    assert auc_roc(perfect, "score", "label").collect()[0].auc == 1.0
    one_class = spark.createDataFrame([(0.9, 1), (0.1, 1)], "score double, label int")
    r = auc_roc(one_class, "score", "label").collect()[0]
    assert r.auc is None and r.n_neg == 0
    keyed = spark.createDataFrame(
        [("a", 0.9, 1), ("a", 0.1, 0), ("b", 0.1, 1), ("b", 0.9, 0)],
        "g string, score double, label int",
    )
    from etdtransform_spark.operators.evaluation import auc_roc as A

    out = {r.g: r.auc for r in A(keyed, "score", "label", keys=["g"]).collect()}
    assert out == {"a": 1.0, "b": 0.0}


def test_classification_report_hand_computed(spark):
    from etdtransform_spark.operators.evaluation import (
        binary_classification_report,
    )

    rows = [(0.9, 1.0), (0.8, 0.0), (0.4, 1.0), (0.1, 0.0), (0.7, 1.0),
            (None, 1.0), (float("nan"), 0.0), (0.95, float("nan"))]
    df = spark.createDataFrame(rows, "score double, label double")
    r = binary_classification_report(df, "score", "label", threshold=0.5).collect()[0]
    assert (r.tp, r.fp, r.tn, r.fn) == (2, 1, 1, 1)
    assert r.precision == pytest.approx(2 / 3)
    assert r.recall == pytest.approx(2 / 3)
    assert r.f1 == pytest.approx(2 / 3)
    assert r.accuracy == pytest.approx(0.6)  # (tp+tn)/5 complete cases


def test_classification_report_undefined_ratios_null(spark):
    from etdtransform_spark.operators.evaluation import (
        binary_classification_report,
    )

    # nothing predicted positive -> precision undefined (NULL), recall 0,
    # f1 undefined too (its precision term is undefined)
    df = spark.createDataFrame([(0.1, 1), (0.2, 0)], "score double, label int")
    r = binary_classification_report(df, "score", "label", threshold=0.5).collect()[0]
    assert r.precision is None
    assert r.recall == 0.0 and r.f1 is None


def _py_kripp(ratings):
    """Independent nominal-alpha reimplementation (textbook formulas)."""
    from collections import Counter, defaultdict

    per = defaultdict(list)
    for u, c in ratings:
        per[u].append(c)
    per = {u: v for u, v in per.items() if len(v) >= 2}
    n = sum(len(v) for v in per.values())
    if n <= 1:
        return None
    d_o = sum(
        (len(v) ** 2 - sum(k * k for k in Counter(v).values())) / (len(v) - 1)
        for v in per.values()
    ) / n
    marg = Counter(c for v in per.values() for c in v)
    d_e = (n * n - sum(k * k for k in marg.values())) / (n * (n - 1))
    return None if d_e == 0 else 1 - d_o / d_e


def test_krippendorff_matches_reimplementation(spark):
    from etdtransform_spark.operators.evaluation import krippendorff_alpha

    rows = [(1, "a"), (1, "a"), (2, "a"), (2, "b"), (3, "b"), (3, "b"),
            (4, "a"), (4, "a"), (4, "b"), (5, "c"), (5, "c"),
            (6, "a"),            # single rating: dropped from D_o AND margins
            (7, None), (None, "a")]
    df = spark.createDataFrame(rows, "item int, label string")
    r = krippendorff_alpha(df, "item", "label").collect()[0]
    clean = [(u, c) for u, c in rows if u is not None and c is not None]
    assert (r.n_items, r.n_ratings) == (5, 11)
    assert r.alpha == pytest.approx(_py_kripp(clean), abs=1e-6)


def test_krippendorff_degenerate(spark):
    from etdtransform_spark.operators.evaluation import krippendorff_alpha

    # one category everywhere: no chance baseline -> alpha NULL, d_o/d_e 0
    df = spark.createDataFrame(
        [(1, "x"), (1, "x"), (2, "x"), (2, "x")], "item int, label string"
    )
    r = krippendorff_alpha(df, "item", "label").collect()[0]
    assert r.d_o == 0.0 and r.d_e == 0.0 and r.alpha is None
    # perfect multi-category agreement -> alpha 1
    df2 = spark.createDataFrame(
        [(1, "x"), (1, "x"), (2, "y"), (2, "y")], "item int, label string"
    )
    assert krippendorff_alpha(df2, "item", "label").collect()[0].alpha == 1.0
    # nothing rateable
    df3 = spark.createDataFrame([(1, "x")], "item int, label string")
    r3 = krippendorff_alpha(df3, "item", "label").collect()[0]
    assert r3.n_items == 0 and r3.alpha is None


def test_calibration_single_aggregate_plan(spark):
    df = spark.range(100).select(
        (F.col("id") / 100.0).alias("score"), (F.col("id") % 2).alias("label")
    )
    plan = (
        calibration_bins(df, "score", "label")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") == 1  # exactly the one bin aggregate


def test_classification_report_multi_hand_computed(spark):
    from etdtransform_spark.operators.evaluation import (
        classification_report_multi,
        classification_summary_multi,
    )

    # pred, true — class domain union {a, b, c, d}; d never predicted,
    # c never true
    rows = [
        ("a", "a"), ("a", "a"), ("a", "b"),       # pred a: tp 2 / 3
        ("b", "b"), ("b", "d"),                   # pred b: tp 1 / 2
        ("c", "a"),                               # pred c: tp 0 / 1
        (None, "a"), ("a", None),                 # excluded
    ]
    df = spark.createDataFrame(rows, "pred string, label string")
    per = {
        r["class"]: r
        for r in classification_report_multi(df, "pred", "label").collect()
    }
    assert set(per) == {"a", "b", "c", "d"}
    # class a: support 3 (a,a,b->a? no: true a rows = a,a, c->a = 3)
    assert per["a"].support == 3 and per["a"].predicted == 3
    assert per["a"].tp == 2
    assert per["a"].precision == pytest.approx(2 / 3)
    assert per["a"].recall == pytest.approx(2 / 3)
    assert per["a"].f1 == pytest.approx(2 / 3)
    # class b: support 2, predicted 2, tp 1
    assert per["b"].precision == pytest.approx(0.5)
    assert per["b"].recall == pytest.approx(0.5)
    # class c: predicted 1 tp 0, support 0 -> recall NULL, f1 NULL
    assert per["c"].precision == 0.0 and per["c"].recall is None
    assert per["c"].f1 is None
    # class d: support 1, never predicted -> precision NULL, recall 0
    assert per["d"].predicted == 0 and per["d"].precision is None
    assert per["d"].recall == 0.0 and per["d"].f1 is None

    s = classification_summary_multi(df, "pred", "label").collect()[0]
    assert s.n == 6 and s.n_classes == 4
    assert s.accuracy == pytest.approx(3 / 6)
    assert s.micro_f1 == s.accuracy
    # macro zero-fills: p = (2/3 + .5 + 0 + 0)/4, r = (2/3 + .5 + 0 + 0)/4
    assert s.macro_precision == pytest.approx((2 / 3 + 0.5) / 4, abs=1e-6)
    assert s.macro_recall == pytest.approx((2 / 3 + 0.5) / 4, abs=1e-6)
    assert s.macro_f1 == pytest.approx((2 / 3 + 0.5) / 4, abs=1e-6)
    # weighted by support (a:3, b:2, c:0, d:1)
    assert s.weighted_recall == pytest.approx(
        (3 * 2 / 3 + 2 * 0.5 + 0 + 1 * 0.0) / 6, abs=1e-6
    )


def test_classification_report_multi_empty_and_perfect(spark):
    from etdtransform_spark.operators.evaluation import (
        classification_report_multi,
        classification_summary_multi,
    )

    empty = spark.createDataFrame([], "pred string, label string")
    assert classification_report_multi(empty, "pred", "label").count() == 0
    s = classification_summary_multi(empty, "pred", "label").collect()[0]
    assert s.n == 0 and s.accuracy is None and s.macro_f1 is None

    perfect = spark.createDataFrame(
        [("x", "x"), ("y", "y"), ("y", "y")], "pred string, label string"
    )
    s = classification_summary_multi(perfect, "pred", "label").collect()[0]
    assert s.accuracy == 1.0 and s.macro_f1 == 1.0 and s.weighted_f1 == 1.0


def test_classification_report_multi_vs_sklearn_style(spark):
    """Pin against an independent pure-python reimplementation on a
    pseudo-random multiclass fixture (deterministic LCG)."""
    from collections import Counter

    from etdtransform_spark.operators.evaluation import (
        classification_report_multi,
    )

    state, rows = 1234567, []
    classes = ["c0", "c1", "c2", "c3"]
    for _ in range(500):
        state = (1103515245 * state + 12345) % (1 << 31)
        t = classes[state % 4]
        state = (1103515245 * state + 12345) % (1 << 31)
        p = classes[(state >> 3) % 4] if state % 5 else t
        rows.append((p, t))
    df = spark.createDataFrame(rows, "pred string, label string")
    got = {
        r["class"]: r
        for r in classification_report_multi(df, "pred", "label").collect()
    }
    pred_c = Counter(p for p, _ in rows)
    true_c = Counter(t for _, t in rows)
    tp_c = Counter(p for p, t in rows if p == t)
    for c in classes:
        assert got[c].support == true_c[c]
        assert got[c].predicted == pred_c[c]
        assert got[c].tp == tp_c[c]
        want_p = tp_c[c] / pred_c[c] if pred_c[c] else None
        want_r = tp_c[c] / true_c[c] if true_c[c] else None
        if want_p is None:
            assert got[c].precision is None
        else:
            assert got[c].precision == pytest.approx(want_p, abs=1e-6)
        if want_r is None:
            assert got[c].recall is None
        else:
            assert got[c].recall == pytest.approx(want_r, abs=1e-6)


def test_annotator_bias_planted_lenient(spark):
    from etdtransform_spark.operators.evaluation import annotator_bias

    # 3 mostly-honest annotators label item parity (a3 flips every 5th
    # item so the LOO consensus is not degenerate); annotator L says 1
    # always — the planted lenient rater
    rows = []
    for item in range(30):
        truth = item % 2
        rows.append(("a1", item, truth))
        rows.append(("a2", item, truth))
        rows.append(("a3", item, 1 - truth if item % 5 == 0 else truth))
        rows.append(("L", item, 1))
    df = spark.createDataFrame(rows, "an string, item int, y int")
    out = {r.annotator: r for r in annotator_bias(df, "an", "item", "y").collect()}
    assert out["L"].pos_rate == 1.0
    assert out["L"].bias > 0.4 and out["L"].z > 5
    for an in ("a1", "a2"):
        assert out[an].bias < 0 and out[an].z < 0


def test_annotator_bias_matches_reimplementation(spark):
    from etdtransform_spark.operators.evaluation import annotator_bias

    rows, state = [], 7
    for item in range(40):
        for an in range(4):
            state = (1103515245 * state + 12345) % (1 << 31)
            rows.append((f"a{an}", item, (state >> 5) % 2))
    df = spark.createDataFrame(rows, "an string, item int, y int")
    got = {r.annotator: r for r in annotator_bias(df, "an", "item", "y").collect()}
    # independent python twin
    import math
    from collections import defaultdict

    sy, cy = defaultdict(float), defaultdict(int)
    for an, it, y in rows:
        sy[it] += y
        cy[it] += 1
    acc = defaultdict(lambda: [0, 0.0, 0.0, 0.0, 0.0])  # n, own, cons, bsum, v
    for an, it, y in rows:
        if cy[it] < 2:
            continue
        p = (sy[it] - y) / (cy[it] - 1)
        a = acc[an]
        a[0] += 1
        a[1] += y
        a[2] += p
        a[3] += y - p
        a[4] += p * (1 - p)
    for an, (n, own, cons, bsum, v) in acc.items():
        assert got[an].n == n
        assert got[an].pos_rate == pytest.approx(own / n, abs=1e-6)
        assert got[an].consensus_rate == pytest.approx(cons / n, abs=1e-6)
        want_z = bsum / math.sqrt(v) if v > 0 else None
        if want_z is None:
            assert got[an].z is None
        else:
            assert got[an].z == pytest.approx(want_z, abs=1e-5)


def test_annotator_bias_single_rating_items_excluded(spark):
    from etdtransform_spark.operators.evaluation import annotator_bias

    # item 2 singly rated; NaN label excluded (would otherwise poison
    # every consensus mean its item touches)
    rows = [("a", 1, 1.0), ("b", 1, 0.0), ("a", 2, 1.0),
            ("c", 1, float("nan"))]
    df = spark.createDataFrame(rows, "an string, item int, y double")
    out = {r.annotator: r for r in annotator_bias(df, "an", "item", "y").collect()}
    assert set(out) == {"a", "b"}
    assert out["a"].n == 1 and out["b"].n == 1
    # a's only kept rating: y=1, consensus=0 -> bias 1, but v=0 -> z NULL
    assert out["a"].bias == pytest.approx(1.0) and out["a"].z is None

    empty = spark.createDataFrame([], "an string, item int, y int")
    assert annotator_bias(empty, "an", "item", "y").count() == 0


def test_fairness_audit_hand_computed(spark):
    from etdtransform_spark.operators.evaluation import (
        fairness_audit,
        fairness_gaps,
    )

    rows = [
        # group A: 2 pos, 2 neg; predicted pos: both pos + one neg
        ("A", 0.9, 1.0), ("A", 0.8, 1.0), ("A", 0.7, 0.0), ("A", 0.1, 0.0),
        # group B: 1 pos, 3 neg; predicted pos: none
        ("B", 0.2, 1.0), ("B", 0.1, 0.0), ("B", 0.3, 0.0), ("B", 0.4, 0.0),
        # excluded rows
        (None, 0.9, 1.0), ("A", None, 1.0), ("A", 0.5, None),
        ("A", float("nan"), 1.0),
        # NaN label: under Spark NaN semantics it would satisfy
        # label != 0 and silently count as a positive — excluded
        ("A", 0.9, float("nan")),
    ]
    df = spark.createDataFrame(rows, "g string, score double, label double")
    out = {r.group: r for r in fairness_audit(
        df, "score", "label", "g", threshold=0.5).collect()}
    assert out["A"].n == 4 and out["B"].n == 4
    assert out["A"].base_rate == pytest.approx(0.5)
    assert out["A"].pred_pos_rate == pytest.approx(0.75)
    assert out["A"].tpr == 1.0 and out["A"].fpr == pytest.approx(0.5)
    assert out["A"].precision == pytest.approx(2 / 3)
    assert out["B"].pred_pos_rate == 0.0 and out["B"].tpr == 0.0
    assert out["B"].fpr == 0.0 and out["B"].precision is None

    gaps = fairness_gaps(df, "score", "label", "g", threshold=0.5).collect()[0]
    assert gaps.n_groups == 2
    assert gaps.demographic_parity_gap == pytest.approx(0.75)
    assert gaps.equal_opportunity_gap == pytest.approx(1.0)
    assert gaps.fpr_gap == pytest.approx(0.5)


def test_fairness_audit_undefined_rates_and_empty(spark):
    from etdtransform_spark.operators.evaluation import (
        fairness_audit,
        fairness_gaps,
    )

    # group C all-negative -> tpr NULL; only ONE group defines tpr -> gap NULL
    rows = [("C", 0.9, 0), ("C", 0.1, 0), ("D", 0.9, 1), ("D", 0.1, 1)]
    df = spark.createDataFrame(rows, "g string, score double, label int")
    out = {r.group: r for r in fairness_audit(df, "score", "label", "g").collect()}
    assert out["C"].tpr is None and out["D"].fpr is None
    gaps = fairness_gaps(df, "score", "label", "g").collect()[0]
    assert gaps.equal_opportunity_gap is None and gaps.fpr_gap is None
    assert gaps.demographic_parity_gap == pytest.approx(0.0)

    empty = spark.createDataFrame([], "g string, score double, label int")
    assert fairness_audit(empty, "score", "label", "g").count() == 0
    g0 = fairness_gaps(empty, "score", "label", "g").collect()[0]
    assert g0.n_groups == 0 and g0.demographic_parity_gap is None


def test_label_noise_planted_flips(spark):
    from etdtransform_spark.operators.evaluation import label_noise_estimate

    rows = (
        [(0.9, 1.0)] * 8 + [(0.1, 0.0)] * 8  # clean, well-separated
        + [(0.9, 0.0)] * 2                   # positives mislabeled negative
        + [(0.1, 1.0)]                       # negative mislabeled positive
        + [(0.9, float("nan")), (float("nan"), 1.0)]  # NaN either side: out
    )
    df = spark.createDataFrame(rows, "score double, label double")
    r = label_noise_estimate(df, "score", "label").collect()[0]
    assert (r.n, r.n_pos, r.n_neg) == (19, 9, 10)
    # t_pos = (8*.9 + .1)/9, t_neg = (8*.1 + 2*.9)/10
    assert r.t_pos == pytest.approx(7.3 / 9, abs=1e-6)
    assert r.t_neg == pytest.approx(2.6 / 10, abs=1e-6)
    # the 2 flipped positives sit above t_pos; the flipped negative below t_neg
    assert r.suspected_fn == 2 and r.suspected_fp == 1
    assert r.noise_rate == pytest.approx(3 / 19, abs=1e-6)


def test_label_noise_one_class_and_empty(spark):
    from etdtransform_spark.operators.evaluation import label_noise_estimate

    one = spark.createDataFrame([(0.9, 1), (0.8, 1)], "score double, label int")
    r = label_noise_estimate(one, "score", "label").collect()[0]
    # no negative threshold -> fp suspicion undefined, not 0
    assert r.n_neg == 0 and r.t_neg is None
    assert r.suspected_fp is None and r.noise_rate is None
    assert r.suspected_fn == 0  # t_pos exists; no negatives to suspect

    empty = spark.createDataFrame([], "score double, label int")
    r = label_noise_estimate(empty, "score", "label").collect()[0]
    assert r.n == 0 and r.noise_rate is None and r.suspected_fn is None


def test_top_label_calibration_hand_computed(spark):
    from etdtransform_spark.operators.evaluation import top_label_calibration

    rows = [
        ([0.7, 0.2, 0.1], 0),   # conf .7 bin 7, correct
        ([0.7, 0.2, 0.1], 1),   # conf .7 bin 7, wrong
        ([0.1, 0.2, 0.7], 2),   # conf .7 bin 7, correct
        ([0.55, 0.45, 0.0], 1), # conf .55 bin 5, wrong
        ([0.5, 0.5, 0.0], 0),   # tie -> lowest index pred 0, bin 5, correct
        (None, 0), ([], 1), ([0.9, 0.1, 0.0], None),  # excluded
    ]
    df = spark.createDataFrame(rows, "probs array<double>, label int")
    out = {r.bin: r for r in top_label_calibration(df, "probs", "label").collect()}
    assert set(out) == {7, 5}
    assert out[7].n == 3 and out[7].accuracy == pytest.approx(2 / 3)
    assert out[7].avg_conf == pytest.approx(0.7)
    assert out[5].n == 2 and out[5].accuracy == pytest.approx(0.5)
    # perfectly confident & correct -> bin 9 via 1.0-closes-top clamp
    sure = spark.createDataFrame([([1.0, 0.0], 0)], "probs array<double>, label int")
    r = top_label_calibration(sure, "probs", "label").collect()[0]
    assert r.bin == 9 and r.accuracy == 1.0

    empty = spark.createDataFrame([], "probs array<double>, label int")
    assert top_label_calibration(empty, "probs", "label").count() == 0


def test_roc_pr_curve_hand_computed(spark):
    from etdtransform_spark.operators.evaluation import pr_curve, roc_curve

    rows = [
        (0.9, 1.0), (0.8, 0.0), (0.8, 1.0), (0.4, 1.0), (0.1, 0.0),
        # excluded: NULLs and NaNs on either side
        (None, 1.0), (0.5, None), (float("nan"), 0.0), (0.7, float("nan")),
    ]
    df = spark.createDataFrame(rows, "score double, label double")
    roc = {r.threshold: r for r in roc_curve(df, "score", "label").collect()}
    assert set(roc) == {0.9, 0.8, 0.4, 0.1}
    assert (roc[0.9].tp, roc[0.9].fp) == (1, 0)
    assert roc[0.9].tpr == pytest.approx(1 / 3) and roc[0.9].fpr == 0.0
    assert (roc[0.8].tp, roc[0.8].fp) == (2, 1)
    assert roc[0.8].tpr == pytest.approx(2 / 3)
    assert roc[0.8].fpr == pytest.approx(0.5)
    assert (roc[0.4].tp, roc[0.4].fp) == (3, 1)
    assert (roc[0.1].tp, roc[0.1].fp) == (3, 2)
    assert roc[0.1].tpr == 1.0 and roc[0.1].fpr == 1.0

    pr = {r.threshold: r for r in pr_curve(df, "score", "label").collect()}
    assert pr[0.9].precision == 1.0 and pr[0.9].recall == pytest.approx(1 / 3)
    assert pr[0.8].precision == pytest.approx(2 / 3)
    assert pr[0.4].precision == 0.75
    assert pr[0.1].precision == pytest.approx(0.6) and pr[0.1].recall == 1.0


def test_roc_curve_one_class_and_keyed_and_auc_consistency(spark):
    from etdtransform_spark.operators.evaluation import auc_roc, roc_curve

    # one-class: no negatives -> fpr NULL, tpr defined
    pos_only = spark.createDataFrame(
        [(0.9, 1.0), (0.2, 1.0)], "score double, label double"
    )
    for r in roc_curve(pos_only, "score", "label").collect():
        assert r.fpr is None and r.tpr is not None and r.fp == 0

    # keyed: segments independent; trapezoid over the keyed curve equals
    # the tie-corrected rank AUC per key
    rows = []
    state = 3
    for g in ("a", "b"):
        for i in range(40):
            state = (1103515245 * state + 12345) % (1 << 31)
            score = (state % 13) / 13.0
            label = 1.0 if (state >> 5) % 3 == 0 else 0.0
            rows.append((g, score, label))
    df = spark.createDataFrame(rows, "g string, score double, label double")
    curves = {}
    for r in roc_curve(df, "score", "label", keys=["g"], digits=None).collect():
        curves.setdefault(r.g, []).append((r.threshold, r.tpr, r.fpr))
    aucs = {r.g: r.auc for r in auc_roc(df, "score", "label", keys=["g"]).collect()}
    for g, pts in curves.items():
        pts.sort(reverse=True)  # descending threshold: (fpr, tpr) ascends
        path = [(0.0, 0.0)] + [(f, t) for _th, t, f in pts]  # (fpr, tpr)
        area = sum(
            (x2 - x1) * (y1 + y2) / 2.0
            for (x1, y1), (x2, y2) in zip(path, path[1:])
        )
        assert area == pytest.approx(aucs[g], abs=1e-6)  # auc is qround(6)


def test_fairness_auc_and_gap(spark):
    from etdtransform_spark.operators.evaluation import (
        fairness_auc,
        fairness_auc_gap,
    )

    rows = [
        # group A: perfect ranking -> auc 1
        ("A", 0.9, 1.0), ("A", 0.8, 1.0), ("A", 0.2, 0.0), ("A", 0.1, 0.0),
        # group B: inverted ranking -> auc 0
        ("B", 0.9, 0.0), ("B", 0.1, 1.0),
        # group C: one-class -> NULL auc (defined-group gap skips it)
        ("C", 0.5, 1.0), ("C", 0.6, 1.0),
        # excluded rows
        (None, 0.9, 1.0), ("A", None, 1.0), ("A", 0.5, None),
        ("A", float("nan"), 1.0), ("A", 0.9, float("nan")),
    ]
    df = spark.createDataFrame(rows, "g string, score double, label double")
    per = {r.group: r for r in fairness_auc(df, "score", "label", "g").collect()}
    assert set(per) == {"A", "B", "C"}
    assert per["A"].auc == 1.0 and per["B"].auc == 0.0
    assert per["C"].auc is None
    assert (per["A"].n_pos, per["A"].n_neg) == (2, 2)
    gap = fairness_auc_gap(df, "score", "label", "g").collect()[0]
    assert (gap.n_groups, gap.n_defined) == (3, 2)
    assert gap.auc_gap == 1.0

    # below 2 defining groups -> NULL gap
    one = spark.createDataFrame(
        [("A", 0.9, 1.0), ("A", 0.1, 0.0), ("B", 0.5, 1.0)],
        "g string, score double, label double",
    )
    g1 = fairness_auc_gap(one, "score", "label", "g").collect()[0]
    assert g1.n_defined == 1 and g1.auc_gap is None


def test_regression_report_hand_computed(spark):
    from etdtransform_spark.operators.evaluation import regression_report

    rows = [
        (1.0, 1.5), (2.0, 1.5), (3.0, 3.5), (4.0, 3.5),
        # excluded
        (None, 1.0), (1.0, None), (float("nan"), 1.0), (1.0, float("nan")),
    ]
    df = spark.createDataFrame(rows, "pred double, target double")
    r = regression_report(df, "pred", "target").collect()[0]
    assert r.n == 4
    assert r.mae == pytest.approx(0.5)
    assert r.rmse == pytest.approx(0.5)
    # targets (1.5,1.5,3.5,3.5): ss_tot=4, sse=1 -> r2 = 0.75
    assert r.r2 == pytest.approx(0.75)
    assert r.mean_pred == pytest.approx(2.5)
    assert r.mean_target == pytest.approx(2.5)


def test_regression_report_degenerate(spark):
    from etdtransform_spark.operators.evaluation import regression_report

    # constant target: zero variance -> r2 undefined, mae/rmse defined
    const = spark.createDataFrame(
        [(1.0, 2.0), (3.0, 2.0)], "pred double, target double"
    )
    r = regression_report(const, "pred", "target").collect()[0]
    assert r.r2 is None and r.mae == 1.0 and r.rmse == 1.0

    # perfect predictions -> r2 = 1, errors 0
    perfect = spark.createDataFrame(
        [(1.0, 1.0), (2.0, 2.0), (3.0, 3.0)], "pred double, target double"
    )
    r = regression_report(perfect, "pred", "target").collect()[0]
    assert r.r2 == 1.0 and r.mae == 0.0 and r.rmse == 0.0

    empty = spark.createDataFrame([], "pred double, target double")
    r = regression_report(empty, "pred", "target").collect()[0]
    assert r.n == 0 and r.mae is None and r.rmse is None and r.r2 is None


def test_regression_calibration_deciles(spark):
    from etdtransform_spark.operators.evaluation import (
        regression_calibration_deciles,
    )

    # 20 rows, preds 1..20, target = pred + alternating ±0.5 -> with 4
    # bins the boundaries are exact percentiles of 1..20; each bin holds
    # 5 rows and per-bin avg_target == avg_pred (bias 0 by symmetry...
    # alternating ±0.5 over 5 rows leaves ±0.1 bias; hand-compute)
    rows = [
        (float(i), float(i) + (0.5 if i % 2 == 0 else -0.5))
        for i in range(1, 21)
    ]
    df = spark.createDataFrame(rows, "pred double, target double")
    out = {r.bin: r for r in regression_calibration_deciles(
        df, "pred", "target", n_bins=4).collect()}
    assert set(out) == {0, 1, 2, 3}
    assert all(out[b].n == 5 for b in out)
    # bin 0 holds preds 1..5: avg_pred 3, targets sum = 15 + (-.5+.5-.5+.5-.5)
    assert out[0].avg_pred == pytest.approx(3.0)
    assert out[0].avg_target == pytest.approx(2.9)
    assert out[0].bias == pytest.approx(0.1)
    # monotone avg_target across bins (the scores rank)
    avgs = [out[b].avg_target for b in sorted(out)]
    assert avgs == sorted(avgs)

    # constant predictions: all rows land in bin 0
    const = spark.createDataFrame(
        [(2.0, float(i)) for i in range(6)], "pred double, target double"
    )
    out = regression_calibration_deciles(const, "pred", "target").collect()
    assert len(out) == 1 and out[0].bin == 0 and out[0].n == 6

    # empty input: no rows (NaN/NULL rows excluded first)
    empty = spark.createDataFrame(
        [(None, 1.0), (float("nan"), 2.0)], "pred double, target double"
    )
    assert regression_calibration_deciles(empty, "pred", "target").count() == 0


def test_best_threshold_hand_computed_and_tie(spark):
    from etdtransform_spark.operators.evaluation import best_threshold

    rows = [(0.9, 1.0), (0.8, 0.0), (0.8, 1.0), (0.4, 1.0), (0.1, 0.0)]
    df = spark.createDataFrame(rows, "score double, label double")
    r = best_threshold(df, "score", "label").collect()
    assert len(r) == 1
    r = r[0]
    # f1 by threshold: .9 -> .5, .8 -> 2/3, .4 -> 6/7, .1 -> .75
    assert r.threshold == 0.4 and (r.tp, r.fp) == (3, 1)
    assert r.precision == 0.75 and r.recall == 1.0
    assert r.f1 == pytest.approx(6 / 7, abs=1e-6)

    # exact F1 tie (.9 and .7 both 2/3) -> LOWEST threshold wins
    tie_rows = (
        [(0.9, 1.0)] * 2 + [(0.8, 0.0)] * 2 + [(0.7, 1.0)]
        + [(0.6, 0.0)] * 3 + [(0.5, 1.0)]
    )
    tdf = spark.createDataFrame(tie_rows, "score double, label double")
    t = best_threshold(tdf, "score", "label").collect()[0]
    assert t.threshold == 0.7 and (t.tp, t.fp) == (3, 2)
    assert t.f1 == pytest.approx(2 / 3, abs=1e-6)

    # no positives / empty -> ZERO rows (no operating point exists)
    negs = spark.createDataFrame(
        [(0.9, 0.0), (0.1, 0.0)], "score double, label double"
    )
    assert best_threshold(negs, "score", "label").count() == 0
    empty = spark.createDataFrame([], "score double, label double")
    assert best_threshold(empty, "score", "label").count() == 0


def test_probability_scores_report(spark):
    from etdtransform_spark.operators.evaluation import (
        probability_scores_report,
    )

    rows = [
        (0.9, 1.0), (0.2, 0.0), (0.6, 1.0), (0.4, 0.0),
        (None, 1.0), (0.5, None), (float("nan"), 1.0), (0.5, float("nan")),
    ]
    df = spark.createDataFrame(rows, "p double, y double")
    r = probability_scores_report(df, "p", "y", digits=9).collect()[0]
    assert r.n == 4
    ll = -(math.log(0.9) + math.log(0.8) + math.log(0.6) + math.log(0.6)) / 4
    br = ((0.1) ** 2 + (0.2) ** 2 + (0.4) ** 2 + (0.4) ** 2) / 4
    assert r.log_loss == pytest.approx(ll, abs=1e-9)
    assert r.brier == pytest.approx(br, abs=1e-9)

    # exact-0 prediction on the wrong side: clamped, finite
    hard = spark.createDataFrame([(0.0, 1.0)], "p double, y double")
    r = probability_scores_report(hard, "p", "y").collect()[0]
    assert r.log_loss == pytest.approx(-math.log(1e-15), abs=1e-3)
    assert r.brier == 1.0  # brier is unclamped

    empty = spark.createDataFrame([], "p double, y double")
    r = probability_scores_report(empty, "p", "y").collect()[0]
    assert r.n == 0 and r.log_loss is None and r.brier is None


def test_mcnemar_test(spark):
    from etdtransform_spark.operators.evaluation import mcnemar_test

    rows = (
        # a correct, b wrong x3
        [(0.9, 0.1, 1.0)] * 3
        # b correct, a wrong x1
        + [(0.1, 0.9, 1.0)]
        # both correct x2, both wrong x1
        + [(0.9, 0.9, 1.0)] * 2 + [(0.1, 0.1, 1.0)]
        # excluded
        + [(None, 0.9, 1.0), (0.9, None, 1.0), (0.9, 0.9, None),
           (float("nan"), 0.9, 1.0)]
    )
    df = spark.createDataFrame(rows, "a double, b double, y double")
    r = mcnemar_test(df, "a", "b", "y").collect()[0]
    assert r.n == 7 and r.n_disagree == 4
    assert (r.a_only_correct, r.b_only_correct) == (3, 1)
    assert r.chi2 == pytest.approx((abs(3 - 1) - 1) ** 2 / 4, abs=1e-9)

    # identical models: no disagreement -> NULL chi2, not 0
    same = spark.createDataFrame(
        [(0.9, 0.9, 1.0), (0.1, 0.1, 0.0)], "a double, b double, y double"
    )
    r = mcnemar_test(same, "a", "b", "y").collect()[0]
    assert r.n_disagree == 0 and r.chi2 is None


def test_regression_report_keyed(spark):
    from etdtransform_spark.operators.evaluation import regression_report

    rows = [
        ("A", 1.0, 1.5), ("A", 2.0, 1.5), ("A", 3.0, 3.5), ("A", 4.0, 3.5),
        ("B", 1.0, 1.0), ("B", 2.0, 2.0),          # perfect -> r2 1
        ("C", 1.0, 5.0), ("C", 3.0, 5.0),          # constant target -> NULL r2
        (None, 1.0, 1.0),                          # NULL key excluded
    ]
    df = spark.createDataFrame(rows, "g string, pred double, target double")
    out = {r.g: r for r in regression_report(
        df, "pred", "target", keys=["g"]).collect()}
    assert set(out) == {"A", "B", "C"}
    assert out["A"].n == 4 and out["A"].mae == 0.5
    assert out["A"].r2 == pytest.approx(0.75)
    assert out["B"].r2 == 1.0 and out["B"].rmse == 0.0
    assert out["C"].r2 is None and out["C"].mae == pytest.approx(3.0)
    # keyed over empty input -> zero rows (keyless keeps the 1-row form)
    empty = spark.createDataFrame([], "g string, pred double, target double")
    assert regression_report(empty, "pred", "target", keys=["g"]).count() == 0


def test_roc_pr_curve_max_points_thinning(spark):
    from etdtransform_spark.operators.evaluation import pr_curve, roc_curve

    # 40 distinct thresholds, one row each, alternating labels
    rows = [(i / 40.0, float(i % 2)) for i in range(40)]
    df = spark.createDataFrame(rows, "score double, label double")
    full = sorted(
        (r.threshold, r.tp, r.fp)
        for r in roc_curve(df, "score", "label").collect()
    )
    thin = sorted(
        (r.threshold, r.tp, r.fp)
        for r in roc_curve(df, "score", "label", max_points=4).collect()
    )
    assert len(full) == 40
    assert len(thin) <= 4 + 1
    # every thinned row is an EXACT curve point
    assert set(thin) <= set(full)
    # both endpoints survive: lowest threshold (all-predicted-positive
    # corner) and highest threshold
    assert thin[0] == full[0] and thin[-1] == full[-1]
    # max horizontal gap between kept points is <= n/m rows of the full
    # curve (rank-grid guarantee)
    idx = [full.index(t) for t in thin]
    gaps = [b - a for a, b in zip(idx, idx[1:])]
    assert max(gaps) <= 40 // 4
    # deterministic
    again = sorted(
        (r.threshold, r.tp, r.fp)
        for r in roc_curve(df, "score", "label", max_points=4).collect()
    )
    assert again == thin
    # pr_curve shares the mechanism
    thin_pr = pr_curve(df, "score", "label", max_points=4).collect()
    assert 0 < len(thin_pr) <= 5
    # max_points >= distinct thresholds: identity
    same = roc_curve(df, "score", "label", max_points=100).count()
    assert same == 40


def test_regression_deciles_approx_path(spark):
    from etdtransform_spark.operators.evaluation import (
        regression_calibration_deciles,
    )

    rows = [(float(i), float(i) * 0.5) for i in range(1, 101)]
    df = spark.createDataFrame(rows, "pred double, target double")
    exact = regression_calibration_deciles(df, "pred", "target", n_bins=4)
    approx = regression_calibration_deciles(
        df, "pred", "target", n_bins=4, exact=False
    )
    e = {r.bin: r for r in exact.collect()}
    a = {r.bin: r for r in approx.collect()}
    # bins partition the data either way
    assert sum(r.n for r in e.values()) == 100
    assert sum(r.n for r in a.values()) == 100
    assert set(a) <= {0, 1, 2, 3}
    # at accuracy 10000 on 100 rows GK is exact-rank: same binning
    assert {b: r.n for b, r in a.items()} == {b: r.n for b, r in e.items()}


def test_average_precision_matches_sklearn_formula(spark):
    from etdtransform_spark.operators.evaluation import average_precision

    pairs = [(0.9, 1), (0.8, 1), (0.8, 0), (0.7, 0), (0.5, 1),
             (0.5, 0), (0.5, 0), (0.2, 0), (0.9, 1), (0.1, 0)]
    rows = [(s, float(y)) for s, y in pairs] + [
        (None, 1.0), (0.5, None), (float("nan"), 1.0), (0.6, float("nan")),
    ]
    df = spark.createDataFrame(rows, "score double, label double")
    r = average_precision(df, "score", "label", digits=9).collect()[0]
    assert (r.n_pos, r.n_neg) == (4, 6)
    # independent step-rule reimplementation over descending thresholds
    n_pos = 4
    ap, prev_tp = 0.0, 0
    for t in sorted({s for s, _ in pairs}, reverse=True):
        tp = sum(1 for s, y in pairs if y and s >= t)
        fp = sum(1 for s, y in pairs if not y and s >= t)
        ap += (tp - prev_tp) / n_pos * (tp / (tp + fp))
        prev_tp = tp
    assert r.average_precision == pytest.approx(ap, abs=1e-9)

    # perfect ranking -> AP 1; one-class -> NULL; keyed segments
    perfect = spark.createDataFrame(
        [(0.9, 1.0), (0.8, 1.0), (0.2, 0.0)], "score double, label double"
    )
    assert average_precision(perfect, "score", "label").collect()[0].average_precision == 1.0
    negs = spark.createDataFrame([(0.9, 0.0)], "score double, label double")
    assert average_precision(negs, "score", "label").collect()[0].average_precision is None
    keyed = spark.createDataFrame(
        [("a", 0.9, 1.0), ("a", 0.1, 0.0), ("b", 0.1, 1.0), ("b", 0.9, 0.0)],
        "g string, score double, label double",
    )
    out = {r.g: r.average_precision for r in average_precision(
        keyed, "score", "label", keys=["g"]).collect()}
    assert out["a"] == 1.0 and out["b"] == 0.5  # b: pos found at rank 2


def test_regression_calibration_deciles_single_bin(spark):
    """ADVICE r9: n_bins=1 must yield bin 0 (not NULL from an empty
    NullType boundary array), and n_bins<1 must raise."""
    from etdtransform_spark.operators.evaluation import (
        regression_calibration_deciles,
    )

    df = spark.createDataFrame(
        [(1.0, 1.5), (2.0, 2.5), (3.0, 2.0)], "p double, y double"
    )
    rows = regression_calibration_deciles(df, "p", "y", n_bins=1).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.bin == 0 and r.n == 3
    assert r.avg_pred == 2.0 and r.avg_target == 2.0 and r.bias == 0.0

    import pytest as _pytest
    with _pytest.raises(ValueError):
        regression_calibration_deciles(df, "p", "y", n_bins=0)
