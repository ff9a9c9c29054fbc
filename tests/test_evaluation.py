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

    df = spark.createDataFrame(pairs, "score double, label int")
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

    rows = [(0.9, 1), (0.8, 0), (0.4, 1), (0.1, 0), (0.7, 1), (None, 1)]
    df = spark.createDataFrame(rows, "score double, label int")
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
