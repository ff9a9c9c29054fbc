"""Unit tests for the fractional expectation checks added to
operators/quality.py:check_expectations (threshold_completeness +
predicate compliance): metrics hand-computed; empty batches must FAIL
fractional gates rather than pass vacuously; everything still rides the
single aggregate pass."""

from __future__ import annotations

import math

import pytest

from etdtransform_spark.operators.quality import check_expectations


def _df(spark):
    rows = [(1, 10.0), (2, -3.0), (3, None), (4, 7.0), (5, 2.0)]
    return spark.createDataFrame(rows, "id bigint, v double")


def test_fractional_metrics_and_verdicts(spark):
    rep = check_expectations(
        _df(spark),
        threshold_completeness={"v": 0.9, "id": 0.99},
        compliance={
            "v_positive": ("v > 0", 0.5),
            "v_small": ("v < 5", 0.9),
        },
    )
    out = {(r.check, r.target): r for r in rep.collect()}
    c_v = out[("completeness", "v")]
    assert math.isclose(c_v.metric, 4 / 5) and not c_v.passed  # 0.8 < 0.9
    c_id = out[("completeness", "id")]
    assert c_id.metric == 1.0 and c_id.passed
    # NULL predicate rows count as non-compliant: 3 of 5 rows have v > 0
    pos = out[("compliance", "v_positive")]
    assert math.isclose(pos.metric, 3 / 5) and pos.passed
    small = out[("compliance", "v_small")]
    assert math.isclose(small.metric, 2 / 5) and not small.passed
    assert all(r.passed is not None for r in out.values())


def test_empty_batch_fails_fractional_gates(spark):
    df = spark.createDataFrame([], "id bigint, v double")
    rep = check_expectations(
        df,
        not_null=["id"],
        threshold_completeness={"v": 0.5},
        compliance={"v_positive": ("v > 0", 0.1)},
    )
    out = {(r.check, r.target): r for r in rep.collect()}
    # violation-count checks pass vacuously (0 of 0), documented behavior
    assert out[("not_null", "id")].passed
    # fractional gates do NOT: no data proves nothing
    assert out[("completeness", "v")].metric is None
    assert out[("completeness", "v")].passed is False
    assert out[("compliance", "v_positive")].passed is False


def test_mixed_report_single_pass(spark):
    rep = check_expectations(
        _df(spark),
        not_null=["id"],
        unique=[["id"]],
        min_rows=1,
        threshold_completeness={"v": 0.5},
        compliance={"v_positive": ("v > 0", 0.1)},
    )
    assert rep.count() == 5
    plan = rep._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan  # all non-FK checks share one aggregate


def test_bad_compliance_predicate_raises(spark):
    with pytest.raises(ValueError):
        check_expectations(_df(spark), compliance={"x": (123, 0.5)})


def test_hostile_rule_names_resolve(spark):
    """Rule/display names containing dots, backticks, or duplicates must
    not break alias resolution (aliases are index-based; names are report
    literals only)."""
    rep = check_expectations(
        _df(spark),
        compliance={
            "rule.with.dots": ("v > 0", 0.5),
            "rule`with`ticks": ("v < 100", 0.5),
            "_m_0": ("v IS NOT NULL", 0.5),  # would collide with an alias
        },
    )
    out = {r.target: r for r in rep.collect()}
    assert math.isclose(out["rule.with.dots"].metric, 3 / 5)
    assert math.isclose(out["rule`with`ticks"].metric, 4 / 5)
    assert math.isclose(out["_m_0"].metric, 4 / 5)
