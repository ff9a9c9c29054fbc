"""Unit tests for operators/preference.py (Bradley-Terry MM): strengths
against an independent python MM reimplementation, dominance ordering,
symmetric data, NULL/self-comparison exclusion, never-wins boundary, and
the pair-table build."""

from __future__ import annotations

import pytest

from etdtransform_spark.operators.preference import (
    bradley_terry_strengths,
    pair_counts,
)


def _py_bt(rows, iters):
    items = sorted({x for r in rows for x in r})
    wins = {i: 0 for i in items}
    n = {}
    for w, l in rows:
        wins[w] += 1
        k = tuple(sorted((w, l)))
        n[k] = n.get(k, 0) + 1
    s = {i: 1.0 for i in items}
    for _ in range(iters):
        new = {}
        for i in items:
            d = sum(
                cnt / (s[i] + s[k[0] if k[1] == i else k[1]])
                for k, cnt in n.items()
                if i in k
            )
            new[i] = wins[i] / d if d > 0 else 0.0
        t = sum(new.values())
        s = {i: new[i] * len(items) / t if t > 0 else 0.0 for i in items}
    return s


ROWS = (
    [("A", "B")] * 8 + [("B", "A")] * 2
    + [("B", "C")] * 8 + [("C", "B")] * 2
    + [("A", "C")] * 9 + [("C", "A")] * 1
)


def test_matches_python_mm(spark):
    df = spark.createDataFrame(ROWS, "winner string, loser string")
    got = {r.item: r for r in bradley_terry_strengths(df, iterations=20).collect()}
    want = _py_bt(ROWS, 20)
    for i in want:
        assert got[i].strength == pytest.approx(want[i], abs=1e-6)
    # transitive dominance recovered
    assert got["A"].strength > got["B"].strength > got["C"].strength
    assert (got["A"].n_comparisons, got["A"].wins) == (20, 17)


def test_symmetric_data_all_equal(spark):
    rows = [("A", "B")] * 5 + [("B", "A")] * 5 + [("B", "C")] * 5 + [("C", "B")] * 5
    df = spark.createDataFrame(rows, "winner string, loser string")
    out = {r.item: r.strength for r in bradley_terry_strengths(df, iterations=15).collect()}
    # perfectly balanced comparisons -> the all-equal fixed point w = 1
    for v in out.values():
        assert v == pytest.approx(1.0, abs=1e-6)


def test_never_wins_boundary_and_exclusions(spark):
    rows = [("A", "B")] * 4 + [("A", "A")] * 3 + [(None, "B")] * 2 + [("B", None)]
    df = spark.createDataFrame(rows, "winner string, loser string")
    out = {r.item: r for r in bradley_terry_strengths(df, iterations=5).collect()}
    # self-comparisons and NULL sides dropped: only the 4 A>B votes count
    assert out["A"].n_comparisons == 4 and out["B"].n_comparisons == 4
    assert out["B"].wins == 0 and out["B"].strength == 0.0  # MLE boundary
    assert out["A"].strength > 0


def test_pair_counts(spark):
    rows = [("x", "y"), ("y", "x"), ("x", "y"), ("z", "x")]
    df = spark.createDataFrame(rows, "winner string, loser string")
    out = {(r.item_a, r.item_b): (r.n_total, r.wins_a)
           for r in pair_counts(df).collect()}
    assert out == {("x", "y"): (3, 2), ("x", "z"): (1, 0)}
