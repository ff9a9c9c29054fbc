"""Property-based invariants for the round-9 evaluation/temporal
substrates (hypothesis): the curve table must integrate to the rank
AUC, the thinned curve must be an endpoint-preserving subset, the best
threshold must actually be optimal, and the time-weighted integral must
conserve total area independent of bucket size."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st


scored = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=12),  # score grid (ties likely)
        st.booleans(),
    ),
    min_size=1,
    max_size=40,
)


def _auc_py(pairs):
    pos = [s for s, y in pairs if y]
    neg = [s for s, y in pairs if not y]
    if not pos or not neg:
        return None
    wins = sum(
        1.0 if p > n else 0.5 if p == n else 0.0 for p in pos for n in neg
    )
    return wins / (len(pos) * len(neg))


@settings(max_examples=6, deadline=None)
@given(scored)
def test_roc_curve_integrates_to_auc_and_thinning_is_subset(spark, data):
    from etdtransform_spark.operators.evaluation import auc_roc, roc_curve

    rows = [(float(s), 1.0 if y else 0.0) for s, y in data]
    df = spark.createDataFrame(rows, "score double, label double")
    pts = sorted(
        ((r.threshold, r.tpr, r.fpr, r.tp, r.fp)
         for r in roc_curve(df, "score", "label", digits=None).collect()),
        reverse=True,
    )
    expect = _auc_py(data)
    got = auc_roc(df, "score", "label", digits=None).collect()[0].auc
    if expect is None:
        assert got is None
    else:
        assert got == pytest.approx(expect, abs=1e-12)
        # trapezoid over the (fpr, tpr) path == the rank AUC
        path = [(0.0, 0.0)] + [(f, t) for _th, t, f, _tp, _fp in pts]
        area = sum(
            (x2 - x1) * (y1 + y2) / 2.0
            for (x1, y1), (x2, y2) in zip(path, path[1:])
        )
        assert area == pytest.approx(expect, abs=1e-12)
    # thinning: subset of exact points, endpoints kept, deterministic
    full = {(r.threshold, r.tp, r.fp)
            for r in roc_curve(df, "score", "label").collect()}
    thin = [(r.threshold, r.tp, r.fp)
            for r in roc_curve(df, "score", "label", max_points=3).collect()]
    assert set(thin) <= full and len(thin) <= 4
    lo, hi = min(full), max(full)
    assert lo in set(thin) and hi in set(thin)


@settings(max_examples=6, deadline=None)
@given(scored)
def test_best_threshold_is_argmax_f1(spark, data):
    from etdtransform_spark.operators.evaluation import best_threshold

    rows = [(float(s), 1.0 if y else 0.0) for s, y in data]
    df = spark.createDataFrame(rows, "score double, label double")
    out = best_threshold(df, "score", "label", digits=None).collect()
    n_pos = sum(1 for _, y in data if y)
    if n_pos == 0:
        assert out == []
        return
    # python argmax over every attained threshold, ties to lowest
    best = None
    for t in sorted({s for s, _ in data}):
        tp = sum(1 for s, y in data if y and s >= t)
        fp = sum(1 for s, y in data if not y and s >= t)
        f1 = 2.0 * tp / (tp + fp + n_pos)
        if best is None or f1 > best[0] or (f1 == best[0] and t < best[1]):
            best = (f1, t, tp, fp)
    r = out[0]
    assert r.f1 == pytest.approx(best[0], abs=1e-12)
    assert float(r.threshold) == float(best[1])
    assert (r.tp, r.fp) == (best[2], best[3])


series = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=10_000),  # seconds offset
        st.integers(min_value=-8, max_value=8),      # value on a unit grid
    ),
    min_size=1,
    max_size=30,
)


@settings(max_examples=6, deadline=None)
@given(series)
def test_time_weighted_avg_conserves_area(spark, data):
    """Σ twa·covered over buckets equals the direct LOCF integral, for
    ANY bucket size — bucketing redistributes area, never creates or
    destroys it; and covered time sums to the series' span."""
    import datetime as dt

    from etdtransform_spark.operators.temporal import time_weighted_avg

    base = dt.datetime(2024, 1, 1)
    rows = [
        (base + dt.timedelta(seconds=s), float(v)) for s, v in data
    ]
    df = spark.createDataFrame(rows, "ts timestamp, v double")
    # python LOCF integral with the operator's tie rule (ts, then value)
    pts = sorted((s, float(v)) for s, v in data)
    total_area = sum(
        (t1 - t0) * v0 for (t0, v0), (t1, _v1) in zip(pts, pts[1:])
    )
    span = pts[-1][0] - pts[0][0]
    for bucket in (60, 3600):
        out = time_weighted_avg(df, "ts", "v", bucket, digits=None).collect()
        area = sum(
            r.twa * r.covered_seconds for r in out if r.twa is not None
        )
        covered = sum(r.covered_seconds for r in out)
        assert area == pytest.approx(total_area, abs=1e-6)
        assert covered == pytest.approx(span, abs=1e-9)
        assert sum(r.n_readings for r in out) == len(data)
