"""Unit tests for operators/timeseries.py (calendar scaffold, linear
interpolation, truncated EWMA) plus the quantile/cube/latest-snapshot
additions to stats.py and olap.py."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pytest
from pyspark.sql import functions as F

from etdtransform_spark.operators.olap import cube_stats, latest_snapshot
from etdtransform_spark.operators.stats import quantile_summary
from etdtransform_spark.operators.timeseries import (
    ewma,
    interpolate_linear,
    scaffold_time_grid,
)


def _ts(h, m=0):
    return dt.datetime(2024, 1, 1, h, m)


def test_scaffold_emits_empty_buckets(spark):
    df = spark.createDataFrame(
        [(1, _ts(0, 10), 5.0), (1, _ts(3, 20), 7.0), (2, _ts(1), 1.0)],
        "k bigint, ts timestamp, v double",
    )
    out = scaffold_time_grid(
        df, ["k"], "ts", "1 hour", aggs=[F.sum("v").alias("s")]
    ).orderBy("k", "bucket")
    rows = [(r.k, r.bucket.hour, r.n, r.s) for r in out.collect()]
    # key 1 spans hours 0..3 -> 4 buckets, hours 1 and 2 empty with n=0
    assert rows == [
        (1, 0, 1, 5.0), (1, 1, 0, None), (1, 2, 0, None), (1, 3, 1, 7.0),
        (2, 1, 1, 1.0),
    ]


def test_scaffold_rejects_multi_unit_interval(spark):
    df = spark.createDataFrame([(1, _ts(0), 1.0)], "k bigint, ts timestamp, v double")
    with pytest.raises(ValueError):
        scaffold_time_grid(df, ["k"], "ts", "15 minutes")


def test_interpolate_time_weighted(spark):
    # gap of 3 rows between v=10 (t=0min) and v=40 (t=30min), at 5/10/25min:
    # time-weighted, NOT evenly spaced.
    df = spark.createDataFrame(
        [
            (1, _ts(0, 0), 10.0),
            (2, _ts(0, 5), None),
            (3, _ts(0, 10), None),
            (4, _ts(0, 25), None),
            (5, _ts(0, 30), 40.0),
        ],
        "id bigint, ts timestamp, v double",
    ).withColumn("k", F.lit(1))
    out = interpolate_linear(df, ["k"], "ts", "v", order_cols=["id"])
    got = {r.id: r.v_interp for r in out.collect()}
    assert got[1] == 10.0 and got[5] == 40.0
    assert got[2] == pytest.approx(10 + (5 / 30) * 30, abs=1e-9)
    assert got[3] == pytest.approx(10 + (10 / 30) * 30, abs=1e-9)
    assert got[4] == pytest.approx(10 + (25 / 30) * 30, abs=1e-9)


def test_interpolate_edges_stay_null(spark):
    df = spark.createDataFrame(
        [(1, _ts(0), None), (2, _ts(1), 5.0), (3, _ts(2), None)],
        "id bigint, ts timestamp, v double",
    ).withColumn("k", F.lit(1))
    out = interpolate_linear(df, ["k"], "ts", "v", order_cols=["id"])
    got = {r.id: r.v_interp for r in out.collect()}
    assert got[1] is None and got[3] is None and got[2] == 5.0


def test_ewma_matches_python_fold(spark):
    vals = [3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0]
    df = spark.createDataFrame(
        [(i, _ts(0, i), v) for i, v in enumerate(vals)],
        "id bigint, ts timestamp, v double",
    ).withColumn("k", F.lit(1))
    out = ewma(df, ["k"], "ts", "v", alpha=0.3, lookback=20, order_cols=["id"])
    got = {r.id: r.ewma for r in out.collect()}
    acc = None
    for i, v in enumerate(vals):
        acc = v if acc is None else 0.3 * v + 0.7 * acc
        assert got[i] == pytest.approx(acc, abs=1e-6), i


def test_ewma_lookback_truncates(spark):
    # lookback=2: frame is [prev, cur] -> ewma = 0.5*cur + 0.5*prev exactly
    vals = [10.0, 20.0, 40.0]
    df = spark.createDataFrame(
        [(i, _ts(0, i), v) for i, v in enumerate(vals)],
        "id bigint, ts timestamp, v double",
    ).withColumn("k", F.lit(1))
    out = ewma(df, ["k"], "ts", "v", alpha=0.5, lookback=2, order_cols=["id"])
    got = {r.id: r.ewma for r in out.collect()}
    assert got[0] == 10.0
    assert got[1] == pytest.approx(0.5 * 20 + 0.5 * 10)
    assert got[2] == pytest.approx(0.5 * 40 + 0.5 * 20)  # row 0 dropped


def test_quantile_summary_matches_numpy(spark):
    vals = [1.0, 2.0, 4.0, 8.0, 16.0, 32.0, 64.0, 5.0]
    df = spark.createDataFrame([("a", v) for v in vals], "g string, v double")
    row = quantile_summary(df, "v", ["g"]).collect()[0]
    p25, p50, p75 = (
        float(np.percentile(vals, q, method="linear")) for q in (25, 50, 75)
    )
    assert row.n == len(vals)
    assert row.p25 == pytest.approx(p25, abs=1e-6)
    assert row.p50 == pytest.approx(p50, abs=1e-6)
    assert row.p75 == pytest.approx(p75, abs=1e-6)
    assert row.iqr == pytest.approx(p75 - p25, abs=1e-5)
    assert row.lo_fence == pytest.approx(p25 - 1.5 * (p75 - p25), abs=1e-5)
    assert row.hi_fence == pytest.approx(p75 + 1.5 * (p75 - p25), abs=1e-5)


def test_cube_grouping_indicators_vs_real_null(spark):
    # a genuine NULL key value must be distinguishable from a subtotal row
    df = spark.createDataFrame(
        [("x", 1, 1.0), (None, 1, 2.0), ("x", 2, 3.0)],
        "a string, b int, v double",
    )
    out = cube_stats(df, ["a", "b"], [F.count(F.lit(1)).alias("n")])
    rows = out.collect()
    assert len(rows) == 3 + 2 + 2 + 1  # detail + by-a + by-b + grand total
    detail_null = [
        r for r in rows
        if r.grouping_a == 0 and r.a is None and r.grouping_b == 0
    ]
    subtotal_a = [
        r for r in rows if r.grouping_a == 1 and r.grouping_b == 0
    ]
    assert len(detail_null) == 1 and detail_null[0].n == 1
    assert {(r.b, r.n) for r in subtotal_a} == {(1, 2), (2, 1)}


def test_latest_snapshot_total_order_tiebreak(spark):
    same_ts = _ts(5)
    df = spark.createDataFrame(
        [(1, 10, same_ts, "a"), (1, 11, same_ts, "b"), (2, 3, _ts(1), "c")],
        "k bigint, id bigint, ts timestamp, payload string",
    )
    out = latest_snapshot(df, ["k"], [F.col("ts"), F.col("id")])
    got = {r.k: (r.id, r.payload) for r in out.collect()}
    assert got == {1: (11, "b"), 2: (3, "c")}


def test_interpolate_duplicate_timestamp_bracket(spark):
    """A null bracketed by same-timestamp neighbors takes the previous
    value (0/0 guard) on both engines, not a null/NaN divergence."""
    t = _ts(1)
    df = spark.createDataFrame(
        [(1, t, 1.0), (2, t, None), (3, t, 3.0)],
        "id bigint, ts timestamp, v double",
    ).withColumn("k", F.lit(1))
    out = {r.id: r.v_interp for r in interpolate_linear(
        df, ["k"], "ts", "v", order_cols=["id"]).collect()}
    assert out[2] == 1.0


def test_seasonal_decompose_exact_cycle(spark):
    import datetime as dt

    from etdtransform_spark.operators.timeseries import seasonal_decompose

    season = [2.0, -1.0, -2.0, 1.0]  # sums to 0 over the period
    base = dt.datetime(2024, 1, 1)
    rows = [
        (base + dt.timedelta(hours=i), 10.0 + season[i % 4])
        for i in range(16)
    ]
    df = spark.createDataFrame(rows, "ts timestamp, v double")
    out = {
        r.ts: r
        for r in seasonal_decompose(
            df, "ts", "v", interval_seconds=3600, period=4, digits=9
        ).collect()
    }
    assert len(out) == 16
    lo, hi = 2, 1  # centered window bounds for period 4
    for i, (ts, v) in enumerate(rows):
        r = out[ts]
        assert r.value == v
        assert r.phase == (base + dt.timedelta(hours=i)).hour % 4
        if lo <= i < 16 - hi:
            # any 4 consecutive seasonal terms sum to 0 -> trend exact
            assert r.trend == pytest.approx(10.0, abs=1e-9)
            assert r.seasonal == pytest.approx(season[i % 4], abs=1e-9)
            assert r.residual == pytest.approx(0.0, abs=1e-9)
        else:
            assert r.trend is None and r.residual is None
            # seasonal still joins from the phase profile
            assert r.seasonal == pytest.approx(season[i % 4], abs=1e-9)


def test_seasonal_decompose_keyed_and_phase_from_time(spark):
    import datetime as dt

    from etdtransform_spark.operators.timeseries import seasonal_decompose

    base = dt.datetime(2024, 1, 1)
    sa = [1.0, -1.0]
    sb = [5.0, -5.0]
    rows = []
    for i in range(8):
        rows.append(("a", base + dt.timedelta(hours=i), 3.0 + sa[i % 2]))
        rows.append(("b", base + dt.timedelta(hours=i), 7.0 + sb[i % 2]))
    # key 'a' is MISSING one bucket: phase comes from time, so the
    # remaining rows keep their true phase
    rows = [r for r in rows if not (r[0] == "a" and r[1].hour == 3)]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    out = {
        (r.k, r.ts): r
        for r in seasonal_decompose(
            df, "ts", "v", 3600, 2, keys=["k"], digits=9
        ).collect()
    }
    for (k, ts), r in out.items():
        # the point under test: phase derives from TIME, so key a's
        # missing bucket cannot shift later rows' phases
        assert r.phase == ts.hour % 2
        if k == "b":
            # intact series: every phase profile is exact
            assert r.seasonal == pytest.approx(sb[ts.hour % 2], abs=1e-9)
        # key a's trend windows straddle the gap (row-based MA), so its
        # profile legitimately differs from sa — phase integrity is the
        # pinned property; zero-mean normalization still holds:
    a_seas = {r.seasonal for (k, _), r in out.items() if k == "a"
              if r.seasonal is not None}
    assert sum(a_seas) == pytest.approx(0.0, abs=1e-9)
    # key b intact: interior rows decompose exactly
    rb = out[("b", base + dt.timedelta(hours=3))]
    assert rb.trend == pytest.approx(7.0, abs=1e-9)
    assert rb.residual == pytest.approx(0.0, abs=1e-9)
