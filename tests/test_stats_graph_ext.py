"""Unit tests: Welch t-test, chi-square, histogram-state quantiles,
triangle counting, longest streaks."""

from __future__ import annotations

import datetime as dt
import math
import random

from pyspark.sql import functions as F


def test_welch_ttest_matches_scipy_free_formula(spark):
    from etdtransform_spark.operators.stats import welch_ttest

    rng = random.Random(3)
    a = [rng.gauss(10, 2) for _ in range(40)]
    b = [rng.gauss(11, 3) for _ in range(30)]
    rows = [("a", v) for v in a] + [("b", v) for v in b] + [("c", 99.0)]
    df = spark.createDataFrame(rows, ["g", "v"])
    [r] = welch_ttest(df, "g", "v", "a", "b").collect()

    import statistics

    ma, mb = statistics.mean(a), statistics.mean(b)
    sea = statistics.variance(a) / len(a)
    seb = statistics.variance(b) / len(b)
    t = (ma - mb) / math.sqrt(sea + seb)
    dof = (sea + seb) ** 2 / (
        sea**2 / (len(a) - 1) + seb**2 / (len(b) - 1)
    )
    assert r.n_a == 40 and r.n_b == 30  # group c excluded
    assert math.isclose(r.t_stat, t, abs_tol=1e-5)
    assert math.isclose(r.dof, dof, abs_tol=1e-4)


def test_chi_square_known_table_and_absent_cell(spark):
    from etdtransform_spark.operators.stats import chi_square

    # 2x2 with one absent cell: g1: 10 hi / 10 lo; g2: 20 hi / 0 lo.
    rows = (
        [("g1", "hi")] * 10 + [("g1", "lo")] * 10 + [("g2", "hi")] * 20
    )
    df = spark.createDataFrame(rows, ["g", "o"])
    [r] = chi_square(df, "g", "o").collect()
    # manual: totals g1=20 g2=20, hi=30 lo=10, N=40; E = 15,5,15,5
    expected = (
        (10 - 15) ** 2 / 15
        + (10 - 5) ** 2 / 5
        + (20 - 15) ** 2 / 15
        + (0 - 5) ** 2 / 5
    )
    assert math.isclose(r.chi2, expected, abs_tol=1e-6)
    assert r.dof == 1


def test_chi_square_independent_is_zero(spark):
    from etdtransform_spark.operators.stats import chi_square

    rows = [(g, o) for g in ("a", "b") for o in ("x", "y") for _ in range(7)]
    df = spark.createDataFrame(rows, ["g", "o"])
    [r] = chi_square(df, "g", "o").collect()
    assert r.chi2 == 0.0


def test_hist_state_quantile_accuracy_and_merge(spark):
    from etdtransform_spark.operators.incremental import (
        hist_state_build,
        hist_state_merge,
        hist_state_quantile,
    )

    rng = random.Random(5)
    vals = sorted(rng.uniform(0, 100) for _ in range(1001))
    rows = [("k", v) for v in vals]
    b1 = spark.createDataFrame(rows[0::2], ["k", "v"])
    b2 = spark.createDataFrame(rows[1::2], ["k", "v"])
    merged = hist_state_merge(
        [
            hist_state_build(b1, ["k"], "v", 0.0, 100.0, 200),
            hist_state_build(b2, ["k"], "v", 0.0, 100.0, 200),
        ],
        ["k"],
    )
    [r] = hist_state_quantile(merged, ["k"], 0.5, 0.0, 100.0, 200).collect()
    # error bounded by one bin width (0.5)
    assert abs(r.q50 - vals[500]) <= 0.5
    # clamp: out-of-domain values land in edge bins, never lost
    edge = spark.createDataFrame(
        [("k", -5.0), ("k", 500.0)], ["k", "v"]
    )
    st = hist_state_build(edge, ["k"], "v", 0.0, 100.0, 10)
    assert {x.bin for x in st.collect()} == {0, 9}


def test_triangle_count_known_graphs(spark):
    from etdtransform_spark.operators.graph import triangle_count

    # K4 has 4 triangles; direction/duplicates/self-loops must not matter.
    k4 = [(a, b) for a in range(4) for b in range(4) if a != b]
    df = spark.createDataFrame(
        k4 + [(0, 0), (1, 2), (2, 1)], ["src", "dst"]
    )
    assert triangle_count(df).collect()[0].n_triangles == 4
    # a path graph has none
    path = spark.createDataFrame([(0, 1), (1, 2), (2, 3)], ["src", "dst"])
    assert triangle_count(path).collect()[0].n_triangles == 0


def test_longest_streak_ties_and_gaps(spark):
    from etdtransform_spark.operators.temporal import longest_streak

    d0 = dt.datetime(2024, 3, 1, 12, 0)

    def day(n, h=0):
        return d0 + dt.timedelta(days=n, hours=h)

    rows = (
        # u1: days 0,1,2 then 5,6 -> longest 3 starting day 0
        [(1, day(0)), (1, day(1)), (1, day(1, 5)), (1, day(2)),
         (1, day(5)), (1, day(6))]
        # u2: two 2-day streaks (0-1 and 4-5) -> tie, earliest start wins
        + [(2, day(0)), (2, day(1)), (2, day(4)), (2, day(5))]
    )
    df = spark.createDataFrame(rows, ["user_id", "ts"])
    out = {r.user_id: r for r in longest_streak(df, "user_id", "ts").collect()}
    assert out[1].streak_days == 3
    assert out[1].streak_start == day(0).date()
    assert out[1].streak_end == day(2).date()
    assert out[2].streak_days == 2
    assert out[2].streak_start == day(0).date()


def test_autocorrelation_known_series(spark):
    import datetime as dt

    from etdtransform_spark.operators.stats import autocorrelation

    t0 = dt.datetime(2024, 1, 1)
    # strictly increasing series -> lag-1 ACF of a linear ramp is 1
    ramp = [("r", t0 + dt.timedelta(minutes=i), float(i), i)
            for i in range(50)]
    # alternating series -> strong negative lag-1 correlation
    alt = [("a", t0 + dt.timedelta(minutes=i), float((-1) ** i), i)
           for i in range(50)]
    df = spark.createDataFrame(ramp + alt, ["k", "ts", "v", "eid"])
    out = {r.k: r for r in autocorrelation(
        df, "ts", "v", ["k"], lag=1, order_cols=["eid"]).collect()}
    assert out["r"].n_pairs == 49
    assert abs(out["r"].acf_lag1 - 1.0) < 1e-6
    assert out["a"].acf_lag1 == -1.0


def test_cusum_finds_planted_level_shift(spark):
    import datetime as dt

    from etdtransform_spark.operators.timeseries import cusum_changepoint

    t0 = dt.datetime(2024, 1, 1)
    # flat 0s then flat 10s: |CUSUM| peaks exactly at the shift boundary
    rows = [("k", t0 + dt.timedelta(minutes=i),
             0.0 if i < 60 else 10.0, i) for i in range(120)]
    # control series: constant (sd=0) -> excluded entirely
    rows += [("c", t0 + dt.timedelta(minutes=i), 5.0, i) for i in range(30)]
    df = spark.createDataFrame(rows, ["k", "ts", "v", "eid"])
    out = {r.k: r for r in cusum_changepoint(
        df, "ts", "v", ["k"], order_cols=["eid"]).collect()}
    assert set(out) == {"k"}  # zero-variance series dropped
    r = out["k"]
    assert r.changepoint_ts == t0 + dt.timedelta(minutes=59)
    assert r.significant and r.cusum_stat > 3.0


def test_welch_ttest_single_observation_arm_yields_null(spark):
    """An arm with n=1 has no sample variance: the test must return NULL
    t/dof (degenerate test), not abort with ANSI DIVIDE_BY_ZERO."""
    from etdtransform_spark.operators.stats import welch_ttest

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 10.0)], ["g", "v"]
    )
    [r] = welch_ttest(df, "g", "v", "a", "b").collect()
    assert r.n_a == 3 and r.n_b == 1
    assert r.mean_b == 10.0
    assert r.t_stat is None and r.dof is None


def test_cusum_single_row_key_dropped_not_crashed(spark):
    """A key with one observation has no sample sd: it must be dropped
    like a zero-variance key, not abort the whole job (ANSI guard)."""
    import datetime as dt

    from etdtransform_spark.operators.timeseries import cusum_changepoint

    t0 = dt.datetime(2024, 1, 1)
    rows = [("k", t0 + dt.timedelta(minutes=i),
             0.0 if i < 30 else 10.0, i) for i in range(60)]
    rows += [("lone", t0, 42.0, 0)]
    df = spark.createDataFrame(rows, ["k", "ts", "v", "eid"])
    out = {r.k for r in cusum_changepoint(
        df, "ts", "v", ["k"], order_cols=["eid"]).collect()}
    assert out == {"k"}


def test_winsorize_preserves_nulls(spark):
    """NULL inputs must stay NULL — greatest/least skip NULLs, so without
    the guard a NULL row silently became the lower bound."""
    from etdtransform_spark.operators.stats import winsorize

    rows = [(i, float(v)) for i, v in enumerate(range(0, 101))]
    rows.append((999, None))
    df = spark.createDataFrame(rows, ["id", "v"])
    out = {r.id: r for r in winsorize(df, "v", p_lo=0.05, p_hi=0.95).collect()}
    assert out[999].v_winsorized is None
    assert out[999].was_clamped is False


def test_quantile_normalize_single_row_group_maps_to_median(spark):
    """A 1-row group has no rank span: it pins to r=0.5 (pooled median)
    instead of dividing by zero."""
    from etdtransform_spark.operators.stats import quantile_normalize

    rows = [(i, "a", float(v)) for i, v in enumerate([1, 2, 3, 4, 5])]
    rows.append((99, "solo", 1000.0))
    df = spark.createDataFrame(rows, ["id", "g", "v"])
    out = {r.id: r for r in quantile_normalize(df, "v", "g", ["id"]).collect()}
    # pooled values sorted: [1,2,3,4,5,1000]; r=0.5 -> pos 3.5 -> 3.5
    assert abs(out[99].normalized - 3.5) < 1e-9


def test_quantile_normalize_aligns_marginals(spark):
    """After normalization the two groups' value sets coincide with the
    pooled distribution positions: a group that is a constant shift of
    another maps onto identical normalized values."""
    from etdtransform_spark.operators.stats import quantile_normalize

    g1 = [(i, "a", float(v)) for i, v in enumerate([1, 2, 3, 4, 5])]
    g2 = [(10 + i, "b", float(v)) for i, v in enumerate([101, 102, 103, 104, 105])]
    df = spark.createDataFrame(g1 + g2, ["id", "g", "v"])
    out = quantile_normalize(df, "v", "g", ["id"]).collect()
    by_g = {}
    for r in out:
        by_g.setdefault(r.g, []).append(r.normalized)
    assert sorted(by_g["a"]) == sorted(by_g["b"])
    # extremes map to pooled extremes
    assert min(by_g["a"]) == 1.0 and max(by_g["b"]) == 105.0


def test_quantile_normalize_sampled_path(spark):
    """exact=False (the 100 TB path): (1) matches the exact inverse CDF
    within grid resolution on a smooth fixture, (2) is ANSI-safe at the
    rank extremes r=0 and r=1 (element_at is clamped), and (3) carries NO
    partition-less window — every windowspecdefinition in the optimized
    plan is the per-group rank, so no single-partition global sort
    survives in the plan (the exact path's scale caveat)."""
    import re

    from etdtransform_spark.operators.stats import quantile_normalize

    rows = [(g * 1000 + i, f"g{g}", float(g * 7 + i)) for g in range(3)
            for i in range(200)]
    df = spark.createDataFrame(rows, ["id", "g", "v"])
    sampled = quantile_normalize(df, "v", "g", ["id"], exact=False,
                                 grid_size=257, accuracy=10000)
    exact = quantile_normalize(df, "v", "g", ["id"], exact=True)
    s = {r.id: r.normalized for r in sampled.collect()}
    e = {r.id: r.normalized for r in exact.collect()}
    assert set(s) == set(e)
    span = max(e.values()) - min(e.values())
    for k in e:
        assert abs(s[k] - e[k]) <= span / 64, (k, s[k], e[k])
    # plan: the only windows are partitioned by grp; no global-sort window
    plan = sampled._jdf.queryExecution().optimizedPlan().toString()
    specs = re.findall(r"windowspecdefinition\((\w+)#", plan)
    assert specs and all(col == "grp" for col in specs), specs
    assert "percentile_approx" in plan


def test_gini_extremes_and_known_value(spark):
    from etdtransform_spark.operators.stats import gini_coefficient

    rows = (
        # perfectly even -> 0
        [("even", 5.0)] * 4
        # fully concentrated: one member holds everything -> (n-1)/n = .75
        + [("conc", 0.0)] * 3 + [("conc", 100.0)]
        # known small case [1,2,3,4]: G = 2*(1+4+9+16)/(4*10) - 5/4 = 0.25
        + [("known", float(v)) for v in (1, 2, 3, 4)]
        # negatives excluded
        + [("neg", -5.0), ("neg", 10.0)]
    )
    df = spark.createDataFrame(rows, ["g", "v"])
    out = {r.g: r for r in gini_coefficient(df, "v", ["g"]).collect()}
    assert out["even"].gini == 0.0
    assert out["conc"].gini == 0.75
    assert out["known"].gini == 0.25
    assert out["neg"].n == 1 and out["neg"].gini == 0.0


def test_zscore_and_seasonal_single_row_groups_not_crashed(spark):
    """n=1 groups/cells have no sample sd: rows get NULL z (never flagged)
    instead of aborting with ANSI DIVIDE_BY_ZERO."""
    from pyspark.sql import functions as F

    from etdtransform_spark.operators.stats import (
        seasonal_residuals,
        zscore_outliers,
    )

    rows = [("g", float(v)) for v in [1, 2, 3, 100]] + [("lone", 42.0)]
    df = spark.createDataFrame(rows, ["k", "v"])
    out = zscore_outliers(df, "v", ["k"], threshold=1.0).collect()
    assert all(r.k == "g" for r in out)  # the lone group never flags

    import datetime as dt

    t0 = dt.datetime(2024, 1, 6, 0)  # midnight
    srows = [("g", t0 + dt.timedelta(days=i), float(v))
             for i, v in enumerate([1, 2, 3, 100])]
    srows.append(("g", t0 + dt.timedelta(hours=5), 7.0))  # only 05:00 row
    sdf = spark.createDataFrame(srows, ["k", "ts", "v"])
    sout = seasonal_residuals(
        sdf, "v", ["k"], season=F.hour("ts"), threshold=1.0
    ).collect()
    assert all(r.ts.hour == 0 for r in sout)  # singleton 05:00 cell silent
