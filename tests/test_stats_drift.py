"""Unit tests for the drift-detection family (stats.ks_2samp,
stats.mann_whitney_u, stats.psi_drift, stats.psi_time_drift,
similarity.embedding_drift) against independent pure-numpy references
(scipy-equivalent formulas, hand-computed PSI) plus path-equivalence
checks: the keyless range-partitioned prefix sum must reproduce the keyed
window path bit-for-bit."""

from __future__ import annotations

import datetime as dt
import math

import numpy as np
from pyspark.sql import functions as F

from etdtransform_spark.operators.similarity import embedding_drift
from etdtransform_spark.operators.stats import (
    ks_2samp,
    mann_whitney_u,
    psi_drift,
    psi_time_drift,
)


def _ks_ref(a, b):
    allv = np.unique(np.concatenate([a, b]))
    fa = np.searchsorted(np.sort(a), allv, side="right") / len(a)
    fb = np.searchsorted(np.sort(b), allv, side="right") / len(b)
    return float(np.max(np.abs(fa - fb)))


def _mwu_ref(a, b):
    """Tie-corrected Mann-Whitney U + normal-approx z (scipy formulas)."""
    x = np.concatenate([a, b])
    n1, n2, n = len(a), len(b), len(x)
    uniq, inv, cnt = np.unique(x, return_inverse=True, return_counts=True)
    avg_rank = np.cumsum(cnt) - (cnt - 1) / 2.0
    r = avg_rank[inv]
    u = float(r[:n1].sum()) - n1 * (n1 + 1) / 2.0
    mu = n1 * n2 / 2.0
    tie = float((cnt.astype(float) ** 3 - cnt).sum())
    var = n1 * n2 / 12.0 * ((n + 1) - tie / (n * (n - 1)))
    z = (u - mu) / math.sqrt(var) if var > 0 else None
    return u, z


def _two_sample_df(spark, a, b, key="g"):
    rows = [(key, "a", float(v)) for v in a] + [(key, "b", float(v)) for v in b]
    return spark.createDataFrame(rows, "g string, s string, v double")


def test_ks_matches_reference_and_paths_agree(spark):
    rng = np.random.default_rng(11)
    a = np.round(rng.normal(0, 1, 300), 2)
    b = np.round(rng.normal(0.4, 1.3, 200), 2)
    df = _two_sample_df(spark, a, b)
    keyed = ks_2samp(df, "v", "s", "a", "b", keys=["g"]).collect()[0]
    keyless = ks_2samp(df, "v", "s", "a", "b").collect()[0]
    expect = _ks_ref(a, b)
    assert keyed.n_a == 300 and keyed.n_b == 200
    assert math.isclose(keyed.d_stat, expect, abs_tol=1e-6)
    # keyless rides the range-partitioned prefix sum; must be bit-identical
    assert keyless.d_stat == keyed.d_stat
    assert (keyless.n_a, keyless.n_b) == (keyed.n_a, keyed.n_b)


def test_ks_empty_sample_is_null(spark):
    rows = [("x", "a", 1.0), ("x", "a", 2.0), ("y", "a", 1.0), ("y", "b", 9.0)]
    df = spark.createDataFrame(rows, "g string, s string, v double")
    out = {r.g: r for r in ks_2samp(df, "v", "s", "a", "b", keys=["g"]).collect()}
    assert out["x"].d_stat is None and out["x"].n_b == 0
    assert out["y"].d_stat == 1.0


def test_mwu_matches_reference_and_paths_agree(spark):
    rng = np.random.default_rng(5)
    # heavy ties: integer values — exercises the tie-corrected variance
    a = rng.integers(0, 25, 250).astype(float)
    b = (rng.integers(0, 25, 180) + 3).astype(float)
    df = _two_sample_df(spark, a, b)
    keyed = mann_whitney_u(df, "v", "s", "a", "b", keys=["g"]).collect()[0]
    keyless = mann_whitney_u(df, "v", "s", "a", "b").collect()[0]
    u, z = _mwu_ref(a, b)
    assert keyed.n_a == 250 and keyed.n_b == 180
    assert math.isclose(keyed.u_stat, u, abs_tol=1e-6)
    assert math.isclose(keyed.z, z, abs_tol=1e-6)
    assert (keyless.u_stat, keyless.z) == (keyed.u_stat, keyed.z)


def test_mwu_degenerate_guards(spark):
    rows = [("one", "a", 5.0), ("emp", "a", 1.0), ("emp", "a", 2.0),
            ("tie", "a", 3.0), ("tie", "b", 3.0)]
    df = spark.createDataFrame(rows, "g string, s string, v double")
    out = {r.g: r for r in
           mann_whitney_u(df, "v", "s", "a", "b", keys=["g"]).collect()}
    assert out["one"].z is None and out["one"].u_stat is None
    assert out["emp"].z is None and out["emp"].n_b == 0
    # all-tied two-sample: var == 0 -> NULL z, but U is defined
    # (R_a = avg rank 1.5, U = 1.5 - 1*(1+1)/2 = 0.5)
    assert out["tie"].z is None and out["tie"].u_stat == 0.5


def _psi_ref(a, b, n_bins=5):
    edges = np.percentile(np.asarray(a, float), [100 * i / n_bins
                                                 for i in range(1, n_bins)])
    def hist(vals):
        bins = np.array([int((v > edges).sum()) + 1 for v in vals])
        return np.array([(bins == i).sum() for i in range(1, n_bins + 1)])
    ca, cb = hist(a), hist(b)
    pa = (ca + 0.5) / (len(a) + 0.5 * n_bins)
    pb = (cb + 0.5) / (len(b) + 0.5 * n_bins)
    return float(((pa - pb) * np.log(pa / pb)).sum())


def test_psi_matches_reference(spark):
    rng = np.random.default_rng(3)
    a = rng.integers(0, 1000, 400).astype(float)
    b = rng.integers(200, 1400, 300).astype(float)
    df = _two_sample_df(spark, a, b)
    got = psi_drift(df, "v", "s", "a", "b", keys=["g"]).collect()[0]
    assert got.n_a == 400 and got.n_b == 300
    assert math.isclose(got.psi, _psi_ref(a, b), abs_tol=1e-6)
    # same-distribution sanity: psi ~ 0
    same = psi_drift(_two_sample_df(spark, a, a), "v", "s", "a", "b",
                     keys=["g"]).collect()[0]
    assert abs(same.psi) < 1e-9


def test_psi_b_only_segment_and_null_key(spark):
    rows = [("x", "a", 1.0), ("x", "a", 2.0), ("x", "b", 3.0),
            ("zb", "b", 7.0), ("zb", "b", 8.0),
            (None, "a", 1.0), (None, "b", 1.0)]
    df = spark.createDataFrame(rows, "g string, s string, v double")
    out = {r.g: r for r in
           psi_drift(df, "v", "s", "a", "b", keys=["g"], n_bins=2).collect()}
    # segment only in sample_b: present, n_a = 0, NULL psi (ADVICE r5)
    assert out["zb"].n_a == 0 and out["zb"].n_b == 2 and out["zb"].psi is None
    # NULL key is a real segment (null-safe joins) with a computed psi
    assert out[None].n_a == 1 and out[None].n_b == 1
    assert out[None].psi is not None
    assert out["x"].psi is not None


def test_psi_empty_bin_full_spine(spark):
    # tied reference quantiles collapse edges: with a = [1,1,1,1,1] all four
    # quintile edges are 1.0, so bins 2..4 are empty in both samples; the
    # full-spine smoothing must still count their Laplace terms (ADVICE r5)
    a = [1.0] * 5
    b = [1.0, 1.0, 9.0]
    got = psi_drift(_two_sample_df(spark, a, b), "v", "s", "a", "b",
                    keys=["g"]).collect()[0]
    assert math.isclose(got.psi, _psi_ref(a, b), abs_tol=5e-7)


def test_psi_keyless_empty_input_no_row(spark):
    df = spark.createDataFrame([], "g string, s string, v double")
    assert psi_drift(df, "v", "s", "a", "b").count() == 0
    assert psi_drift(df, "v", "s", "a", "b", keys=["g"]).count() == 0


def test_psi_time_drift_daily(spark):
    base = dt.datetime(2024, 1, 1)
    rows = []
    # reference: 100 uniform-ish integer values over 2 days
    rng = np.random.default_rng(9)
    ref_vals = rng.integers(0, 100, 100).astype(float)
    for i, v in enumerate(ref_vals):
        rows.append((base + dt.timedelta(minutes=20 * i), float(v)))
    # day 3: same distribution; day 4: shifted
    d3 = rng.integers(0, 100, 60).astype(float)
    d4 = (rng.integers(0, 100, 60) + 60).astype(float)
    ref_end = base + dt.timedelta(days=2)
    for i, v in enumerate(d3):
        rows.append((ref_end + dt.timedelta(minutes=10 * i), float(v)))
    for i, v in enumerate(d4):
        rows.append((ref_end + dt.timedelta(days=1, minutes=10 * i), float(v)))
    df = spark.createDataFrame(rows, "ts timestamp, v double")
    out = {r.bucket_ts: r for r in
           psi_time_drift(df, "v", "ts", ref_end).collect()}
    day3, day4 = ref_end, ref_end + dt.timedelta(days=1)
    assert set(out) == {day3, day4}
    assert out[day3].n_ref == 100 and out[day3].n_cur == 60
    assert math.isclose(out[day3].psi, _psi_ref(ref_vals, d3), abs_tol=1e-6)
    assert math.isclose(out[day4].psi, _psi_ref(ref_vals, d4), abs_tol=1e-6)
    assert out[day4].psi > out[day3].psi  # the shifted day must read as drift


def test_psi_time_drift_empty_reference(spark):
    rows = [(dt.datetime(2024, 5, 2, 3), 1.0), (dt.datetime(2024, 5, 2, 4), 2.0)]
    df = spark.createDataFrame(rows, "ts timestamp, v double")
    out = psi_time_drift(df, "v", "ts", dt.datetime(2024, 5, 1)).collect()
    assert len(out) == 1
    assert out[0].n_ref == 0 and out[0].n_cur == 2 and out[0].psi is None


def test_embedding_drift(spark):
    rng = np.random.default_rng(21)
    va = rng.normal(0, 1, (40, 8))
    vb = va + 0.0  # identical population -> cos 1, shift 0
    vc = rng.normal(3, 1, (30, 8))  # shifted population
    rows = (
        [("same", "a", [float(x) for x in r]) for r in va]
        + [("same", "b", [float(x) for x in r]) for r in vb]
        + [("shift", "a", [float(x) for x in r]) for r in va]
        + [("shift", "b", [float(x) for x in r]) for r in vc]
        + [("only_a", "a", [1.0, 2.0])]
    )
    df = spark.createDataFrame(rows, "g string, s string, embedding array<double>")
    out = {r.g: r for r in
           embedding_drift(df, "embedding", "s", "a", "b", keys=["g"]).collect()}
    assert out["same"].centroid_cos == 1.0
    assert out["same"].centroid_shift == 0.0
    assert out["same"].n_a == 40 and out["same"].n_b == 40
    ca, cc = va.mean(axis=0), vc.mean(axis=0)
    expect_cos = float(ca @ cc / (np.linalg.norm(ca) * np.linalg.norm(cc)))
    expect_shift = float(np.linalg.norm(ca - cc))
    assert math.isclose(out["shift"].centroid_cos, expect_cos, abs_tol=1e-5)
    assert math.isclose(out["shift"].centroid_shift, expect_shift, abs_tol=1e-5)
    # one-sided segment surfaces with the other count 0 and NULL drift
    assert out["only_a"].n_b == 0 and out["only_a"].centroid_cos is None


def test_ks_keyless_plan_uses_bucketed_prefix(spark):
    df = _two_sample_df(spark, [1.0, 2.0, 3.0], [2.0, 4.0])
    plan = ks_2samp(df, "v", "s", "a", "b")._jdf.queryExecution().executedPlan().toString()
    assert "_bkt" in plan  # range-bucketed two-pass path, not a global window
