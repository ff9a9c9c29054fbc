"""Unit tests for statistical profiling operators against independent
references (numpy lstsq, Spark's own corr)."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from etdtransform_spark.operators.stats import (
    groupwise_corr,
    groupwise_ols,
    histogram,
)


def test_ols_matches_numpy(spark):
    rng = np.random.default_rng(7)
    xs = rng.uniform(0, 10, 200)
    ys = 3.5 * xs - 2.0 + rng.normal(0, 0.5, 200)
    df = spark.createDataFrame(
        [("g", float(x), float(y)) for x, y in zip(xs, ys)],
        "g string, x double, y double",
    )
    r = groupwise_ols(df, "x", "y", ["g"]).collect()[0]
    b, a = np.polyfit(xs, ys, 1)
    assert math.isclose(r.slope, b, rel_tol=1e-6)
    assert math.isclose(r.intercept, a, rel_tol=1e-5, abs_tol=1e-5)
    assert 0.97 < r.r2 <= 1.0
    assert r.n == 200


def test_ols_null_pairs_and_degenerate(spark):
    rows = [
        ("a", 1.0, 2.0), ("a", 2.0, 4.0), ("a", None, 9.0), ("a", 3.0, None),
        ("c", 5.0, 1.0), ("c", 5.0, 7.0),  # zero x-variance
    ]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    out = {r.g: r for r in groupwise_ols(df, "x", "y", ["g"]).collect()}
    assert out["a"].n == 2 and math.isclose(out["a"].slope, 2.0)
    assert out["c"].slope is None and out["c"].r2 is None  # no fit on vertical


def test_corr_matches_spark_builtin(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    df = ev.select(
        F.lit("g").alias("g"),
        F.col("o_custkey").cast("double").alias("x"),
        F.col("o_totalprice").alias("y"),
    )
    ours = groupwise_corr(df, "x", "y", ["g"]).collect()[0].pearson_r
    builtin = df.agg(F.corr("x", "y")).collect()[0][0]
    # ours is rounded to 6 decimals by design (cross-engine determinism)
    assert math.isclose(ours, builtin, abs_tol=5e-7)


def test_histogram_clamp_and_nulls(spark):
    rows = [(-5.0,), (0.0,), (9.9,), (10.0,), (199.9,), (250.0,), (None,)]
    df = spark.createDataFrame(rows, "v double")
    out = {r.bin: (r.n, r.bin_start) for r in histogram(df, "v", 0.0, 200.0, 20).collect()}
    assert out[0] == (3, 0.0)     # -5 clamps down, 0.0 and 9.9 in bin 0
    assert out[1] == (1, 10.0)
    assert out[19] == (2, 190.0)  # 199.9 + clamped 250
    assert sum(n for n, _ in out.values()) == 6  # null dropped


def test_spearman_corr_monotone_and_ties(spark):
    from etdtransform_spark.operators.stats import spearman_corr

    mono = spark.createDataFrame(
        [(1.0, 10.0), (2.0, 200.0), (3.0, 3000.0)], "x double, y double"
    )
    r = spearman_corr(mono, "x", "y").collect()[0]
    assert r.n == 3 and r.rho == 1.0
    inv = spark.createDataFrame(
        [(1.0, 9.0), (2.0, 5.0), (3.0, 1.0)], "x double, y double"
    )
    assert spearman_corr(inv, "x", "y").collect()[0].rho == -1.0

    # ties + exclusions vs an independent avg-rank Pearson twin
    rows = [
        (1.0, 2.0), (1.0, 5.0), (2.0, 5.0), (3.0, 1.0), (4.0, 4.0),
        (4.0, 4.0), (5.0, 3.0),
        (None, 1.0), (1.0, None), (float("nan"), 1.0), (1.0, float("nan")),
    ]
    df = spark.createDataFrame(rows, "x double, y double")
    got = spearman_corr(df, "x", "y", digits=9).collect()[0]
    pairs = [(x, y) for x, y in rows
             if x is not None and y is not None
             and x == x and y == y]

    def avg_ranks(vals):
        import collections
        cnt = collections.Counter(vals)
        rank, i = {}, 1
        for v in sorted(cnt):
            c = cnt[v]
            rank[v] = i + (c - 1) / 2.0
            i += c
        return [rank[v] for v in vals]

    rx = avg_ranks([x for x, _ in pairs])
    ry = avg_ranks([y for _, y in pairs])
    n = len(pairs)
    sx, sy = sum(rx), sum(ry)
    sxx = sum(a * a for a in rx)
    syy = sum(a * a for a in ry)
    sxy = sum(a * b for a, b in zip(rx, ry))
    expect = (n * sxy - sx * sy) / (
        (n * sxx - sx * sx) ** 0.5 * (n * syy - sy * sy) ** 0.5
    )
    assert got.n == n and got.rho == pytest.approx(expect, abs=1e-9)


def test_spearman_corr_degenerate(spark):
    from etdtransform_spark.operators.stats import spearman_corr

    const = spark.createDataFrame(
        [(2.0, 1.0), (2.0, 5.0), (2.0, 3.0)], "x double, y double"
    )
    r = spearman_corr(const, "x", "y").collect()[0]
    assert r.n == 3 and r.rho is None  # zero rank variance
    empty = spark.createDataFrame([], "x double, y double")
    r = spearman_corr(empty, "x", "y").collect()[0]
    assert r.n == 0 and r.rho is None


def test_spearman_corr_exact_past_2_53(spark):
    """The DECIMAL(38,0) doubled-rank partials stay EXACT where the old
    double-sum path lost bits: n = 200_001 distinct pairs puts
    sum((2r)^2) ~ 4n^3/3 ~ 2.1e16 > 2^53, and the expected rho —
    computed from exact Python integers pushed through the operator's
    own final double op sequence — must match bit-for-bit."""
    from etdtransform_spark.operators.stats import spearman_corr

    n = 200_001
    a = 7919
    assert math.gcd(a, n) == 1  # y = (a*i) % n is a permutation
    df = spark.range(n).select(
        F.col("id").cast("double").alias("x"),
        F.pmod(F.col("id") * F.lit(a), F.lit(n)).cast("double").alias("y"),
    )
    got = spearman_corr(df, "x", "y", digits=9).collect()[0]

    # exact integer partials of DOUBLED ranks (x-rank of i is i+1;
    # y-rank of i is ((a*i) % n) + 1 — all distinct, no ties)
    sx = sum(2 * (i + 1) for i in range(n))
    sxx = sum((2 * (i + 1)) ** 2 for i in range(n))
    sxy = sum((2 * (i + 1)) * (2 * ((a * i) % n + 1)) for i in range(n))
    assert sxx > 2**53  # the fixture genuinely crosses the double cliff
    # same final op sequence as the operator: each exact partial takes
    # ONE correctly-rounded conversion to double, then IEEE arithmetic
    fn, fsx, fsxx, fsxy = float(n), float(sx), float(sxx), float(sxy)
    vx = fn * fsxx - fsx * fsx
    expect = (fn * fsxy - fsx * fsx) / (math.sqrt(vx) * math.sqrt(vx))
    # y is a permutation so sy/syy mirror sx/sxx exactly
    assert got.n == n
    assert got.rho == pytest.approx(expect, abs=1e-9)
