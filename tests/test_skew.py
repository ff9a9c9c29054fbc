"""Unit tests for the skew diagnostics operator."""

from __future__ import annotations

import pytest
def test_skew_profile_hand_computed(spark):
    from etdtransform_spark.operators.skew import skew_profile

    rows = (
        [("hot",)] * 60 + [("warm",)] * 25 + [("cool",)] * 10
        + [(None,)] * 5
    )
    df = spark.createDataFrame(rows, "k string")
    out = {r.rank: r for r in skew_profile(
        df, ["k"], top_k=3, parallelism=100).collect()}
    assert len(out) == 3  # top_k cap
    assert out[1].k == "hot" and out[1].n_rows == 60
    assert out[1].share == pytest.approx(0.6)
    assert out[1].est_reducer_share == pytest.approx(60.0)
    assert out[1].suggested_salt == 60
    assert out[2].k == "warm" and out[2].suggested_salt == 25
    assert out[3].k == "cool" and out[3].suggested_salt == 10

    # NULL keys profile like any value; uniform keys suggest salt 1
    uni = spark.createDataFrame([(i % 50,) for i in range(1000)], "k int")
    u = skew_profile(uni, ["k"], top_k=5, parallelism=10).collect()
    assert all(r.suggested_salt == 1 for r in u)  # 2% share * 10 = 0.2
    nulls = spark.createDataFrame([(None,)] * 9 + [(1,)], "k int")
    n = skew_profile(nulls, ["k"], top_k=1, parallelism=10).collect()[0]
    assert n.k is None and n.share == pytest.approx(0.9)

    empty = spark.createDataFrame([], "k string")
    assert skew_profile(empty, ["k"]).count() == 0
