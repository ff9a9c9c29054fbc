"""Unit tests for sessionization and deterministic hash sampling."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from etdtransform_spark.operators.sessions import (
    hash_sample,
    session_stats,
    sessionize,
    stratified_hash_sample,
)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _events(spark):
    rows = [
        # user 1: two sessions (gap of 2h with 30min timeout)
        (1, 1, T0),
        (2, 1, T0 + dt.timedelta(minutes=10)),
        (3, 1, T0 + dt.timedelta(minutes=20)),
        (4, 1, T0 + dt.timedelta(hours=2, minutes=20)),
        (5, 1, T0 + dt.timedelta(hours=2, minutes=25)),
        # user 2: one session
        (6, 2, T0),
        (7, 2, T0 + dt.timedelta(minutes=29)),
    ]
    return spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")


def test_sessionize_boundaries(spark):
    out = sessionize(_events(spark), 1800.0, key_cols=["user_id"])
    got = {r["event_id"]: r["session_id"] for r in out.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 2, 5: 2, 6: 1, 7: 1}


def test_session_stats(spark):
    out = session_stats(_events(spark), 1800.0, key_cols=["user_id"])
    rows = {(r["user_id"], r["session_id"]): r for r in out.collect()}
    assert len(rows) == 3
    s11 = rows[(1, 1)]
    assert s11["n_events"] == 3
    assert s11["session_start"] == T0
    assert s11["duration_seconds"] == 1200.0
    # exactly-at-timeout gap does NOT split (strict >)
    assert rows[(2, 1)]["n_events"] == 2


def test_hash_sample_deterministic_and_pushed(spark):
    df = spark.range(0, 2000).withColumnRenamed("id", "k")
    s1 = {r["k"] for r in hash_sample(df, "k", 10).collect()}
    s2 = {r["k"] for r in hash_sample(df, "k", 10).collect()}
    assert s1 == s2
    assert 100 < len(s1) < 320  # ~10% of 2000, hash-binomial spread
    # larger rate is a superset: bucket < 10 implies bucket < 30
    s3 = {r["k"] for r in hash_sample(df, "k", 30).collect()}
    assert s1 < s3


def test_stratified_hash_sample_exact_k(spark):
    df = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") % 4).alias("g")
    )
    out = stratified_hash_sample(df, "k", ["g"], k=25)
    counts = {r["g"]: r["n"] for r in out.groupBy("g").agg(F.count("*").alias("n")).collect()}
    assert counts == {0: 25, 1: 25, 2: 25, 3: 25}
    # small groups yield the whole group
    tiny = spark.createDataFrame([(i, 0) for i in range(5)], "k long, g long")
    assert stratified_hash_sample(tiny, "k", ["g"], k=25).count() == 5


def test_connected_components_chains(spark):
    from etdtransform_spark.operators.dedup import connected_components

    # two components: a 4-chain (10-11-12-13) and a triangle (20,21,22);
    # 30-40 isolated pair
    edges = spark.createDataFrame(
        [(11, 10), (11, 12), (12, 13), (20, 21), (21, 22), (20, 22), (40, 30)],
        "id_a long, id_b long",
    )
    out = {r["node"]: r["cluster_id"] for r in connected_components(edges).collect()}
    assert out == {10: 10, 11: 10, 12: 10, 13: 10,
                   20: 20, 21: 20, 22: 20, 30: 30, 40: 30}
