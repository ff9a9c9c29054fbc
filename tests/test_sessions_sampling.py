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


def test_funnel_ordering_and_window(spark):
    """A purchase BEFORE the first signup must not convert; one inside the
    window does; one outside the window does not."""
    import datetime as dt

    from pyspark.sql import functions as F

    from etdtransform_spark.operators.funnel import funnel_steps

    t0 = dt.datetime(2024, 1, 10, 12, 0, 0)

    def at(**kw):
        return t0 + dt.timedelta(**kw)

    rows = [
        # user 1: purchase before signup (ignored), then within window
        (1, at(days=-1), "purchase"),
        (1, at(), "signup"),
        (1, at(days=2), "purchase"),
        # user 2: purchase only outside the 7-day window
        (2, at(), "signup"),
        (2, at(days=8), "purchase"),
        # user 3: purchase at the exact signup timestamp (inclusive >=)
        (3, at(), "signup"),
        (3, at(), "purchase"),
        # user 4: never signs up -> absent from the funnel
        (4, at(), "purchase"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    out = {
        r.user_id: (r.step1_ts, r.step2_ts)
        for r in funnel_steps(
            df, ["signup", "purchase"], within_seconds=7 * 86400.0
        ).collect()
    }
    assert set(out) == {1, 2, 3}
    assert out[1] == (at(), at(days=2))
    assert out[2] == (at(), None)
    assert out[3] == (at(), at())


def test_retention_offsets(spark):
    import datetime as dt

    from etdtransform_spark.operators.funnel import retention_cohorts

    mon = dt.datetime(2024, 1, 1, 9, 0)  # 2024-01-01 is a Monday
    rows = [
        (1, mon),
        (1, mon + dt.timedelta(days=14, hours=3)),  # active in week 0 and 2
        (2, mon + dt.timedelta(days=7)),            # cohort week 1 only
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {
        (r.cohort_week, r.week_offset): r.n_active
        for r in retention_cohorts(df).collect()
    }
    w0 = dt.datetime(2024, 1, 1)
    w1 = dt.datetime(2024, 1, 8)
    assert got == {(w0, 0): 1, (w0, 2): 1, (w1, 0): 1}


def test_weighted_sample_determinism_and_weight_bias(spark):
    from pyspark.sql import functions as F

    from etdtransform_spark.operators.sessions import weighted_hash_sample

    rows = [(i, 1.0 if i else 1e9) for i in range(500)]  # row 0 dominates
    df = spark.createDataFrame(rows, "id long, w double")
    s1 = [r.id for r in weighted_hash_sample(df, "id", "w", k=50).collect()]
    s2 = [r.id for r in weighted_hash_sample(df, "id", "w", k=50).collect()]
    assert s1 == s2  # fully deterministic, ordered identically
    assert len(s1) == 50
    assert 0 in s1  # the overwhelming weight is always selected
    # different seed -> different sample (the hash actually drives it)
    s3 = [r.id for r in weighted_hash_sample(df, "id", "w", k=50, seed="x").collect()]
    assert s1 != s3


def test_resolve_duplicates_keep_one_per_cluster(spark):
    from etdtransform_spark.operators.dedup import resolve_duplicates

    docs = spark.createDataFrame(
        [(i,) for i in range(1, 8)], ["doc_id"]
    )
    # clusters: {1,2,3} (chain), {5,6}; 4 and 7 singletons
    pairs = spark.createDataFrame(
        [(2, 1), (2, 3), (5, 6)], ["id_a", "id_b"]
    )
    out = {r.doc_id: r for r in resolve_duplicates(docs, pairs).collect()}
    assert {d for d, r in out.items() if r.keep} == {1, 4, 5, 7}
    assert out[3].cluster_id == 1 and out[6].cluster_id == 5
    assert out[4].cluster_id == 4  # singleton keeps itself


def test_session_paths_order_truncation_and_boundary(spark):
    import datetime as dt

    from etdtransform_spark.operators.sessions import session_paths

    t0 = dt.datetime(2024, 5, 1, 8, 0)

    def at(m):
        return t0 + dt.timedelta(minutes=m)

    rows = (
        # session 1: tie at minute 0 ordered by event_id; then a 2h gap
        # within-timeout keeps it one session
        [(1, at(0), "b", 12), (1, at(0), "a", 11), (1, at(120), "c", 13)]
        # session 2 after >6h gap
        + [(1, at(9 * 60), "d", 14)]
    )
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_type", "event_id"])
    out = {r.session_id: r for r in session_paths(
        df, 6 * 3600.0, key_cols=["user_id"], order_cols=["event_id"],
        max_events=2).collect()}
    assert out[1].path == "b>a".replace("b>a", "b>a") or True  # see below
    # tie broken by event_id: 11 before 12 -> "a>b", truncated at 2 events
    assert out[1].path == "a>b" and out[1].truncated and out[1].n_events == 3
    assert out[2].path == "d" and not out[2].truncated


def test_rolling_active_users_window_semantics(spark):
    import datetime as dt

    from etdtransform_spark.operators.sessions import rolling_active_users

    d0 = dt.datetime(2024, 6, 1, 9, 0)

    def day(n):
        return d0 + dt.timedelta(days=n)

    rows = (
        # u1 active day 0 and day 3; u2 active day 0 only; u3 day 9
        [(1, day(0)), (1, day(0)), (1, day(3)), (2, day(0)), (3, day(9))]
    )
    df = spark.createDataFrame(rows, ["user_id", "ts"])
    out = {r.day.isoformat(): r
           for r in rolling_active_users(df, window_days=3).collect()}
    # day0: dau 2 (u1,u2), rolling(3d ending? our window is FORWARD
    # contribution: presence on d contributes to d..d+2, i.e. rolling at
    # day X = users active in [X-2, X])
    assert out["2024-06-01"].dau == 2 and out["2024-06-01"].rolling_active == 2
    # day2: nobody active that day, but day-0 actives still in window
    assert out["2024-06-02"].dau == 0 and out["2024-06-02"].rolling_active == 2
    # day3: u1 re-activates; u2's day-0 presence aged out... day3 window
    # is [1,3]: only u1 -> rolling 1
    assert out["2024-06-04"].dau == 1 and out["2024-06-04"].rolling_active == 1
    # u1 counted once on overlapping windows (active day0 and day3: day
    # window [2,4]... ) and gaps between activity produce rolling>0,dau=0
    assert out["2024-06-05"].rolling_active == 1 and out["2024-06-05"].dau == 0
    # clamped to observed range: last day is day 9
    assert max(out) == "2024-06-10"
