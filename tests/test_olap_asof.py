"""Unit tests for asof_join, range_join, simhash_near_dup, tfidf and the
OLAP batch — the semantics the SQL oracle can't probe directly (tolerance,
direction, bucket-granularity invariance, pigeonhole recall)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from etdtransform_spark.operators.asof import asof_join
from etdtransform_spark.operators.olap import (
    count_distinct_agg,
    pivot_table,
    rollup_stats,
    sliding_window_agg,
    top_k,
)
from etdtransform_spark.operators.rangejoin import range_join


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def _asof_fixture(spark):
    left = spark.createDataFrame(
        [
            (1, 1, _ts("2024-01-01 10:00:00")),
            (2, 1, _ts("2024-01-01 12:00:00")),
            (3, 1, _ts("2024-01-01 09:00:00")),  # before any right row
            (4, 2, _ts("2024-01-01 10:30:00")),  # exact-timestamp match
            (5, 3, _ts("2024-01-01 10:00:00")),  # user with no right rows
        ],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 09:30:00"), 100.0),
            (1, _ts("2024-01-01 11:00:00"), 200.0),
            (2, _ts("2024-01-01 10:30:00"), 300.0),
        ],
        "user_id long, ts timestamp, price double",
    )
    return left, right


def test_asof_backward_matches_latest_at_or_before(spark):
    left, right = _asof_fixture(spark)
    out = asof_join(left, right, on="ts", by=["user_id"], value_cols=["price"])
    got = {r.event_id: (r.asof_ts, r.asof_price) for r in out.collect()}
    assert got[1] == (_ts("2024-01-01 09:30:00"), 100.0)
    assert got[2] == (_ts("2024-01-01 11:00:00"), 200.0)
    assert got[3] == (None, None)  # nothing at or before
    assert got[4] == (_ts("2024-01-01 10:30:00"), 300.0)  # inclusive ==
    assert got[5] == (None, None)  # key never on right
    assert out.count() == left.count()  # left-join row preservation


def test_asof_forward_and_tolerance(spark):
    left, right = _asof_fixture(spark)
    fwd = asof_join(
        left, right, on="ts", by=["user_id"], value_cols=["price"],
        direction="forward",
    )
    got = {r.event_id: r.asof_price for r in fwd.collect()}
    assert got[1] == 200.0  # next right row at 11:00
    assert got[2] is None  # nothing after 12:00
    assert got[3] == 100.0
    assert got[4] == 300.0  # inclusive ==


def test_asof_tolerance_nulls_far_matches(spark):
    left, right = _asof_fixture(spark)
    tol = asof_join(
        left, right, on="ts", by=["user_id"], value_cols=["price"],
        tolerance_seconds=600.0,
    )
    got = {r.event_id: (r.asof_ts, r.asof_price) for r in tol.collect()}
    assert got[1] == (None, None)  # 1800 s gap > 600 s tolerance
    assert got[4] == (_ts("2024-01-01 10:30:00"), 300.0)  # 0 s gap kept


def test_asof_null_payload_field_still_matches(spark):
    left = spark.createDataFrame(
        [(1, 1, _ts("2024-01-01 10:00:00"))],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01 09:00:00"), None)],
        "user_id long, ts timestamp, price double",
    )
    out = asof_join(left, right, on="ts", by=["user_id"], value_cols=["price"])
    row = out.collect()[0]
    # the MATCH exists (ts carried) even though the payload field is null
    assert row.asof_ts == _ts("2024-01-01 09:00:00")
    assert row.asof_price is None


def test_range_join_equals_naive_inequality_join(spark):
    intervals = spark.createDataFrame(
        [
            (10, _ts("2024-01-01 00:30:00"), _ts("2024-01-01 05:10:00")),
            (20, _ts("2024-01-01 04:00:00"), _ts("2024-01-01 04:00:00")),  # point interval
            (30, _ts("2024-01-02 00:00:00"), _ts("2024-01-02 01:00:00")),  # empty
        ],
        "iv_id long, session_start timestamp, session_end timestamp",
    )
    points = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 00:30:00")),  # == start boundary
            (2, _ts("2024-01-01 03:59:59")),
            (3, _ts("2024-01-01 04:00:00")),  # in both intervals
            (4, _ts("2024-01-01 05:10:00")),  # == end boundary
            (5, _ts("2024-01-01 06:00:00")),  # in none
        ],
        "pt_id long, ts timestamp",
    )
    for g in (60, 3600, 86400):  # result must be granularity-invariant
        got = sorted(
            (r.iv_id, r.pt_id)
            for r in range_join(points, intervals, granularity_seconds=g).collect()
        )
        assert got == [(10, 1), (10, 2), (10, 3), (10, 4), (20, 3)], g


def test_range_join_with_by_keys(spark):
    intervals = spark.createDataFrame(
        [(1, 10, _ts("2024-01-01 00:00:00"), _ts("2024-01-01 23:59:00"))],
        "user_id long, iv_id long, session_start timestamp, session_end timestamp",
    )
    points = spark.createDataFrame(
        [(1, 100, _ts("2024-01-01 12:00:00")), (2, 200, _ts("2024-01-01 12:00:00"))],
        "user_id long, pt_id long, ts timestamp",
    )
    got = [
        r.pt_id
        for r in range_join(points, intervals, by=["user_id"]).collect()
    ]
    assert got == [100]  # user 2's point excluded by the equi-key


def test_simhash_near_dup_pigeonhole_recall(spark):
    """Banded candidates must find every pair the brute-force comparison
    finds (recall 1 for hamming <= bands-1)."""
    from etdtransform_spark.operators.dedup import simhash, simhash_near_dup

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "alpha beta gamma delta epsilon zeta"),  # exact dup -> hamming 0
            (3, "alpha beta gamma delta epsilon eta"),  # near dup
            (4, "totally different words entirely here now"),
        ],
        "doc_id long, text string",
    )
    banded = {
        (r.id_a, r.id_b): r.hamming
        for r in simhash_near_dup(docs, bits=16, bands=4, max_hamming=3).collect()
    }
    sigs = {r.id: r.simhash for r in simhash(docs, bits=16).collect()}
    brute = {}
    ids = sorted(sigs)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            h = bin(sigs[a] ^ sigs[b]).count("1")
            if h <= 3:
                brute[(a, b)] = h
    assert banded == brute
    assert banded[(1, 2)] == 0  # the exact dup pair is present


def test_top_k_deterministic_under_ties(spark):
    df = spark.createDataFrame(
        [(1, 5.0), (2, 5.0), (3, 5.0), (4, 1.0)], "id long, v double"
    )
    got = [r.id for r in top_k(df, [F.col("v").desc(), F.col("id").asc()], 2).collect()]
    assert got == [1, 2]


def test_rollup_grouping_indicators(spark):
    df = spark.createDataFrame(
        [("a", "x", 1.0), ("a", "y", 2.0), ("b", "x", 3.0)], "k1 string, k2 string, v double"
    )
    out = rollup_stats(df, ["k1", "k2"], [F.sum("v").alias("s")]).collect()
    rows = {(r.k1, r.k2, r.grouping_k1, r.grouping_k2): r.s for r in out}
    assert rows[("a", "x", 0, 0)] == 1.0
    assert rows[("a", None, 0, 1)] == 3.0  # subtotal over k2
    assert rows[(None, None, 1, 1)] == 6.0  # grand total
    assert len(out) == 3 + 2 + 1


def test_pivot_and_count_distinct(spark):
    df = spark.createDataFrame(
        [(1, "a"), (1, "a"), (1, "b"), (2, "b")], "uid long, t string"
    )
    wide = {
        r.uid: (r.a, r.b)
        for r in pivot_table(df, "uid", "t", ["a", "b"], F.count(F.lit(1)))
        .na.fill(0)
        .collect()
    }
    assert wide == {1: (2, 1), 2: (0, 1)}
    cd = {
        r.t: (r.n_uid, r.n_rows)
        for r in count_distinct_agg(df, ["t"], "uid").collect()
    }
    assert cd == {"a": (1, 2), "b": (2, 2)}
    # HLL path returns the same counts at this tiny cardinality
    cda = {
        r.t: r.n_uid
        for r in count_distinct_agg(df, ["t"], "uid", approx=True).collect()
    }
    assert cda == {"a": 1, "b": 2}


def test_sliding_window_two_windows_per_row(spark):
    df = spark.createDataFrame(
        [(_ts("2024-01-01 00:07:00"), 1.0)], "ts timestamp, v double"
    )
    out = sliding_window_agg(
        df, "ts", "30 minutes", "15 minutes", [F.sum("v").alias("s")]
    ).collect()
    starts = sorted(r.window_start for r in out)
    assert starts == [_ts("2023-12-31 23:45:00"), _ts("2024-01-01 00:00:00")]


def test_tfidf_weights_and_rank(spark):
    from etdtransform_spark.operators.text import tfidf_top_terms

    docs = spark.createDataFrame(
        [
            (1, "apple apple banana"),
            (2, "banana cherry"),
        ],
        "doc_id long, text string",
    )
    out = tfidf_top_terms(docs, k=2).collect()
    by_doc: dict = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append((r.rank, r.term, r.tf, r.df, r.weight))
    # banana appears in both docs -> ln(2/2)=0 weight; unique terms win
    d1 = sorted(by_doc[1])
    assert d1[0][1] == "apple" and d1[0][2] == 2 and d1[0][3] == 1
    assert d1[0][4] > 0
    assert d1[1][1] == "banana" and d1[1][4] == 0.0
    d2 = sorted(by_doc[2])
    assert d2[0][1] == "cherry" and d2[1][1] == "banana"


def test_asof_join_null_timestamps(spark):
    """Null-timestamp right rows never match; null-timestamp left rows stay
    unmatched (both directions)."""
    import datetime as dt

    from etdtransform_spark.operators.asof import asof_join

    t = dt.datetime(2024, 1, 1, 1)
    left = spark.createDataFrame(
        [(1, 1, dt.datetime(2024, 1, 1, 0)), (2, 1, None)],
        "lid bigint, key bigint, ts timestamp",
    )
    right = spark.createDataFrame(
        [(1, t, 100.0), (1, None, -1.0)],
        "key bigint, ts timestamp, price double",
    )
    back = asof_join(left, right, on="ts", by=["key"], value_cols=["price"],
                     direction="backward")
    got_b = {r.lid: r.asof_price for r in back.collect()}
    assert got_b == {1: None, 2: None}
    fwd = asof_join(left, right, on="ts", by=["key"], value_cols=["price"],
                    direction="forward")
    got_f = {r.lid: r.asof_price for r in fwd.collect()}
    assert got_f == {1: 100.0, 2: None}
