"""Unit tests for operators/temporal.py (interval coalescing, SCD2 history,
snapshot diff) on handcrafted fixtures."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from etdtransform_spark.operators.temporal import (
    merge_intervals,
    scd2_history,
    snapshot_diff,
)


def _ts(h, m=0):
    return dt.datetime(2024, 1, 1, h, m)


def test_merge_intervals_islands(spark):
    rows = [
        # key 1: [0,1] + [0:30,2] overlap -> island [0,2]; [3,4] separate
        (1, _ts(0), _ts(1)),
        (1, _ts(0, 30), _ts(2)),
        (1, _ts(3), _ts(4)),
        # key 2: nested interval [1,4] contains [2,3] -> one island
        (2, _ts(1), _ts(4)),
        (2, _ts(2), _ts(3)),
    ]
    df = spark.createDataFrame(rows, "k bigint, s timestamp, e timestamp")
    out = merge_intervals(df, ["k"], "s", "e").orderBy("k", "island_start")
    got = [(r.k, r.island_start.hour, r.island_end.hour, r.n_merged)
           for r in out.collect()]
    assert got == [(1, 0, 2, 2), (1, 3, 4, 1), (2, 1, 4, 2)]


def test_merge_intervals_touching_not_split(spark):
    # start == running max end -> NOT a new island (touching coalesces)
    df = spark.createDataFrame(
        [(1, _ts(0), _ts(1)), (1, _ts(1), _ts(2))],
        "k bigint, s timestamp, e timestamp",
    )
    out = merge_intervals(df, ["k"], "s", "e").collect()
    assert len(out) == 1 and out[0].n_merged == 2


def test_scd2_collapses_consecutive_and_closes_versions(spark):
    rows = [
        (1, 1, _ts(0), "a"),
        (1, 2, _ts(1), "a"),   # unchanged -> collapsed
        (1, 3, _ts(2), "b"),   # version change
        (1, 4, _ts(3), "a"),   # back to a -> NEW version (type 2)
        (2, 5, _ts(0), None),  # null attr is a legitimate version
        (2, 6, _ts(1), "x"),
    ]
    df = spark.createDataFrame(
        rows, "k bigint, id bigint, ts timestamp, attr string"
    )
    out = scd2_history(df, ["k"], "attr", "ts", order_cols=["id"])
    got = sorted(
        (
            (r.k, r.attr, r.valid_from.hour,
             r.valid_to.hour if r.valid_to else None)
            for r in out.collect()
        ),
        key=lambda t: (t[0], t[1] or "", t[2]),
    )
    assert got == [
        (1, "a", 0, 2), (1, "a", 3, None), (1, "b", 2, 3),
        (2, None, 0, 1), (2, "x", 1, None),
    ]


def test_snapshot_diff_statuses(spark):
    old = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0)], "k bigint, v double"
    )
    new = spark.createDataFrame(
        [(2, 20.0), (3, 33.0), (4, 40.0)], "k bigint, v double"
    )
    out = snapshot_diff(old, new, ["k"], ["v"])
    got = {r.k: (r.status, r.old_v, r.new_v) for r in out.collect()}
    # k=2 unchanged -> absent
    assert got == {
        1: ("removed", 10.0, None),
        3: ("changed", 30.0, 33.0),
        4: ("added", None, 40.0),
    }


def test_snapshot_diff_null_values_nullsafe(spark):
    old = spark.createDataFrame([(1, None), (2, None)], "k bigint, v double")
    new = spark.createDataFrame([(1, None), (2, 5.0)], "k bigint, v double")
    out = snapshot_diff(old, new, ["k"], ["v"])
    got = {r.k: r.status for r in out.collect()}
    assert got == {2: "changed"}  # null==null is unchanged, null->5 changed


def test_merge_intervals_property_vs_python(spark):
    """Randomized parity: merge_intervals ≡ a pure-Python sweep over many
    generated interval sets (overlaps, nesting, duplicates, touching)."""
    import random

    rng = random.Random(42)
    rows = []
    for k in range(6):
        for _ in range(rng.randint(1, 25)):
            s = rng.randint(0, 500)
            rows.append((k, s, s + rng.randint(0, 60)))
    df = spark.createDataFrame(rows, "k bigint, s bigint, e bigint")
    got = sorted(
        (r.k, r.island_start, r.island_end, r.n_merged)
        for r in merge_intervals(df, ["k"], "s", "e").collect()
    )

    expect = []
    by_key = {}
    for k, s, e in rows:
        by_key.setdefault(k, []).append((s, e))
    for k, ivs in by_key.items():
        ivs.sort()
        cur_s, cur_e, n = ivs[0][0], ivs[0][1], 1
        for s, e in ivs[1:]:
            if s <= cur_e:
                cur_e, n = max(cur_e, e), n + 1
            else:
                expect.append((k, cur_s, cur_e, n))
                cur_s, cur_e, n = s, e, 1
        expect.append((k, cur_s, cur_e, n))
    assert got == sorted(expect)


def test_snapshot_diff_null_key_is_removed_not_added(spark):
    """A null-keyed row present only in OLD must classify as 'removed';
    null keys present in both snapshots match null-safely (one row)."""
    old = spark.createDataFrame(
        [(None, 1.0), (1, 2.0)], "k bigint, v double"
    )
    new = spark.createDataFrame([(1, 2.0)], "k bigint, v double")
    out = {(r.k, r.status) for r in snapshot_diff(old, new, ["k"], ["v"]).collect()}
    assert out == {(None, "removed")}

    both = spark.createDataFrame([(None, 9.0)], "k bigint, v double")
    out2 = snapshot_diff(both, both, ["k"], ["v"]).collect()
    assert out2 == []  # null keys matched -> unchanged -> filtered


def test_snapshot_diff_empty_compare_cols(spark):
    old = spark.createDataFrame([(1,), (2,)], "k bigint")
    new = spark.createDataFrame([(2,), (3,)], "k bigint")
    out = {(r.k, r.status) for r in snapshot_diff(old, new, ["k"], []).collect()}
    assert out == {(1, "removed"), (3, "added")}


def test_time_weighted_avg_hand_computed(spark):
    import datetime as dt

    from etdtransform_spark.operators.temporal import time_weighted_avg

    base = dt.datetime(2024, 1, 1)

    def t(minutes):
        return base + dt.timedelta(minutes=minutes)

    # hourly buckets; key 'a': value 10 holds 0:00-0:30, 20 holds
    # 0:30-1:15 (SPANS the bucket boundary), 40 holds 1:15-1:45,
    # final reading at 1:45 carries no duration
    rows = [
        ("a", t(0), 10.0), ("a", t(30), 20.0), ("a", t(75), 40.0),
        ("a", t(105), 99.0),
        # key 'b': chatty minute then an hour-long state — plain AVG
        # would read ~50; TWA must read the held state's weight
        ("b", t(0), 100.0), ("b", t(1), 0.0), ("b", t(61), 7.0),
        # excluded rows
        (None, t(0), 1.0), ("a", None, 1.0), ("a", t(5), None),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    out = {
        (r.k, r.bucket_ts): r
        for r in time_weighted_avg(df, "ts", "v", 3600, keys=["k"]).collect()
    }
    a0 = out[("a", t(0))]
    # bucket 0: 10*30min + 20*30min over 60min covered -> 15
    assert a0.twa == pytest.approx(15.0)
    assert a0.covered_seconds == pytest.approx(3600.0)
    assert a0.n_readings == 2
    a1 = out[("a", t(60))]
    # bucket 1: 20*15min + 40*30min over 45min -> (300+1200)/45
    assert a1.twa == pytest.approx((20 * 15 + 40 * 30) / 45)
    assert a1.covered_seconds == pytest.approx(45 * 60.0)
    assert a1.n_readings == 2  # the 1:15 and the open 1:45 readings
    b0 = out[("b", t(0))]
    # bucket 0: 100 for 1min, 0 for 59min -> 100/60
    assert b0.twa == pytest.approx(100 / 60)
    b1 = out[("b", t(60))]
    # bucket 1: 0 holds 1:00-1:01 (1min), final 7 at 1:01 carries none
    assert b1.twa == pytest.approx(0.0)
    assert b1.covered_seconds == pytest.approx(60.0)

    # single reading: no duration -> NULL twa, zero coverage
    one = spark.createDataFrame([("x", t(0), 5.0)], "k string, ts timestamp, v double")
    r = time_weighted_avg(one, "ts", "v", 3600, keys=["k"]).collect()[0]
    assert r.twa is None and r.covered_seconds == 0.0 and r.n_readings == 1

    # duplicate timestamps carry zero duration, never negative
    dup = spark.createDataFrame(
        [("x", t(0), 5.0), ("x", t(0), 9.0), ("x", t(10), 1.0)],
        "k string, ts timestamp, v double",
    )
    r = time_weighted_avg(dup, "ts", "v", 3600, keys=["k"]).collect()[0]
    assert r.covered_seconds == pytest.approx(600.0) and r.n_readings == 3
