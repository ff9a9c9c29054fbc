"""Streaming Elo (streaming/preference_stream.py): the availableNow run
must equal the batch sequential fold (single batch, event-time order),
cross-batch state must carry (two-file maxFilesPerTrigger=1 run ≡ one
fold over the arrival-order concatenation), and exclusions/ties follow
the documented semantics."""

from __future__ import annotations

import datetime as dt
import uuid

import pandas as pd
import pyarrow as pa
import pytest
import pyarrow.parquet as pq

from etdtransform_spark.streaming.preference_stream import (
    _elo_fold,
    streaming_elo,
)

SCHEMA = "ts timestamp, eid long, w string, l string"


def _write(path, rows):
    pdf = pd.DataFrame(rows, columns=["ts", "eid", "w", "l"])
    pq.write_table(
        pa.Table.from_pandas(pdf, preserve_index=False),
        str(path),
        coerce_timestamps="us",
        allow_truncated_timestamps=True,
    )


def _run(spark, src, **opts):
    stream = spark.readStream.schema(SCHEMA)
    for k, v in opts.items():
        stream = stream.option(k, v)
    stream = stream.parquet(str(src))
    elo = streaming_elo(stream, "w", "l", "ts", order_col="eid")
    name = f"elo_{uuid.uuid4().hex[:8]}"
    q = (
        elo.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.table(name).collect()
    top = max((r.seq for r in rows), default=0)
    return {r.item: r for r in rows if r.seq == top}, top


def _rows(day_pairs):
    base = dt.datetime(2024, 5, 1)
    return [
        (base + dt.timedelta(minutes=i), i, w, l)
        for i, (w, l) in enumerate(day_pairs)
    ]


def test_single_comparison_textbook(spark, tmp_path):
    src = tmp_path / "elo1"
    src.mkdir()
    _write(src / "a.parquet", _rows([("A", "B")]))
    got, seq = _run(spark, src)
    # equal ratings: e = .5, delta = 16
    assert seq == 1
    assert got["A"].rating == 1016.0 and got["B"].rating == 984.0
    assert got["A"].wins == 1 and got["B"].wins == 0
    assert got["A"].n_games == got["B"].n_games == 1


def test_stream_equals_batch_fold_and_order(spark, tmp_path):
    pairs = [("A", "B"), ("B", "C"), ("A", "C"), ("C", "A"), ("A", "B"),
             ("B", "A"), ("C", "B"), ("A", "C"), ("B", "C"), ("A", "B")]
    src = tmp_path / "elo2"
    src.mkdir()
    # write SHUFFLED (reverse) row order into the file: the operator must
    # re-impose (ts, eid) order inside the batch
    _write(src / "a.parquet", list(reversed(_rows(pairs))))
    got, seq = _run(spark, src)
    st = {}
    assert _elo_fold(st, pairs, 32.0, 1000.0) == len(pairs) == seq
    assert set(got) == set(st)
    for item, (r, g, w) in st.items():
        assert got[item].rating == r  # bit-identical: same python fold
        assert (got[item].n_games, got[item].wins) == (g, w)


def test_cross_batch_state_carries(spark, tmp_path):
    p1 = [("A", "B"), ("B", "C"), ("A", "C")]
    p2 = [("C", "A"), ("B", "A"), ("D", "A")]  # new item D in batch 2
    src = tmp_path / "elo3"
    src.mkdir()
    r1, r2 = _rows(p1), _rows(p2)
    r2 = [(ts + dt.timedelta(days=1), eid + 100, w, l) for ts, eid, w, l in r2]
    _write(src / "b1.parquet", r1)
    _write(src / "b2.parquet", r2)
    # the file source drains oldest-mtime-first under maxFilesPerTrigger;
    # two writes inside one mtime granule tie and the batch order (which
    # Elo folding is sensitive to) becomes load-dependent — pin it
    import os
    import time

    now = time.time()
    os.utime(src / "b1.parquet", (now - 10, now - 10))
    os.utime(src / "b2.parquet", (now, now))
    got, seq = _run(spark, src, maxFilesPerTrigger=1)
    st = {}
    _elo_fold(st, p1 + p2, 32.0, 1000.0)
    assert seq == 6
    assert set(got) == {"A", "B", "C", "D"}
    for item, (r, g, w) in st.items():
        assert got[item].rating == r
        assert (got[item].n_games, got[item].wins) == (g, w)


def test_exclusions_skip_without_seq(spark, tmp_path):
    rows = _rows([("A", "B"), ("A", "A"), (None, "B"), ("B", None), ("B", "A")])
    src = tmp_path / "elo4"
    src.mkdir()
    _write(src / "a.parquet", rows)
    got, seq = _run(spark, src)
    assert seq == 2  # only the two valid comparisons consumed sequence
    assert set(got) == {"A", "B"}
    st = {}
    _elo_fold(st, [("A", "B"), ("B", "A")], 32.0, 1000.0)
    assert got["A"].rating == st["A"][0] and got["B"].rating == st["B"][0]


def test_streaming_position_bias_equals_batch(spark, tmp_path):
    import uuid

    from pyspark.sql import functions as F

    from etdtransform_spark.streaming.preference_stream import (
        streaming_position_bias,
    )

    st = {"A": 1.5, "B": 1.0, "C": 0.5}
    base = dt.datetime(2024, 6, 1)
    rows = []
    i = 0
    for day in range(3):
        for f, s in [("A", "B"), ("B", "A"), ("A", "C"), ("C", "B")] * 5:
            # judge favors position 1 on 3 of 4 votes regardless of item
            w = f if i % 4 != 0 else s
            rows.append((base + dt.timedelta(days=day, minutes=i % 300), f, s, w))
            i += 1
        # excluded rows: self, NULL, unknown item, winner not a side
        rows.append((base + dt.timedelta(days=day), "A", "A", "A"))
        rows.append((base + dt.timedelta(days=day), None, "B", "B"))
        rows.append((base + dt.timedelta(days=day), "A", "Z", "A"))
        rows.append((base + dt.timedelta(days=day), "A", "B", "C"))
    src = tmp_path / "pbstream"
    src.mkdir()
    pdf = pd.DataFrame(rows, columns=["ts", "f", "s", "w"])
    pq.write_table(
        pa.Table.from_pandas(pdf, preserve_index=False),
        str(src / "a.parquet"),
        coerce_timestamps="us",
        allow_truncated_timestamps=True,
    )
    stream = spark.readStream.schema(
        "ts timestamp, f string, s string, w string"
    ).parquet(str(src))
    mon = streaming_position_bias(stream, "f", "s", "w", "ts", st, digits=9)
    name = f"pb_{uuid.uuid4().hex[:8]}"
    q = (
        mon.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r.bucket_ts: r for r in spark.table(name).collect()}
    assert len(got) == 3
    # batch twin in python
    import math

    per_day = {}
    for ts, f, s, w in rows:
        if (f is None or s is None or w is None or f == s
                or w not in (f, s) or f not in st or s not in st):
            continue
        d = ts.date()
        p = st[f] / (st[f] + st[s])
        n, w1, e1, v = per_day.get(d, (0, 0, 0.0, 0.0))
        per_day[d] = (n + 1, w1 + (w == f), e1 + p, v + p * (1 - p))
    for key, r in got.items():
        n, w1, e1, v = per_day[key.date()]
        assert r.n == n == 20 and r.wins == w1
        assert r.win_rate == pytest.approx(w1 / n, abs=1e-9)
        assert r.expected_rate == pytest.approx(e1 / n, abs=1e-9)
        assert r.z == pytest.approx((w1 - e1) / math.sqrt(v), abs=1e-6)
        assert r.z > 1.5  # planted position-1 bias visible per window


def test_zero_applied_batch_emits_nothing(spark, tmp_path):
    """A micro-batch with rows but no VALID comparison must not re-emit
    the snapshot under an unchanged seq (it would duplicate every item
    in the consumer's seq = max(seq) view)."""
    src = tmp_path / "elo5"
    src.mkdir()
    _write(src / "b1.parquet", _rows([("A", "B"), ("B", "C")]))
    bad = [(dt.datetime(2024, 5, 2), 50, "A", "A"),
           (dt.datetime(2024, 5, 2), 51, None, "B")]
    _write(src / "b2.parquet", bad)
    import uuid

    stream = spark.readStream.schema(SCHEMA).option(
        "maxFilesPerTrigger", 1
    ).parquet(str(src))
    elo = streaming_elo(stream, "w", "l", "ts", order_col="eid")
    name = f"elo_{uuid.uuid4().hex[:8]}"
    q = (
        elo.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.table(name).collect()
    top = max(r.seq for r in rows)
    assert top == 2
    snap = [r for r in rows if r.seq == top]
    # RAW row check: exactly one row per item at the top seq — the
    # zero-applied batch must not have re-emitted the snapshot
    assert sorted(r.item for r in snap) == ["A", "B", "C"]
    st = {}
    _elo_fold(st, [("A", "B"), ("B", "C")], 32.0, 1000.0)
    for r in snap:
        assert r.rating == st[r.item][0]
