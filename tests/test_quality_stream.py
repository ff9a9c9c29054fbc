"""The streaming quality monitor (streaming/quality_stream.py) must
reproduce the equivalent batch aggregation exactly: same scores, same
windows, same pass rates — streaming is a deployment mode, not a
different answer."""

from __future__ import annotations

import datetime as dt
import uuid

import pandas as pd
import pyarrow as pa
import pytest
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from etdtransform_spark.operators.classify import hashed_linear_score
from etdtransform_spark.streaming.quality_stream import (
    streaming_quality_monitor,
)

N = 64
WEIGHTS = {b: ((b * 2654435761) % 1000) / 1000.0 - 0.5 for b in range(N)}


def _fixture(tmp_path):
    base = dt.datetime(2024, 3, 1)
    texts = [
        "good clean prose", "bad", "", None, "more sample text here",
        "repeated repeated words", "a b c d e", "one", "two tokens",
    ]
    rows = []
    for day in range(3):
        for i, t in enumerate(texts):
            rows.append((base + dt.timedelta(days=day, minutes=7 * i), t))
    src = tmp_path / "qstream_src"
    src.mkdir()
    pdf = pd.DataFrame(rows, columns=["ts", "txt"])
    pq.write_table(
        pa.Table.from_pandas(pdf, preserve_index=False),
        str(src / "b0.parquet"),
        coerce_timestamps="us",
        allow_truncated_timestamps=True,
    )
    return src, rows


def test_streaming_equals_batch(spark, tmp_path):
    src, rows = _fixture(tmp_path)
    df = spark.createDataFrame(rows, "ts timestamp, txt string")
    scored = hashed_linear_score(df, "txt", WEIGHTS, N, score_col="s")
    batch = {
        r.bucket_ts: r
        for r in scored.filter(F.col("s").isNotNull())
        .groupBy(F.window("ts", "1 day").alias("_w"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.avg("s").alias("avg_score"),
            F.avg((F.col("s") >= 0.5).cast("double")).alias("pass_rate"),
        )
        .select(F.col("_w.start").alias("bucket_ts"), "n", "avg_score", "pass_rate")
        .collect()
    }

    stream = spark.readStream.schema("ts timestamp, txt string").parquet(str(src))
    mon = streaming_quality_monitor(
        stream, "txt", "ts", WEIGHTS, N, threshold=0.5, digits=12
    )
    name = f"qmon_{uuid.uuid4().hex[:8]}"
    q = (
        mon.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r.bucket_ts: r for r in spark.table(name).collect()}
    assert set(got) == set(batch) and len(got) == 3
    for k in batch:
        assert got[k].n == batch[k].n
        # stream side is qround(12), batch side raw
        assert abs(got[k].avg_score - batch[k].avg_score) < 1e-11
        assert abs(got[k].pass_rate - batch[k].pass_rate) < 1e-11
    # every day scored 7 of 9 rows (NULL + empty excluded)
    assert all(r.n == 7 for r in got.values())


def test_streaming_classification_monitor_equals_batch(spark, tmp_path):
    import math

    from etdtransform_spark.streaming.quality_stream import (
        streaming_classification_monitor,
    )

    base = dt.datetime(2024, 7, 1)
    rows = []
    i = 0
    for day in range(3):
        for score, label in [(0.9, 1), (0.8, 0), (0.4, 1), (0.1, 0),
                             (0.7, 1), (None, 1), (0.6, None),
                             (float("nan"), 0), (0.95, float("nan"))]:
            rows.append((base + dt.timedelta(days=day, minutes=13 * i),
                         score, label))
            i += 1
    src = tmp_path / "clsmon"
    src.mkdir()
    pdf = pd.DataFrame(rows, columns=["ts", "score", "label"])
    pq.write_table(
        pa.Table.from_pandas(pdf, preserve_index=False),
        str(src / "a.parquet"),
        coerce_timestamps="us",
        allow_truncated_timestamps=True,
    )
    stream = spark.readStream.schema(
        "ts timestamp, score double, label double"
    ).parquet(str(src))
    mon = streaming_classification_monitor(
        stream, "score", "label", "ts", threshold=0.5, digits=9
    )
    name = f"clsmon_{uuid.uuid4().hex[:8]}"
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
    for r in got.values():
        # per day: 5 complete cases -> tp 2 (0.9,0.7), fp 1 (0.8),
        # tn 1 (0.1), fn 1 (0.4); NULL/NaN excluded
        assert (r.tp, r.fp, r.tn, r.fn) == (2, 1, 1, 1) and r.n == 5
        assert r.accuracy == pytest.approx(0.6, abs=1e-9)
        assert r.precision == pytest.approx(2 / 3, abs=1e-9)
        assert r.recall == pytest.approx(2 / 3, abs=1e-9)


def test_streaming_regression_monitor_equals_batch(spark, tmp_path):
    from etdtransform_spark.streaming.quality_stream import (
        streaming_regression_monitor,
    )

    base = dt.datetime(2024, 7, 1)
    rows = []
    i = 0
    for day in range(3):
        # per day: errors +0.5, -0.5, +1.0, 0.0 -> mae .5, rmse sqrt(1.5/4),
        # bias .25; NULL/NaN rows excluded
        for pred, target in [(2.5, 2.0), (1.5, 2.0), (3.0, 2.0), (2.0, 2.0),
                             (None, 1.0), (1.0, None),
                             (float("nan"), 1.0), (1.0, float("nan"))]:
            rows.append((base + dt.timedelta(days=day, minutes=11 * i),
                         pred, target))
            i += 1
    src = tmp_path / "regmon"
    src.mkdir()
    pdf = pd.DataFrame(rows, columns=["ts", "pred", "target"])
    pq.write_table(
        pa.Table.from_pandas(pdf, preserve_index=False),
        str(src / "a.parquet"),
        coerce_timestamps="us",
        allow_truncated_timestamps=True,
    )
    stream = spark.readStream.schema(
        "ts timestamp, pred double, target double"
    ).parquet(str(src))
    mon = streaming_regression_monitor(stream, "pred", "target", "ts", digits=9)
    name = f"regmon_{uuid.uuid4().hex[:8]}"
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
    for r in got.values():
        assert r.n == 4
        assert r.mae == pytest.approx(0.5, abs=1e-9)
        assert r.rmse == pytest.approx((1.5 / 4) ** 0.5, abs=1e-9)
        assert r.bias == pytest.approx(0.25, abs=1e-9)
