"""The streaming drift monitor (streaming/drift_stream.py) must reproduce
the batch psi_time_drift dashboard exactly: same edges, same windows, same
PSI — streaming is a deployment mode, not a different answer."""

from __future__ import annotations

import datetime as dt
import time

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from pyspark.sql import functions as F

from etdtransform_spark.operators.stats import psi_time_drift
from etdtransform_spark.streaming.drift_stream import (
    psi_from_binned_counts,
    streaming_metric_bins,
)


def _fixture(tmp_path):
    base = dt.datetime(2024, 3, 1)
    rng = np.random.default_rng(17)
    rows = []
    ref_vals = rng.integers(0, 50, 120).astype(float)
    for i, v in enumerate(ref_vals):
        rows.append((base + dt.timedelta(minutes=15 * i), float(v)))
    ref_end = base + dt.timedelta(days=2)
    d1 = rng.integers(0, 50, 80).astype(float)
    d2 = (rng.integers(0, 50, 70) + 30).astype(float)
    for i, v in enumerate(d1):
        rows.append((ref_end + dt.timedelta(minutes=10 * i), float(v)))
    for i, v in enumerate(d2):
        rows.append((ref_end + dt.timedelta(days=1, minutes=10 * i), float(v)))
    src = tmp_path / "stream_src"
    src.mkdir()
    pdf = pd.DataFrame(rows, columns=["ts", "v"])
    pq.write_table(
        pa.Table.from_pandas(pdf, preserve_index=False),
        str(src / "b0.parquet"),
        coerce_timestamps="us",
        allow_truncated_timestamps=True,
    )
    return src, rows, ref_end


def test_streaming_psi_equals_batch(spark, tmp_path):
    src, rows, ref_end = _fixture(tmp_path)
    df = spark.createDataFrame(rows, "ts timestamp, v double")
    batch = {r.bucket_ts: r for r in
             psi_time_drift(df, "v", "ts", ref_end, n_bins=5).collect()}

    # freeze the reference artifact offline, exactly as deployed
    n_bins = 5
    ref = df.filter(F.col("ts") < F.lit(ref_end))
    edges = ref.agg(
        F.percentile(F.col("v").cast("double"),
                     F.array(*[F.lit(i / n_bins) for i in range(1, n_bins)]))
        .alias("e")
    ).collect()[0].e
    arr = F.array(*[F.lit(float(e)) for e in edges])
    ref_bins = ref.groupBy(
        (F.size(F.filter(arr, lambda e: F.col("v") > e)) + F.lit(1))
        .alias("bin")
    ).agg(F.count(F.lit(1)).alias("n"))

    stream = (
        spark.readStream.schema("ts timestamp, v double").parquet(str(src))
    )
    bins = streaming_metric_bins(
        stream.filter(F.col("ts") >= F.lit(ref_end)), "v", "ts", edges
    )
    name = f"drift_{int(time.time() * 1000)}"
    q = (
        bins.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {
        r.bucket_ts: r
        for r in psi_from_binned_counts(
            spark.table(name), ref_bins, n_bins
        ).collect()
    }
    assert set(streamed) == set(batch) and len(streamed) == 2
    for k in batch:
        assert streamed[k].psi == batch[k].psi  # bit-identical, not close
        assert streamed[k].n_ref == batch[k].n_ref
        assert streamed[k].n_cur == batch[k].n_cur


def test_psi_from_bins_empty_reference(spark):
    cur = spark.createDataFrame(
        [(dt.datetime(2024, 1, 5), 1, 10), (dt.datetime(2024, 1, 5), 3, 5)],
        "bucket_ts timestamp, bin int, n bigint",
    )
    ref = spark.createDataFrame([], "bin int, n bigint")
    out = psi_from_binned_counts(cur, ref, 5).collect()
    assert len(out) == 1
    assert out[0].n_ref == 0 and out[0].n_cur == 15 and out[0].psi is None
