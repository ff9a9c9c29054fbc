"""Stage-level decomposition of the streaming family's per-query wall cost.

VERDICT r13 #8: the family's "machinery-bound" status (18 queries, ~2.2 s
wall each) was asserted from the batch kernels being the already-optimized
operators; this script turns the assertion into a measurement. For a few
representative streaming queries it starts the same availableNow memory-sink
stream the registry query runs, then reads the StreamingQueryProgress
``durationMs`` breakdown Spark records per micro-batch:

  - addBatch           = executing the batch kernel (the only data-scaling part)
  - latestOffset/getBatch = source listing / offset resolution
  - queryPlanning      = incremental planner pass
  - walCommit/commitOffsets = checkpoint WAL + offset log (driver fs I/O)
  - triggerExecution   = whole-trigger wall (superset of the above)

plus the OUTSIDE-trigger overhead: query.start() setup + termination wait -
sum(triggerExecution). If addBatch is < ~30 % of total wall, the family is
machinery-bound as claimed and per-operator optimization cannot move it.

Usage: python scripts/streaming_overhead.py   (env: SPARK_GRAFT_SF_DIR/CPUS)
"""

from __future__ import annotations

import json
import os
import sys
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    from etdtransform_spark.session import get_spark
    import __spark_entry__ as e

    spark = get_spark(
        "streaming-overhead",
        master=f"local[{CPUS}]",
        shuffle_partitions=max(CPUS, 32),
    )
    spark.sparkContext.setLogLevel("ERROR")

    def run(name: str, build):
        """build(stream_df) -> (df_to_write, output_mode). Returns timing."""
        t0 = time.perf_counter()
        stream = e._stream_events(spark, SF_DIR)
        out, mode = build(stream)
        qname = f"ovh_{uuid.uuid4().hex[:8]}"
        q = (
            out.writeStream.format("memory")
            .queryName(qname)
            .outputMode(mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        # force the same downstream read the registry query performs
        spark.table(qname).write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        prog = [json.loads(p.json) for p in q.recentProgress]
        keys = (
            "addBatch", "latestOffset", "getBatch", "queryPlanning",
            "walCommit", "commitOffsets", "triggerExecution",
        )
        agg = {k: sum(p.get("durationMs", {}).get(k, 0) for p in prog)
               for k in keys}
        outside = wall * 1000 - agg["triggerExecution"]
        row = {
            "query": name,
            "wall_s": round(wall, 2),
            "n_batches": len(prog),
            **{k: agg[k] for k in keys},
            "outside_trigger_ms": round(outside),
            "kernel_frac": round(agg["addBatch"] / (wall * 1000), 3),
        }
        print(json.dumps(row), flush=True)
        return row

    def b_resample(stream):
        from etdtransform_spark.streaming.resample_stream import (
            streaming_resample,
        )
        s = stream.withColumn("v", e._v_nulled())
        return streaming_resample(
            s, "15min", group_cols=["event_type"], variables={"v": "sum"},
            reading_date="ts", watermark="1 hour",
        ), "complete"

    def b_dedup(stream):
        from etdtransform_spark.streaming.dedup_stream import (
            streaming_distinct,
        )
        return streaming_distinct(
            stream, ["user_id", "event_type"]
        ).select("user_id", "event_type"), "append"

    def b_sessionize(stream):
        from etdtransform_spark.streaming.session_stream import (
            streaming_session_stats,
        )
        return streaming_session_stats(
            stream, gap="6 hours", ts_col="ts", key_cols=["user_id"]
        ), "complete"

    rows = []
    # run each twice: the first pays one-time JIT/codegen; the second is the
    # steady-state the bench's best-of-N reports
    for name, b in (
        ("streaming_resample_15min", b_resample),
        ("streaming_dedup", b_dedup),
        ("streaming_sessionize", b_sessionize),
    ):
        run(name + "#cold", b)
        rows.append(run(name + "#warm", b))

    total = sum(r["wall_s"] for r in rows)
    kernel = sum(r["addBatch"] for r in rows) / 1000
    print(json.dumps({
        "warm_total_wall_s": round(total, 2),
        "warm_kernel_s": round(kernel, 2),
        "warm_kernel_frac": round(kernel / total, 3),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
