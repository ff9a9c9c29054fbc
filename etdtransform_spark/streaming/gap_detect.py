"""Stateful streaming gap detection via ``applyInPandasWithState``.

The batch engine finds meter gaps with lag windows (operators/impute.py,
reference vectorized_impute.py:343-426); on an unbounded stream the
equivalent needs per-key state that survives across micro-batches: the last
seen timestamp of every key. This module implements that custom stateful
operator — the canonical Structured Streaming escape hatch for semantics
tumbling/sliding windows can't express.

Scale notes: state is one timestamp per key, partitioned by the grouping
key across executors by the streaming state store; each micro-batch
shuffles only its own rows. Arrow-batched pandas per group — no
row-at-a-time Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "last_us long"


def streaming_gap_detect(
    stream: DataFrame,
    gap_seconds: float = 86400.0,
    ts_col: str = "ts",
    key_col: str = "user_id",
    id_col: str = "event_id",
    key_type: str = "long",
) -> DataFrame:
    """Emit one row per detected gap: consecutive events of the same key more
    than ``gap_seconds`` apart. State carries the last event time per key, so
    a gap spanning a micro-batch boundary is still detected.

    On a single complete batch this reduces to the lag-window batch query
    (``ts - lag(ts) > gap_seconds``), which is how the oracle verifies it.

    The output key column carries ``key_col``'s name and ``key_type`` (the
    schema string must be static before the stream starts).
    """
    out_schema = (
        f"{key_col} {key_type}, gap_start timestamp, gap_end timestamp, "
        "gap_seconds double"
    )

    def detect(key, pdf_iter, state: GroupState):
        import pandas as pd

        last_us = state.get[0] if state.exists else None
        # Concatenate BEFORE sorting: a key whose micro-batch rows exceed
        # one Arrow chunk arrives as several frames in arbitrary order —
        # sorting each chunk independently would walk time backwards across
        # chunk boundaries (false gaps + missed real ones). Per-key batch
        # volume bounds the concat, not stream length.
        frames = [pdf for pdf in pdf_iter if len(pdf)]
        out_rows = []
        if frames:
            pdf = pd.concat(frames, ignore_index=True).sort_values(
                [ts_col, id_col]
            )
            # robust to pandas datetime64 unit (ns under legacy Arrow, us
            # under Spark 4 defaults)
            us = pdf[ts_col].to_numpy().astype("datetime64[us]").astype("int64")
            for t in us:
                if last_us is not None and (t - last_us) / 1e6 > gap_seconds:
                    out_rows.append(
                        (
                            key[0],
                            pd.Timestamp(last_us * 1000),
                            pd.Timestamp(t * 1000),
                            (t - last_us) / 1e6,
                        )
                    )
                last_us = int(t)
        if last_us is not None:
            state.update((last_us,))
        out = pd.DataFrame(
            out_rows, columns=[key_col, "gap_start", "gap_end", "gap_seconds"]
        )
        if not out_rows:
            # typed empty frame — an untyped one trips pandas concat
            # dtype-inference warnings inside the Arrow serializer
            out = out.astype(
                {
                    key_col: "object" if key_type == "string" else "int64",
                    "gap_start": "datetime64[ns]",
                    "gap_end": "datetime64[ns]",
                    "gap_seconds": "float64",
                }
            )
        yield out

    return stream.groupBy(key_col).applyInPandasWithState(
        detect,
        outputStructType=out_schema,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
