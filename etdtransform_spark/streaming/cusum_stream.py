"""Stateful streaming CUSUM drift alarm via ``applyInPandasWithState``.

The batch engine computes Page's CUSUM with the prefix identity
(operators/stats.py:cusum_drift — C⁺ = S − min(0, running-min S), two
windows); on an unbounded stream the same recursion needs per-key state
that survives micro-batches: the running sums, their running extrema, the
max CUSUM values seen, the row count, and the first alarm index. This is
the sequential detector's NATURAL deployment shape — the batch operator
answers "did the metric drift?", this one raises the alarm while the
stream is still flowing.

State is eight scalars per key, partitioned across executors by the
streaming state store; each micro-batch shuffles only its own rows and the
per-key work is vectorized numpy (cumsum + accumulate), never
row-at-a-time Python. Ordering discipline matches streaming_gap_detect:
rows are sorted (ts, id) WITHIN a micro-batch after concatenating all
Arrow chunks, and batches are assumed to arrive in event-time order per
key (true for availableNow over time-partitioned files; a production
deployment adds a watermark + sort buffer upstream if arrival can invert).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

# sp/sn: running sums of (x − target ∓ slack); spmin/snmax: their running
# extrema INCLUDING the virtual S_0 = 0; mcp/mcn: max CUSUM so far;
# n: rows seen; first_idx: 1-based first threshold crossing (-1 = none)
STATE_SCHEMA = (
    "sp double, spmin double, sn double, snmax double, "
    "mcp double, mcn double, n long, first_idx long"
)


def streaming_cusum(
    stream: DataFrame,
    value_col: str,
    target: float,
    slack: float = 0.0,
    threshold: float = 0.0,
    key_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    key_type: str = "string",
) -> DataFrame:
    """Per-key streaming CUSUM summary, one row per key per micro-batch
    (take the latest row per key — ``n`` is monotone): (key, n,
    max_cusum_pos, max_cusum_neg, alarm, first_alarm_idx). On a single
    complete batch this reduces exactly to the batch
    ``cusum_drift(..., threshold=...)`` summary, which is how the oracle
    verifies it. NULL/NaN values must be filtered upstream (the batch
    operator's exclusion rule)."""
    out_schema = (
        f"{key_col} {key_type}, n long, max_cusum_pos double, "
        "max_cusum_neg double, alarm int, first_alarm_idx long"
    )

    def step(key, pdf_iter, state: GroupState):
        import numpy as np
        import pandas as pd

        if state.exists:
            sp, spmin, sn, snmax, mcp, mcn, n, first = state.get
        else:
            sp, spmin, sn, snmax, mcp, mcn, n, first = (
                0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0, -1
            )
        frames = [pdf for pdf in pdf_iter if len(pdf)]
        if frames:
            pdf = pd.concat(frames, ignore_index=True).sort_values(
                [ts_col, id_col]
            )
            x = pdf[value_col].to_numpy(dtype=float)
            sp_arr = sp + np.cumsum(x - target - slack)
            sn_arr = sn + np.cumsum(x - target + slack)
            run_min = np.minimum(np.minimum.accumulate(sp_arr), spmin)
            run_max = np.maximum(np.maximum.accumulate(sn_arr), snmax)
            cp = sp_arr - run_min
            cn = run_max - sn_arr
            idx = n + 1 + np.arange(len(x))
            crossed = (cp > threshold) | (cn > threshold)
            if first < 0 and crossed.any():
                first = int(idx[crossed.argmax()])
            sp, sn = float(sp_arr[-1]), float(sn_arr[-1])
            spmin, snmax = float(run_min[-1]), float(run_max[-1])
            mcp = max(mcp, float(cp.max()))
            mcn = max(mcn, float(cn.max()))
            n += len(x)
        state.update((sp, spmin, sn, snmax, mcp, mcn, n, first))
        # first_alarm_idx must be a TYPED nullable int column: a bare
        # [None] makes an all-NA object column, and pyspark's Arrow
        # serializer concat then emits a pandas FutureWarning per batch
        # (bench-tail noise that masks real stacks)
        yield pd.DataFrame(
            {
                key_col: [key[0]],
                "n": [n],
                "max_cusum_pos": [mcp],
                "max_cusum_neg": [mcn],
                "alarm": [1 if first >= 0 else 0],
                "first_alarm_idx": pd.array(
                    [first if first >= 0 else None], dtype="Int64"
                ),
            }
        )

    return (
        stream.groupBy(key_col)
        .applyInPandasWithState(
            step,
            outputStructType=out_schema,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
