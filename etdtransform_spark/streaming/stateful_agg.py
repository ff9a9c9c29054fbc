"""Running per-key streaming aggregate with a pluggable state backend:
Spark 4's transformWithStateInPandas when its runtime is available,
applyInPandasWithState otherwise.

``transformWithStateInPandas`` is the successor stateful API — named,
typed, independently-evolvable state variables (value/list/map), TTL and
timers — but its Python state server needs ``protobuf``, which not every
deployment ships (this container does not). The operator contract here is
identical under both backends: each micro-batch folds its rows into one
fixed-width state tuple per key and emits the key's updated running
totals (update-mode semantics), so the sink always holds the latest
running aggregate. State scales with keys, never with the stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_OUT_SCHEMA = (
    "key long, n bigint, sum_value double, min_value double, max_value double"
)


def _fold(carry, vals):
    """Fold a batch's values into the (n, s, mn, mx) running tuple —
    shared by both backends so their semantics cannot drift."""
    n, s, mn, mx = carry
    if len(vals) == 0:
        return carry
    n += int(len(vals))
    s += float(vals.sum())
    bmn, bmx = float(vals.min()), float(vals.max())
    mn = bmn if mn is None else min(mn, bmn)
    mx = bmx if mx is None else max(mx, bmx)
    return n, s, mn, mx


def transform_with_state_available() -> bool:
    """The transformWithState Python runtime requires protobuf."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def _tws_processor(value_col: str):
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class RunningAggProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "running", "n bigint, s double, mn double, mx double"
            )

        def handleInputRows(self, key, rows, timerValues):
            import pandas as pd

            carry = (0, 0.0, None, None)
            if self._state.exists():
                carry = tuple(self._state.get())
            for pdf in rows:
                carry = _fold(carry, pdf[value_col].dropna())
            self._state.update(carry)
            n, s, mn, mx = carry
            yield pd.DataFrame(
                {
                    "key": [key[0]],
                    "n": [n],
                    # the running sum is 0.0 internally, but a key that has
                    # never seen a non-null value reports NULL (SQL sum
                    # semantics — the batch-oracle sum of all-NULLs is NULL)
                    "sum_value": [s if n > 0 else None],
                    "min_value": [mn],
                    "max_value": [mx],
                }
            )

        def close(self) -> None:
            pass

    return RunningAggProcessor()


def streaming_running_agg(
    stream_df: DataFrame,
    key_col: str,
    value_col: str = "value",
    backend: str | None = None,
) -> DataFrame:
    """Update-mode running aggregate per key over an unbounded stream.

    Output schema: (key, n, sum_value, min_value, max_value) — one row per
    key per micro-batch that touched it, carrying totals over ALL batches
    so far. ``backend`` forces "tws" (transformWithStateInPandas) or
    "apws" (applyInPandasWithState); default picks tws when its protobuf
    runtime imports, else apws. Both partition state by the key across
    the state store; a key's state is one fixed-width tuple.
    """
    if backend is None:
        backend = "tws" if transform_with_state_available() else "apws"
    grouped = stream_df.select(
        stream_df[key_col].alias("key"), stream_df[value_col].alias("_v")
    ).groupBy("key")
    if backend == "tws":
        return grouped.transformWithStateInPandas(
            statefulProcessor=_tws_processor("_v"),
            outputStructType=_OUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    if backend != "apws":
        raise ValueError(f'unknown backend "{backend}"')

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdf_iter, state: GroupState):
        import pandas as pd

        carry = (0, 0.0, None, None)
        if state.exists:
            n0, s0, mn0, mx0 = state.get
            carry = (n0, s0, mn0, mx0)
        for pdf in pdf_iter:
            carry = _fold(carry, pdf["_v"].dropna())
        n, s, mn, mx = carry
        state.update((n, s, mn, mx))
        yield pd.DataFrame(
            {
                "key": [key[0]],
                "n": [n],
                # NULL sum for a never-observed key — see the tws twin
                "sum_value": [s if n > 0 else None],
                "min_value": [mn],
                "max_value": [mx],
            }
        )

    return grouped.applyInPandasWithState(
        update,
        outputStructType=_OUT_SCHEMA,
        stateStructType="n bigint, s double, mn double, mx double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
