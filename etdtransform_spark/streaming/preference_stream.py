"""Streaming Elo — online pairwise-preference rating over an unbounded
comparison stream (the streaming analogue of
``operators/preference.py:bradley_terry_strengths``, SURVEY §2.9
streaming-analogue axis).

Elo is the canonical ONLINE rating rule: one sequential pass, constant
work per comparison, no refitting —

    E_w = 1 / (1 + 10^((R_l - R_w) / 400))
    R_w += K * (1 - E_w);   R_l -= K * (1 - E_w)

Unlike every other streaming operator in this package, the update is
ORDER-DEPENDENT and the state is GLOBAL (both sides of a comparison read
and write the shared rating table), so the operator is honest about its
scale shape: all comparisons fold through ONE state group (a
single-partition stateful stage). That is not a Spark limitation — it is
Elo's semantics; the state itself is item-domain-sized (one rating tuple
per item) and per-comparison work is O(1), so throughput is bounded by
the sequential update rate, not by state size. Pipelines needing
parallel refitting at scale use the batch Bradley-Terry MM instead; Elo
is the low-latency online complement.

Ordering semantics: within a micro-batch, comparisons are folded in
(event-time, tiebreaker) order; ACROSS micro-batches, arrival order is
the semantic (an online rating processes what arrives when it arrives —
a late comparison updates the CURRENT ratings, exactly like a late game
report in a real rating system). A single-batch availableNow run over a
time-sorted source is therefore bit-identical to the batch sequential
fold, which is what the contract oracle checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_OUT_SCHEMA = (
    "item string, n_games bigint, wins bigint, rating double, seq bigint"
)
_STATE_SCHEMA = (
    "items array<string>, ratings array<double>, games array<bigint>, "
    "wins array<bigint>, seq bigint"
)


def _elo_fold(state, rows, k, initial):
    """Fold ordered (winner, loser) pairs into the rating state dict
    {item: [rating, games, wins]} — shared by the streaming update
    function and the unit tests' batch twin so the two cannot drift.
    Returns the number of comparisons applied."""
    applied = 0
    for w, l in rows:
        if w is None or l is None or w == l:
            continue
        rw = state.get(w, (float(initial), 0, 0))
        rl = state.get(l, (float(initial), 0, 0))
        e = 1.0 / (1.0 + 10.0 ** ((rl[0] - rw[0]) / 400.0))
        delta = k * (1.0 - e)
        state[w] = (rw[0] + delta, rw[1] + 1, rw[2] + 1)
        state[l] = (rl[0] - delta, rl[1] + 1, rl[2])
        applied += 1
    return applied


def streaming_elo(
    stream_df: DataFrame,
    winner_col: str,
    loser_col: str,
    ts_col: str,
    order_col: str | None = None,
    k_factor: float = 32.0,
    initial: float = 1000.0,
) -> DataFrame:
    """Update-mode online Elo ratings over a comparison stream.

    Emits, per micro-batch, one row per item EVER seen:
    (item, n_games, wins, rating, seq) where ``seq`` is the total number
    of comparisons folded so far — a consumer wanting only the latest
    snapshot filters ``seq = max(seq)`` (every batch re-emits the full
    item-domain-sized state, so the newest ``seq`` group is always
    complete). NULL sides and self-comparisons carry no evidence and are
    skipped without consuming a sequence number.

    ``order_col`` breaks event-time ties deterministically (a unique id
    column); without one, tied timestamps fold in arrival order within
    the batch. Items are folded as strings (cast back at the caller if
    numeric) so one output schema serves any id type.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    k = float(k_factor)
    init = float(initial)
    cols = [
        F.lit(0).alias("_g"),
        F.col(winner_col).cast("string").alias("_w"),
        F.col(loser_col).cast("string").alias("_l"),
        F.col(ts_col).alias("_ts"),
    ]
    cols.append(
        (F.col(order_col) if order_col else F.lit(0)).alias("_ord")
    )
    grouped = stream_df.select(*cols).groupBy("_g")

    def update(key, pdf_iter, state: GroupState):
        import pandas as pd

        st: dict = {}
        seq = 0
        had_state = state.exists
        if had_state:
            items, ratings, games, wins, seq = state.get
            st = {
                it: (r, g, w)
                for it, r, g, w in zip(items, ratings, games, wins)
            }
        # list-then-concat with an empty-guard: a timeout invocation (if a
        # timeout is ever configured) delivers NO dataframes, and
        # pd.concat([]) raises rather than returning an empty frame
        dfs = list(pdf_iter)
        batch = (
            pd.concat(dfs, ignore_index=True)
            if dfs
            else pd.DataFrame(columns=["_g", "_w", "_l", "_ts", "_ord"])
        )
        applied = 0
        if len(batch):
            batch = batch.sort_values(
                ["_ts", "_ord"], kind="mergesort"
            )  # stable: tied (ts, ord) keep arrival order
            pairs = [
                (None if pd.isna(w) else w, None if pd.isna(l) else l)
                for w, l in zip(batch["_w"], batch["_l"])
            ]
            applied = _elo_fold(st, pairs, k, init)
            seq += applied
        if applied == 0 and had_state:
            # nothing folded: state (and seq) are unchanged, and
            # re-emitting the full snapshot under the SAME seq would
            # duplicate every item in an update-mode sink's
            # "seq = max(seq)" view — emit nothing instead
            return
        items = sorted(st)
        state.update(
            (
                items,
                [st[i][0] for i in items],
                [st[i][1] for i in items],
                [st[i][2] for i in items],
                seq,
            )
        )
        yield pd.DataFrame(
            {
                "item": items,
                "n_games": [st[i][1] for i in items],
                "wins": [st[i][2] for i in items],
                "rating": [st[i][0] for i in items],
                "seq": [seq] * len(items),
            }
        )

    return grouped.applyInPandasWithState(
        update,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_position_bias(
    stream_df: DataFrame,
    first_col: str,
    second_col: str,
    winner_col: str,
    ts_col: str,
    strengths: dict,
    window: str = "1 day",
    watermark: str = "1 hour",
    digits: int = 6,
) -> DataFrame:
    """Windowed position-bias monitor over a live judgment stream — the
    streaming deployment of ``operators/preference.py:
    position_bias_audit``: the strengths are FROZEN offline (a fitted
    Bradley-Terry model, dictionary-sized, inlined as a literal map), so
    per-comparison scoring is a STATELESS projection; the only stateful
    operator is one watermarked tumbling window holding a single
    (n, wins, Σp, Σp(1−p)) row per open window. A drifting judge (new
    position bias after a prompt or model change) surfaces as the
    window z moving away from 0.

    Emits one row per window for POSITION 1 (position 2 is the exact
    mirror): (bucket_ts, n, wins, win_rate, expected_rate, z). Same
    evidence rules as the batch audit: NULL sides, self-pairs, winners
    that are neither side, and items absent from the frozen model carry
    nothing. Both strengths 0 → the uninformative p = 0.5.
    """
    from ..functions.scalars import qround

    f, s, w = F.col(first_col), F.col(second_col), F.col(winner_col)
    pairs = []
    for kk in sorted(strengths):
        pairs += [F.lit(kk), F.lit(float(strengths[kk]))]
    smap = F.create_map(*pairs)
    sf_, ss = smap[f], smap[s]  # bracket form: Column-key getItem is deprecated
    tot = sf_ + ss
    p = F.when(tot > 0, sf_ / tot).otherwise(F.lit(0.5))
    base = (
        stream_df.filter(
            f.isNotNull()
            & s.isNotNull()
            & w.isNotNull()
            & (f != s)
            & ((w == f) | (w == s))
            & sf_.isNotNull()
            & ss.isNotNull()
        )
        .select(
            F.col(ts_col).alias("_ts"),
            (w == f).cast("double").alias("_w1"),
            p.alias("_p"),
        )
        .withWatermark("_ts", watermark)
    )
    agg = base.groupBy(F.window(F.col("_ts"), window).alias("_win")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("_w1").alias("_wins"),
        F.sum("_p").alias("_e1"),
        F.sum(F.col("_p") * (F.lit(1.0) - F.col("_p"))).alias("_v"),
    )
    return agg.select(
        F.col("_win.start").alias("bucket_ts"),
        "n",
        F.col("_wins").cast("bigint").alias("wins"),
        qround(F.col("_wins") / F.col("n"), digits).alias("win_rate"),
        qround(F.col("_e1") / F.col("n"), digits).alias("expected_rate"),
        qround(
            F.when(
                F.col("_v") > 0,
                (F.col("_wins") - F.col("_e1")) / F.sqrt(F.col("_v")),
            ),
            digits,
        ).alias("z"),
    )
