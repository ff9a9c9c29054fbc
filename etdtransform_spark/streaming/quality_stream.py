"""Structured Streaming quality monitor — the streaming half of
operators/classify.py (SURVEY §2.9 streaming-analogue axis).

Deployment shape: the MODEL is frozen offline (a hashed-feature weight
map, dictionary-sized); scoring is a STATELESS projection folded into the
stream (the literal-map path of ``hashed_linear_score`` — zero state,
zero shuffle), and the only stateful operator is one watermarked tumbling
window aggregating (count, mean score, gate pass-rate) per window. State
per open window is a single row. Streaming is a deployment mode, not a
different answer: the contract query checks the sink against the SAME
batch SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.scalars import qround
from ..operators.classify import hashed_linear_score


def streaming_quality_monitor(
    stream_df: DataFrame,
    text_col: str,
    ts_col: str,
    weights: dict[int, float],
    n_features: int,
    threshold: float = 0.5,
    ngram_sizes: tuple[int, ...] = (1, 2),
    window: str = "1 day",
    watermark: str = "1 hour",
    digits: int = 6,
) -> DataFrame:
    """Per tumbling window: scored-document count, mean model score, and
    the fraction clearing ``threshold``.

    Unscorable rows (NULL/empty text -> NULL score) are excluded from all
    three statistics — they carry no quality evidence, mirroring
    ``quality_gate``'s fail-closed default. Returns a streaming frame
    (bucket_ts, n, avg_score, pass_rate).
    """
    scored = hashed_linear_score(
        stream_df,
        text_col,
        weights,
        n_features,
        ngram_sizes=ngram_sizes,
        score_col="_q_score",
    )
    s = F.col("_q_score")
    marked = scored.filter(s.isNotNull()).withWatermark(ts_col, watermark)
    return (
        marked.groupBy(F.window(F.col(ts_col), window).alias("_w"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            qround(F.avg(s), digits).alias("avg_score"),
            qround(
                F.avg((s >= F.lit(float(threshold))).cast("double")), digits
            ).alias("pass_rate"),
        )
        .select(F.col("_w.start").alias("bucket_ts"), "n", "avg_score", "pass_rate")
    )
