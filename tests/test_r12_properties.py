"""Round-12 property tests: ADVICE r11 fixes and new r12 operators."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F  # noqa: F401


def test_bm25_ranks_on_rounded_score(spark):
    """ADVICE r11 #1: the top-k ordering key must be the ROUNDED score
    (the same value emitted in the output), so two docs whose raw BM25
    sums differ only past `digits` decimals tie deterministically on
    doc_id instead of on float noise. With digits=0 both docs round to
    the same score, so the id tiebreak must pick 'a' even though the
    shorter doc 'z' has the higher RAW score."""
    from etdtransform_spark.operators.text import bm25_topk

    docs = spark.createDataFrame(
        [("a", "spark filler"), ("z", "spark")],
        "doc_id string, text string",
    )
    top = bm25_topk(docs, ["spark"], k=1, digits=0).collect()
    assert top[0].doc_id == "a"
    # sanity: at full precision the raw order holds (shorter doc wins)
    top6 = bm25_topk(docs, ["spark"], k=1, digits=6).collect()
    assert top6[0].doc_id == "z"


def test_post_stratified_singleton_stratum_nulls_se(spark):
    """ADVICE r11 #2: a declared stratum observed with n=1 has no
    sample variance — its W^2*s^2/n term would be silently skipped and
    the se UNDERESTIMATED. The se must fail closed (NULL) while the
    point estimate (which only needs the stratum mean) stays valid."""
    from etdtransform_spark.operators.stats import post_stratified_mean

    rows = [("a", 10.0), ("a", 12.0), ("b", 5.0)]  # b is a singleton
    df = spark.createDataFrame(rows, "s string, x double")
    r = post_stratified_mean(df, "x", "s", {"a": 0.5, "b": 0.5}).collect()[0]
    assert r.mean_post_stratified == pytest.approx(0.5 * 11 + 0.5 * 5)
    assert r.se_post_stratified is None
    assert r.n_strata == 2 and r.n_empty_strata == 0

    # all strata n>1 -> se present again
    df2 = spark.createDataFrame(
        rows + [("b", 7.0)], "s string, x double"
    )
    r2 = post_stratified_mean(
        df2, "x", "s", {"a": 0.5, "b": 0.5}
    ).collect()[0]
    assert r2.se_post_stratified is not None


def test_column_profile_noncastable_numeric_counts_missing(spark):
    """ADVICE r11 #4: a string value in a declared-numeric column casts
    to NULL, making bare isnan(cast) NULL — the row used to vanish from
    BOTH the null count and the valid set. It must count as missing:
    null_rate reflects it and the mean/distinct exclude it."""
    from etdtransform_spark.operators.profile import column_profile

    df = spark.createDataFrame(
        [("1.0",), ("abc",), (None,), ("1.0",)], "v string"
    )
    r = column_profile(df, numeric_cols=["v"]).collect()[0]
    assert r.n_rows == 4
    assert r.null_rate == pytest.approx(0.5)  # 'abc' + NULL
    assert r.n_distinct == 1
    assert r.mean == pytest.approx(1.0)


def test_funnel_checkpoint_opt_out_same_result(spark):
    """ADVICE r11 #3: checkpoint_steps=False must produce the identical
    per-user funnel (it only trades the 2^k lineage cut for cluster
    recoverability)."""
    from etdtransform_spark.operators.funnel import funnel_steps

    rows = [
        (1, "2024-01-01 00:00:00", "view"),
        (1, "2024-01-01 00:01:00", "click"),
        (1, "2024-01-01 00:02:00", "purchase"),
        (2, "2024-01-01 00:00:00", "view"),
        (2, "2024-01-01 00:01:00", "purchase"),  # skips click
    ]
    df = spark.createDataFrame(
        rows, "user_id int, ts string, event_type string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    steps = ["view", "click", "purchase"]
    a = sorted(funnel_steps(df, steps).collect())
    b = sorted(funnel_steps(df, steps, checkpoint_steps=False).collect())
    assert a == b
    assert a[0].step3_ts is not None and a[1].step2_ts is None


def test_survival_time_bins_exact_on_grid(spark):
    """VERDICT r11 #3: the time_bins knob bounds the distinct-duration
    window input; on integer durations with time_bins = max the bin
    width is exactly 1.0 so the binned curve equals the unbinned one."""
    from etdtransform_spark.operators.funnel import (
        kaplan_meier,
        nelson_aalen,
    )

    rows = [(1.0, 1), (2.0, 0), (2.0, 1), (3.0, 1), (4.0, 0), (4.0, 1)]
    df = spark.createDataFrame(rows, "duration double, event int")
    for fn in (kaplan_meier, nelson_aalen):
        plain = sorted(fn(df, "duration", "event").collect())
        binned = sorted(fn(df, "duration", "event", time_bins=4).collect())
        assert plain == binned, fn.__name__
    # continuous durations: binning bounds the output cardinality
    import random  # deterministic seed, no wall-clock dependency

    rng = random.Random(7)
    cont = spark.createDataFrame(
        [(rng.random() * 100.0, 1) for _ in range(500)],
        "duration double, event int",
    )
    assert kaplan_meier(cont, "duration", "event").count() == 500
    assert kaplan_meier(cont, "duration", "event", time_bins=10).count() <= 10
    with pytest.raises(ValueError):
        kaplan_meier(cont, "duration", "event", time_bins=0)


def test_vocab_growth_bucketed_prefix_identical(spark):
    """VERDICT r11 minor #2: the prefix_buckets scale path (two-pass
    range-bucketed offset prefix sum) must equal the single-window
    default value-for-value."""
    from etdtransform_spark.operators.corpus import vocab_growth

    docs = spark.createDataFrame(
        [(i, f"w{i % 13} w{i % 7} common x{i}") for i in range(60)],
        "doc_id long, text string",
    )
    cols = ["doc_id", "n_tokens", "n_new_terms", "cum_tokens",
            "vocab_size", "type_token_ratio"]
    plain = sorted(vocab_growth(docs).select(cols).collect())
    bucketed = sorted(
        vocab_growth(docs, prefix_buckets=8).select(cols).collect()
    )
    assert plain == bucketed
    # final point: vocabulary is every distinct term, tokens all tokens
    # w{i%7} terms are a subset of w{i%13} terms: 13 distinct w-terms
    assert plain[-1].vocab_size == 13 + 1 + 60
    assert plain[-1].cum_tokens == 240
    with pytest.raises(ValueError):
        vocab_growth(docs, prefix_buckets=1)
