"""Unit tests for operators/classify.py (hashed-feature linear scoring):
hand-computed scores against an independent python reimplementation, the
two weight-delivery paths agreeing, NULL/empty semantics, the quality
gate, and the zero-shuffle plan claim for the literal path."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from etdtransform_spark.operators.classify import (
    feature_buckets,
    hashed_linear_score,
    quality_gate,
)

N = 64
WEIGHTS = {b: ((b * 2654435761) % 1000) / 1000.0 - 0.5 for b in range(N)}


def _py_bucket(gram: str) -> int:
    return int(hashlib.md5(f"0|{gram}".encode()).hexdigest()[:15], 16) % N


def _py_score(text: str | None, bias: float = 0.0) -> float | None:
    if text is None:
        return None
    toks = [t for t in text.split() if t]
    if not toks:
        return None
    grams = list(toks)
    if len(toks) >= 2:
        grams += [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    else:
        grams += [" ".join(toks)]  # positional_word_grams short-row rule
    logit = bias + sum(WEIGHTS[_py_bucket(g)] for g in grams) / len(grams)
    return 1.0 / (1.0 + math.exp(-logit))


def _df(spark):
    rows = [
        (1, "the quick brown fox jumps"),
        (2, "single"),
        (3, None),
        (4, "   "),
        (5, "repeated repeated repeated words weigh by term frequency"),
    ]
    return spark.createDataFrame(rows, "id bigint, text string")


def test_scores_match_python_model(spark):
    out = {
        r.id: r.score
        for r in hashed_linear_score(_df(spark), "text", WEIGHTS, N).collect()
    }
    for rid, text in [(1, "the quick brown fox jumps"), (2, "single"),
                      (5, "repeated repeated repeated words weigh by term frequency")]:
        assert out[rid] == pytest.approx(_py_score(text), abs=1e-12)
    assert out[3] is None and out[4] is None  # no evidence -> NULL, not 0.5


def test_weight_df_path_equals_literal_path(spark):
    df = _df(spark)
    lit = hashed_linear_score(df, "text", WEIGHTS, N).select("id", "score")
    wdf = spark.createDataFrame(
        [(k, v) for k, v in WEIGHTS.items()], "bucket bigint, weight double"
    )
    big = hashed_linear_score(df, "text", wdf, N, id_col="id").select("id", "score")
    a = {r.id: r.score for r in lit.collect()}
    b = {r.id: r.score for r in big.collect()}
    assert set(a) == set(b)
    for k in a:
        if a[k] is None:
            assert b[k] is None
        else:
            assert b[k] == pytest.approx(a[k], abs=1e-12)


def test_weight_df_duplicates(spark):
    df = spark.createDataFrame([(1, "alpha beta")], "id bigint, text string")
    # exact duplicate rows collapse (concatenated model exports)
    dup_ok = spark.createDataFrame(
        [(k, v) for k, v in WEIGHTS.items()] + [(0, WEIGHTS[0])],
        "bucket bigint, weight double",
    )
    lit = hashed_linear_score(df, "text", WEIGHTS, N).collect()[0].score
    got = hashed_linear_score(df, "text", dup_ok, N, id_col="id").collect()[0].score
    assert got == pytest.approx(lit, abs=1e-12)
    # conflicting duplicates are malformed input and fail loudly — at
    # ACTION time (raise_error inside the plan; the build stays lazy)
    bad = spark.createDataFrame(
        [(7, 0.1), (7, 0.2)], "bucket bigint, weight double"
    )
    lazy = hashed_linear_score(df, "text", bad, N, id_col="id")
    with pytest.raises(Exception, match="conflicting"):
        lazy.collect()
    # NULL weight alongside a real one is also a conflict, not a silent min
    bad_null = spark.createDataFrame(
        [(7, 0.1), (7, None)], "bucket bigint, weight double"
    )
    with pytest.raises(Exception, match="conflicting"):
        hashed_linear_score(df, "text", bad_null, N, id_col="id").collect()
    # a bucket whose ONLY row is NULL is malformed too — count_distinct
    # skips NULLs, so without the doubled indicator this would silently
    # score as weight 0.0
    lone_null = spark.createDataFrame(
        [(k, v) for k, v in WEIGHTS.items() if k != 7] + [(7, None)],
        "bucket bigint, weight double",
    )
    with pytest.raises(Exception, match="conflicting"):
        hashed_linear_score(df, "text", lone_null, N, id_col="id").collect()


def test_weight_df_duplicate_id_raises(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta"), (1, "gamma delta")], "id bigint, text string"
    )
    w = spark.createDataFrame(
        [(k, v) for k, v in WEIGHTS.items()], "bucket bigint, weight double"
    )
    with pytest.raises(Exception, match="duplicated or NULL"):
        hashed_linear_score(df, "text", w, N, id_col="id").collect()
    # mixed duplicate (one scorable + one unscorable row) raises too —
    # the row-count identity catches what the positional identity can't
    df_mixed = spark.createDataFrame(
        [(1, "alpha beta"), (1, "")], "id bigint, text string"
    )
    with pytest.raises(Exception, match="duplicated or NULL"):
        hashed_linear_score(df_mixed, "text", w, N, id_col="id").collect()
    # two unscorable duplicates raise as well
    df2 = spark.createDataFrame(
        [(1, ""), (1, None)], "id bigint, text string"
    )
    with pytest.raises(Exception, match="duplicated or NULL"):
        hashed_linear_score(df2, "text", w, N, id_col="id").collect()
    # a NULL id is invalid outright (the restore join would drop it)
    df_null = spark.createDataFrame(
        [(None, "alpha beta")], "id bigint, text string"
    )
    with pytest.raises(Exception, match="duplicated or NULL"):
        hashed_linear_score(df_null, "text", w, N, id_col="id").collect()
    # unique ids with unscorable text still score NULL without raising
    ok = spark.createDataFrame(
        [(1, ""), (2, None), (3, "alpha beta")], "id bigint, text string"
    )
    got = {r.id: r.score for r in hashed_linear_score(
        ok, "text", w, N, id_col="id").collect()}
    assert got[1] is None and got[2] is None and got[3] is not None


def test_missing_buckets_weigh_zero(spark):
    df = spark.createDataFrame([(1, "alpha beta")], "id bigint, text string")
    out = hashed_linear_score(df, "text", {}, N, bias=0.7).collect()[0]
    assert out.score == pytest.approx(1.0 / (1.0 + math.exp(-0.7)), abs=1e-12)


def test_bias_and_unigram_only(spark):
    df = spark.createDataFrame([(1, "alpha")], "id bigint, text string")
    b = _py_bucket("alpha")
    out = hashed_linear_score(
        df, "text", {b: 2.0}, N, ngram_sizes=(1,), bias=-1.0
    ).collect()[0]
    assert out.score == pytest.approx(1.0 / (1.0 + math.exp(-1.0)), abs=1e-12)


def test_quality_gate(spark):
    df = _df(spark)
    scores = {
        r.id: r.score for r in hashed_linear_score(df, "text", WEIGHTS, N).collect()
    }
    thr = sorted(v for v in scores.values() if v is not None)[1]  # keep top 2
    kept = {r.id for r in quality_gate(df, "text", WEIGHTS, N, threshold=thr).collect()}
    expect = {k for k, v in scores.items() if v is not None and v >= thr}
    assert kept == expect
    with_nulls = {
        r.id
        for r in quality_gate(
            df, "text", WEIGHTS, N, threshold=thr, keep_nulls=True
        ).collect()
    }
    assert with_nulls == expect | {3, 4}


def test_literal_path_is_zero_shuffle(spark):
    plan = (
        hashed_linear_score(_df(spark), "text", WEIGHTS, N)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan  # pure projection: scoring never shuffles


def test_feature_buckets_range_and_tf(spark):
    df = spark.createDataFrame([(1, "x x y")], "id bigint, text string")
    b = df.select(feature_buckets(F.col("text"), N).alias("b")).collect()[0].b
    # 3 unigrams (duplicates kept) + 2 bigrams
    assert len(b) == 5
    assert all(0 <= v < N for v in b)
