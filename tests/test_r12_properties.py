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
    # ceil-overflow clamp: max 2.1 with 7 bins used to land subjects in a
    # phantom bin 8 past max(_t); the index is clamped to time_bins
    awk = spark.createDataFrame(
        [(2.1 * i / 10, 1) for i in range(1, 11)],
        "duration double, event int",
    )
    binned = kaplan_meier(awk, "duration", "event", time_bins=7).collect()
    assert max(r.t for r in binned) <= 2.1 + 1e-9
    assert len(binned) <= 7
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


def test_log_rank_identical_groups_is_zero(spark):
    """Identical survival experience in both groups: O-E = 0, chi2 = 0;
    a clearly separated pair gives a large chi2."""
    from etdtransform_spark.operators.funnel import log_rank_test

    same = spark.createDataFrame(
        [(t, 1, g) for t in (1.0, 2.0, 3.0) for g in ("a", "b")],
        "duration double, event int, grp string",
    )
    r = log_rank_test(same, "duration", "event", "grp", "a", "b").collect()[0]
    assert r.n_a == 3 and r.n_b == 3
    assert r.observed_minus_expected == 0.0 and r.chi2 == 0.0
    # group a all fails at t=1, group b survives (censored at t=10)
    sep = spark.createDataFrame(
        [(1.0, 1, "a")] * 5 + [(10.0, 0, "b")] * 5,
        "duration double, event int, grp string",
    )
    r2 = log_rank_test(sep, "duration", "event", "grp", "a", "b").collect()[0]
    assert r2.events_a == 5 and r2.events_b == 0
    # at t=1: n=10, n_a=5, d=5 -> E_a=2.5, O-E=2.5; V=5*.5*.5*5/9
    assert r2.observed_minus_expected == pytest.approx(2.5)
    assert r2.variance == pytest.approx(5 * 0.25 * 5 / 9, abs=1e-6)
    assert r2.chi2 == pytest.approx(2.5**2 / (5 * 0.25 * 5 / 9), abs=1e-4)
    # third-group rows are excluded
    extra = sep.union(
        spark.createDataFrame([(2.0, 1, "c")], sep.schema)
    )
    r3 = log_rank_test(extra, "duration", "event", "grp", "a", "b").collect()[0]
    assert (r3.n_a, r3.n_b) == (5, 5)


def test_benford_first_digits(spark):
    """Digit extraction across magnitudes (0.02, 3, 47, 1000, negatives)
    and the zero/NaN exclusion; a perfectly Benford-ish single digit
    shows zero deviation for its own cell."""
    from etdtransform_spark.operators.profile import benford_deviation

    vals = [0.02, 3.0, 47.0, 1000.0, -250.0, 0.0, None, float("nan"), 19.0,
            float("inf"), float("-inf")]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    out = {r.digit: r for r in benford_deviation(df, "x").collect()}
    assert len(out) == 9
    assert out[2].n == 2  # 0.02 and -250
    # 3.0 -> 3; 47 -> 4; 1000 -> 1; 19 -> 1
    assert out[1].n == 2 and out[3].n == 1 and out[4].n == 1
    assert sum(r.n for r in out.values()) == 6  # 0/None/NaN/±inf excluded
    assert out[9].n == 0 and out[9].share == 0.0
    assert out[1].expected_share == pytest.approx(0.30103, abs=1e-5)


def test_distinct_ngrams_diversity(spark):
    from etdtransform_spark.operators.text import distinct_ngrams

    rows = [
        (1, "a b a b a b"),          # looped: d1=2/6, d2=2/5
        (2, "all words here differ"),  # d1=4/4, d2=3/3
        (3, "solo"),                  # 1 token: no bigrams
        (4, None),                    # excluded
        (5, "   "),                   # 0 tokens
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in distinct_ngrams(df).collect()}
    assert set(out) == {1, 2, 3, 5}
    assert (out[1].n_tokens, out[1].distinct_1) == (6, 2)
    assert (out[1].n_bigrams, out[1].distinct_2) == (5, 2)
    assert out[1].distinct2_ratio == pytest.approx(0.4)
    assert out[2].distinct1_ratio == 1.0 and out[2].distinct2_ratio == 1.0
    assert out[3].n_bigrams == 0 and out[3].distinct2_ratio is None
    assert out[5].n_tokens == 0 and out[5].distinct1_ratio is None


def test_fleiss_kappa_textbook(spark):
    """Perfect agreement -> kappa 1; independent-looking labels -> small;
    ragged items dropped and counted."""
    from etdtransform_spark.operators.evaluation import fleiss_kappa

    perfect = spark.createDataFrame(
        [(i, f"r{j}", "yes" if i % 2 else "no")
         for i in range(10) for j in range(3)],
        "item int, rater string, label string",
    )
    r = fleiss_kappa(perfect, "item", "label", n_raters=3).collect()[0]
    assert r.n_items == 10 and r.n_items_dropped == 0
    assert r.p_bar == 1.0 and r.kappa == 1.0

    # one item with only 2 ratings is dropped
    ragged = perfect.union(
        spark.createDataFrame(
            [(99, "r0", "yes"), (99, "r1", "no")], perfect.schema
        )
    )
    r2 = fleiss_kappa(ragged, "item", "label", n_raters=3).collect()[0]
    assert r2.n_items == 10 and r2.n_items_dropped == 1
    # all raters constant on ONE label -> p_e = 1 -> kappa NULL
    const = spark.createDataFrame(
        [(i, f"r{j}", "same") for i in range(4) for j in range(2)],
        "item int, rater string, label string",
    )
    r3 = fleiss_kappa(const, "item", "label", n_raters=2).collect()[0]
    assert r3.p_e == 1.0 and r3.kappa is None
    with pytest.raises(ValueError):
        fleiss_kappa(perfect, "item", "label", n_raters=1)


def test_mmr_rerank_prefers_diversity(spark):
    """Two near-identical top candidates: plain relevance ranks them 1-2,
    MMR with lambda=0.5 picks the distinct third vector at rank 2."""
    from etdtransform_spark.operators.ranking import mmr_rerank

    # query q picks from: c1=[1,0], c2=[0.999,0.04], c3=[0,1]
    vecs = spark.createDataFrame(
        [(100, [1.0, 0.05]), (1, [1.0, 0.0]), (2, [0.999, 0.04]),
         (3, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    cands = spark.createDataFrame(
        [(100, 1, 0.99), (100, 2, 0.98), (100, 3, 0.05)],
        "query_id long, neighbor_id long, cosine double",
    )
    out = sorted(
        mmr_rerank(cands, vecs, k=3, lambda_=0.5).collect(),
        key=lambda r: r.mmr_rank,
    )
    assert [r.neighbor_id for r in out] == [1, 3, 2]
    assert out[0].mmr_score == pytest.approx(0.5 * 0.99)
    # k larger than the pool: output stops at pool size
    out2 = mmr_rerank(cands, vecs, k=5, lambda_=0.5).collect()
    assert len(out2) == 3
    with pytest.raises(ValueError):
        mmr_rerank(cands, vecs, k=0)
    with pytest.raises(ValueError):
        mmr_rerank(cands, vecs, lambda_=1.5)


def test_diff_in_diff_planted_effect(spark):
    """Planted parallel-trends data: control 10→12, treated 20→27
    → DID = +5 exactly; missing cell fails the estimate closed."""
    from etdtransform_spark.operators.stats import diff_in_diff

    rows = (
        [(0, 0, 10.0), (0, 0, 10.0), (0, 1, 12.0), (0, 1, 12.0),
         (1, 0, 20.0), (1, 0, 20.0), (1, 1, 27.0), (1, 1, 27.0)]
    )
    df = spark.createDataFrame(rows, "t int, p int, y double")
    r = diff_in_diff(df, "y", "t", "p").collect()[0]
    assert r.n == 8 and r.n_cells == 4
    assert r.did == pytest.approx(5.0)
    assert r.se_did == 0.0  # zero within-cell variance
    # drop the treated-pre cell: estimate NULL
    df3 = df.filter(~((F.col("t") == 1) & (F.col("p") == 0)))
    r2 = diff_in_diff(df3, "y", "t", "p").collect()[0]
    assert r2.n_cells == 3 and r2.did is None and r2.se_did is None
    # singleton cell: estimate present, se fails closed
    df4 = df.filter(
        ~((F.col("t") == 1) & (F.col("p") == 0))
    ).union(spark.createDataFrame([(1, 0, 20.0)], df.schema))
    r3 = diff_in_diff(df4, "y", "t", "p").collect()[0]
    assert r3.did == pytest.approx(5.0) and r3.se_did is None


def test_cusum_matches_recursion(spark):
    """The two-window prefix identity must equal the textbook recursion
    C+_t = max(0, C+_{t-1} + (x - target - k)) computed in Python."""
    from etdtransform_spark.operators.stats import cusum_drift

    xs = [0.1, -0.2, 0.3, 1.5, 2.0, 1.8, -0.5, 0.2, 2.5, 3.0]
    target, k = 0.0, 0.25
    cp = cn = 0.0
    mcp = mcn = 0.0
    first = None
    for i, x in enumerate(xs, start=1):
        cp = max(0.0, cp + (x - target - k))
        cn = max(0.0, cn - (x - target + k))
        mcp, mcn = max(mcp, cp), max(mcn, cn)
        if first is None and (cp > 2.0 or cn > 2.0):
            first = i
    df = spark.createDataFrame(
        [(i, x) for i, x in enumerate(xs)], "ts int, v double"
    )
    r = cusum_drift(
        df, "v", target=target, slack=k, threshold=2.0,
        order_cols=("ts",),
    ).collect()[0]
    assert r.n == 10
    assert r.max_cusum_pos == pytest.approx(mcp, abs=1e-6)
    assert r.max_cusum_neg == pytest.approx(mcn, abs=1e-6)
    assert r.alarm == 1 and r.first_alarm_idx == first
    # keyed variant: independent series per key
    df2 = spark.createDataFrame(
        [("a", i, x) for i, x in enumerate(xs)]
        + [("b", i, 0.0) for i in range(5)],
        "k string, ts int, v double",
    )
    out = {r.k: r for r in cusum_drift(
        df2, "v", target=target, slack=k, threshold=2.0,
        keys=("k",), order_cols=("ts",),
    ).collect()}
    assert out["a"].alarm == 1 and out["b"].alarm == 0
    assert out["b"].first_alarm_idx is None


def test_hazard_ratio_exponential_mle(spark):
    """Hand-computed HR: a has 4 events over 10 time units, b has 2 over
    20 -> HR = (4/10)/(2/20) = 4; zero-event group fails closed."""
    from etdtransform_spark.operators.funnel import hazard_ratio

    rows = (
        [(2.5, 1, "a")] * 4
        + [(5.0, 1, "b")] * 2 + [(10.0, 0, "b")]
    )
    df = spark.createDataFrame(rows, "duration double, event int, grp string")
    r = hazard_ratio(df, "duration", "event", "grp", "a", "b").collect()[0]
    assert (r.n_a, r.n_b, r.events_a, r.events_b) == (4, 3, 4, 2)
    assert r.time_a == pytest.approx(10.0) and r.time_b == pytest.approx(20.0)
    assert r.hazard_ratio == pytest.approx(4.0)
    assert r.ln_hr_se == pytest.approx((1 / 4 + 1 / 2) ** 0.5, abs=1e-6)
    assert r.hr_ci_low < 4.0 < r.hr_ci_high
    # no events in b -> undefined ratio
    nob = spark.createDataFrame(
        [(1.0, 1, "a"), (5.0, 0, "b")], df.schema
    )
    r2 = hazard_ratio(nob, "duration", "event", "grp", "a", "b").collect()[0]
    assert r2.hazard_ratio is None and r2.hr_ci_low is None


def test_theil_atkinson_known_values(spark):
    """Equal values → both indices 0; a hand-computed 2-point
    distribution matches the closed forms; non-positive exclusion."""
    import math

    from etdtransform_spark.operators.stats import theil_atkinson

    eq = spark.createDataFrame([(5.0,)] * 8, "x double")
    r = theil_atkinson(eq, "x").collect()[0]
    assert r.theil_t == pytest.approx(0.0, abs=1e-9)
    assert r.atkinson == pytest.approx(0.0, abs=1e-9)

    # x = [1, 3]: mu=2, T = ((1/2)ln(1/2) + (3/2)ln(3/2))/2
    two = spark.createDataFrame(
        [(1.0,), (3.0,), (0.0,), (-2.0,), (None,)], "x double"
    )
    r2 = theil_atkinson(two, "x").collect()[0]
    assert r2.n == 4 and r2.n_nonpositive == 2  # NULL excluded entirely
    t_exp = (0.5 * math.log(0.5) + 1.5 * math.log(1.5)) / 2
    a_exp = 1 - math.exp((math.log(1) + math.log(3)) / 2 - math.log(2))
    assert r2.theil_t == pytest.approx(t_exp, abs=1e-6)
    assert r2.atkinson == pytest.approx(a_exp, abs=1e-6)
    # epsilon = 2 power form
    r3 = theil_atkinson(two, "x", epsilon=2.0).collect()[0]
    a2 = 1 - ((1 / 0.5 + 1 / 1.5) / 2) ** -1
    assert r3.atkinson == pytest.approx(a2, abs=1e-6)
    with pytest.raises(ValueError):
        theil_atkinson(two, "x", epsilon=0.0)


def test_logistic_irls_matches_numpy_recursion(spark):
    """The 3-step Spark IRLS chain must equal the same Newton recursion
    replayed in Python; slope sign recovers the planted association."""
    import math

    from etdtransform_spark.operators.stats import logistic_irls

    rows = [(1, 1.0)] * 30 + [(0, 1.0)] * 10 + [(1, -1.0)] * 10 + [
        (0, -1.0)
    ] * 30
    b0 = b1 = 0.0
    for _ in range(3):
        s0 = s1 = s2 = g0 = g1 = 0.0
        for y, x in rows:
            p = 1.0 / (1.0 + math.exp(-(b0 + b1 * x)))
            w = p * (1.0 - p)
            s0 += w
            s1 += w * x
            s2 += w * x * x
            g0 += y - p
            g1 += (y - p) * x
        det = s0 * s2 - s1 * s1
        b0, b1 = b0 + (s2 * g0 - s1 * g1) / det, b1 + (
            s0 * g1 - s1 * g0
        ) / det
    df = spark.createDataFrame(rows, "y int, x double")
    r = logistic_irls(df, "y", "x", steps=3).collect()[0]
    assert r.n == 80 and r.n_pos == 40
    assert r.b0 == pytest.approx(b0, abs=1e-5)
    assert r.b1 == pytest.approx(b1, abs=1e-5)
    assert r.b1 > 0 and r.log_loss > 0
    # constant feature: slope unidentifiable -> fail closed
    const = spark.createDataFrame(
        [(1, 2.0), (0, 2.0), (1, 2.0)], "y int, x double"
    )
    rc = logistic_irls(const, "y", "x").collect()[0]
    assert rc.b0 is None and rc.b1 is None
    with pytest.raises(ValueError):
        logistic_irls(df, "y", "x", steps=0)


def test_streaming_cusum_matches_batch(spark):
    """The stateful streaming CUSUM over a real (availableNow) stream
    must reproduce the batch cusum_drift summary exactly — same series,
    same params, latest emitted row per key."""
    import tempfile
    import uuid

    from etdtransform_spark.operators.stats import cusum_drift
    from etdtransform_spark.streaming.cusum_stream import streaming_cusum

    xs = [0.1, -0.2, 0.3, 1.5, 2.0, 1.8, -0.5, 0.2, 2.5, 3.0]
    params = dict(target=0.0, slack=0.25, threshold=2.0)
    full = cusum_drift(
        spark.createDataFrame(
            [(i, float(x)) for i, x in enumerate(xs)], "ts int, v double"
        ),
        "v", order_cols=("ts",), **params,
    ).collect()[0]

    orig = spark.createDataFrame(
        [("k", i, float(x)) for i, x in enumerate(xs)],
        "event_type string, event_id int, value double",
    ).withColumn("ts", F.col("event_id").cast("timestamp"))
    d = tempfile.mkdtemp()
    orig.write.mode("overwrite").parquet(d)
    stream = spark.readStream.schema(orig.schema).parquet(d).select(
        "event_type", "ts", "event_id", "value"
    )
    out = streaming_cusum(stream, "value", key_col="event_type", **params)
    name = f"t_cusum_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory").queryName(name)
        .outputMode("update").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    rows = spark.table(name).orderBy(F.col("n").desc()).collect()
    assert rows, "stream emitted nothing"
    r = rows[0]
    assert r.n == full.n
    assert r.max_cusum_pos == pytest.approx(full.max_cusum_pos, abs=1e-6)
    assert r.max_cusum_neg == pytest.approx(full.max_cusum_neg, abs=1e-6)
    assert r.alarm == full.alarm
    assert r.first_alarm_idx == full.first_alarm_idx


def test_vocabulary_richness_estimators(spark):
    """Chao1 and Good-Turing from a hand-built histogram: 'a a b b c'
    → D=3, f1=1, f2=2 → chao1 = 3.25, P0 = 0.2; the f2=0 branch uses
    the bias-corrected form; empty corpus fails closed."""
    from etdtransform_spark.operators.corpus import vocabulary_richness

    df = spark.createDataFrame([(1, "a a b b c")], "doc_id long, text string")
    r = vocabulary_richness(df).collect()[0]
    assert (r.n_tokens, r.n_types, r.f1, r.f2) == (5, 3, 1, 2)
    assert r.chao1 == pytest.approx(3.25)
    assert r.good_turing_unseen == pytest.approx(0.2)

    allsingle = spark.createDataFrame(
        [(1, "a b c")], "doc_id long, text string"
    )
    r2 = vocabulary_richness(allsingle).collect()[0]
    assert r2.f2 == 0 and r2.chao1 == pytest.approx(3 + 3 * 2 / 2)

    empty = spark.createDataFrame([], "doc_id long, text string")
    r3 = vocabulary_richness(empty).collect()[0]
    assert r3.n_tokens == 0 and r3.n_types == 0
    assert r3.chao1 is None and r3.good_turing_unseen is None


def test_ipw_ate_corrects_confounding(spark):
    """Planted confounding: x drives BOTH treatment probability and the
    outcome, true effect = +2. The naive difference is inflated by the
    confounder; IPW pulls the estimate back toward +2."""
    import math
    import random

    from etdtransform_spark.operators.stats import ipw_ate

    rng = random.Random(11)
    rows = []
    for _ in range(4000):
        x = rng.random()  # confounder in [0, 1)
        pt = 1.0 / (1.0 + math.exp(-(4.0 * x - 2.0)))
        t = 1 if rng.random() < pt else 0
        y = 10.0 * x + 2.0 * t  # noise-free: isolates the estimators
        rows.append((y, t, x))
    df = spark.createDataFrame(rows, "y double, t int, x double")
    r = ipw_ate(df, "y", "t", "x", steps=3).collect()[0]
    assert r.n == 4000 and 0 < r.n_treated < 4000
    assert r.b1 > 0  # fitted propensity recovers the positive x-effect
    assert r.ate_naive > 3.5  # confounded well above the true +2
    # IPW moves at least 60% of the way from naive to truth
    assert abs(r.ate_ipw - 2.0) < 0.4 * abs(r.ate_naive - 2.0)
    # degenerate propensity design: constant x -> NULL beta -> NULL ATE
    const = spark.createDataFrame(
        [(1.0, 1, 5.0), (2.0, 0, 5.0), (3.0, 1, 5.0)],
        "y double, t int, x double",
    )
    rc = ipw_ate(const, "y", "t", "x").collect()[0]
    assert rc.b0 is None and rc.ate_ipw is None
    assert rc.ate_naive is not None  # the unadjusted diff still exists
    with pytest.raises(ValueError):
        ipw_ate(df, "y", "t", "x", clip=0.6)
