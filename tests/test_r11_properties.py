"""Round-11 property tests: ADVICE r10 fixes and new r11 operators."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F  # noqa: F401


def test_rbo_duplicate_rank_rows_do_not_inflate(spark):
    """ADVICE r10 #2: a malformed ranking listing the same item at two
    ranks must not multiply equijoin matches — the side is collapsed to
    min(rank) per (query, item), so the duplicated input scores exactly
    like its deduplicated form."""
    from etdtransform_spark.operators.ranking import rbo_overlap

    clean = spark.createDataFrame(
        [("q1", f"d{i}", i) for i in range(1, 6)],
        "query_id string, neighbor_id string, rank long",
    )
    # same ranking with d2 duplicated at ranks 2 AND 4
    dup = spark.createDataFrame(
        [("q1", "d1", 1), ("q1", "d2", 2), ("q1", "d3", 3),
         ("q1", "d2", 4), ("q1", "d5", 5)],
        "query_id string, neighbor_id string, rank long",
    )
    dedup = spark.createDataFrame(
        [("q1", "d1", 1), ("q1", "d2", 2), ("q1", "d3", 3),
         ("q1", "d5", 5)],
        "query_id string, neighbor_id string, rank long",
    )
    got_dup = rbo_overlap(clean, dup, p=0.9, k=5, digits=9).collect()[0]
    got_dedup = rbo_overlap(clean, dedup, p=0.9, k=5, digits=9).collect()[0]
    assert got_dup.rbo == got_dedup.rbo
    assert got_dup.n_matched == got_dedup.n_matched
    # self-agreement of the duplicated table: after min-rank collapse the
    # effective ranking is d1@1 d2@2 d3@3 d5@5 (rank 4 is a gap), so
    # X = (1,2,3,3,4) and RBO = 0.1·(1 + .9 + .81 + .729·3/4 + .6561·4/5)
    self_dup = rbo_overlap(dup, dup, p=0.9, k=5, digits=9).collect()[0]
    expect = 0.1 * (1 + 0.9 + 0.81 + 0.729 * 0.75 + 0.6561 * 0.8)
    assert self_dup.rbo == pytest.approx(expect, abs=1e-6)


def test_cramers_v_empty_input_reports_n_zero(spark):
    """ADVICE r10 #5: empty (fully-null) input reports n=0 with NULL
    statistics — the same fail-closed convention as srm_check."""
    from etdtransform_spark.operators.stats import cramers_v

    empty = spark.createDataFrame([], "g string, o string")
    row = cramers_v(empty, "g", "o").collect()[0]
    assert row.n == 0
    assert row.r_levels == 0 and row.c_levels == 0
    assert row.chi2 is None
    assert row.cramers_v is None and row.cramers_v_corrected is None

    nulls = spark.createDataFrame(
        [(None, "x"), ("a", None), (None, None)], "g string, o string"
    )
    row = cramers_v(nulls, "g", "o").collect()[0]
    assert row.n == 0 and row.cramers_v is None


def test_funnel_conversion_strict_order(spark):
    """A click BEFORE the first view must not count as converted."""
    from etdtransform_spark.operators.funnel import funnel_step_rates

    rows = [
        # u1: view@1 -> click@2 -> purchase@3  (full conversion)
        (1, "view", 1.0), (1, "click", 2.0), (1, "purchase", 3.0),
        # u2: click@1 -> view@2 (click precedes view: not converted)
        (2, "click", 1.0), (2, "view", 2.0),
        # u3: view only
        (3, "view", 5.0),
        # u4: view@1, click@1 (same ts: strict > fails)
        (4, "view", 1.0), (4, "click", 1.0),
    ]
    df = spark.createDataFrame(
        [(u, t, float(s)) for u, t, s in rows],
        "user_id long, event_type string, ts double",
    )
    out = {
        r.step_name: r
        for r in funnel_step_rates(
            df, ["view", "click", "purchase"], strict=True
        ).collect()
    }
    assert out["view"].n_users == 4
    assert out["click"].n_users == 1
    assert out["purchase"].n_users == 1
    assert out["click"].conv_from_prev == pytest.approx(0.25)
    assert out["purchase"].conv_from_first == pytest.approx(0.25)


def test_retention_cohorts_triangle(spark):
    from datetime import datetime, timedelta

    from etdtransform_spark.operators.funnel import retention_cohorts

    w0 = datetime(2024, 1, 1)  # a Monday (date_trunc week anchor)
    wk = timedelta(weeks=1)
    rows = [
        (1, w0), (1, w0 + wk), (1, w0 + 2 * wk),   # cohort w0: w0,w1,w2
        (2, w0 + timedelta(days=3)), (2, w0 + wk + timedelta(days=2)),
        (3, w0 + wk),                               # cohort w1 only
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = {
        (r.cohort_week, r.week_offset): r
        for r in retention_cohorts(
            df, "user_id", "ts", max_offset=8, with_rates=True
        ).collect()
    }
    assert out[(w0, 0)].cohort_size == 2 and out[(w0, 0)].n_active == 2
    assert out[(w0, 1)].n_active == 2
    assert out[(w0, 1)].retention_rate == pytest.approx(1.0)
    assert out[(w0, 2)].n_active == 1
    assert out[(w0, 2)].retention_rate == pytest.approx(0.5)
    assert out[(w0 + wk, 0)].cohort_size == 1
    # default mode (back-compat): bare triangle, no rate columns
    bare = retention_cohorts(df, "user_id", "ts")
    assert bare.columns == ["cohort_week", "week_offset", "n_active"]


def test_kaplan_meier_textbook(spark):
    """Classic small example: durations 1,2+,3 (events at 1 and 3,
    censored at 2): S(1)=2/3, S(3)=0 (d=n at t=3)."""
    from etdtransform_spark.operators.funnel import kaplan_meier

    df = spark.createDataFrame(
        [(1.0, 1), (2.0, 0), (3.0, 1)], "duration double, event int"
    )
    out = {r.t: r for r in kaplan_meier(df, "duration", "event").collect()}
    assert set(out) == {1.0, 3.0}  # censored-only times not emitted
    assert out[1.0].n_risk == 3 and out[1.0].n_events == 1
    assert out[1.0].survival == pytest.approx(2 / 3, abs=1e-6)
    assert out[3.0].n_risk == 1
    assert out[3.0].survival == 0.0


def test_top_paths_bounded_and_ordered(spark):
    from etdtransform_spark.operators.funnel import top_paths

    rows = []
    for u in range(3):
        rows += [(u, "x", 1.0, u * 10 + 1), (u, "y", 2.0, u * 10 + 2)]
    rows += [(9, "z", 1.0, 91)]
    df = spark.createDataFrame(
        rows, "u long, ty string, ts double, eid long"
    )
    out = top_paths(df, "u", "ty", "ts", order_col="eid", k=2).collect()
    assert out[0].path == "x>y" and out[0].n_users == 3
    assert out[0].path_len == 2
    assert out[1].path == "z" and out[1].n_users == 1


def test_delta_method_ratio_basic(spark):
    from etdtransform_spark.operators.stats import delta_method_ratio

    rows = [("a", 2.0, 1.0)] * 10 + [("b", 1.0, 1.0)] * 10
    df = spark.createDataFrame(rows, "arm string, x double, y double")
    r = delta_method_ratio(df, "x", "y", "arm", "a", "b").collect()[0]
    # constant columns: ratio exact, zero variance -> se 0, z NULL
    assert r.ratio_a == pytest.approx(2.0)
    assert r.ratio_b == pytest.approx(1.0)
    assert r.diff == pytest.approx(1.0)
    assert r.se == 0.0 and r.z is None
    # degenerate arm fails closed
    one = spark.createDataFrame(
        [("a", 1.0, 1.0), ("b", 1.0, 1.0)], "arm string, x double, y double"
    )
    r1 = delta_method_ratio(one, "x", "y", "arm", "a", "b").collect()[0]
    assert r1.ratio_a is None and r1.diff is None
    # empty corpus: n=0 with NULL statistics (repo fail-closed convention)
    empty = spark.createDataFrame([], "arm string, x double, y double")
    r0 = delta_method_ratio(empty, "x", "y", "arm", "a", "b").collect()[0]
    assert r0.n_a == 0 and r0.n_b == 0 and r0.ratio_a is None


def test_profile_drift_planted_null_jump(spark):
    from etdtransform_spark.operators.profile import profile_drift

    a = spark.createDataFrame(
        [(1.0, "x")] * 9 + [(None, "x")], "v double, c string"
    )
    b = spark.createDataFrame(
        [(2.0, "y")] * 5 + [(None, None)] * 5, "v double, c string"
    )
    out = {
        r.column: r
        for r in profile_drift(
            a, b, numeric_cols=["v"], categorical_cols=["c"]
        ).collect()
    }
    assert out["v"].null_rate_a == pytest.approx(0.1)
    assert out["v"].null_rate_b == pytest.approx(0.5)
    assert out["v"].null_rate_delta == pytest.approx(0.4)
    assert out["v"].mean_delta == pytest.approx(1.0)
    assert out["c"].mean_a is None and out["c"].distinct_b == 1


def test_centroid_shift_identical_and_shifted(spark):
    from etdtransform_spark.operators.embeddings import centroid_shift

    a = spark.createDataFrame(
        [(i, [1.0, 0.0]) for i in range(4)],
        "vec_id long, embedding array<double>",
    )
    same = centroid_shift(a, a, n_dims=2).collect()[0]
    assert same.l2_shift == pytest.approx(0.0)
    assert same.cosine == pytest.approx(1.0)
    b = spark.createDataFrame(
        [(i, [0.0, 1.0]) for i in range(4)],
        "vec_id long, embedding array<double>",
    )
    orth = centroid_shift(a, b, n_dims=2).collect()[0]
    assert orth.cosine == pytest.approx(0.0)
    assert orth.l2_shift == pytest.approx(2 ** 0.5, abs=1e-6)
    empty = spark.createDataFrame(
        [], "vec_id long, embedding array<double>"
    )
    deg = centroid_shift(a, empty, n_dims=2).collect()[0]
    assert deg.n_b == 0 and deg.l2_shift is None and deg.cosine is None


def test_bm25_ranking_properties(spark):
    from etdtransform_spark.operators.text import bm25_topk

    docs = spark.createDataFrame(
        [
            (1, "spark spark spark join"),          # high tf on rare term
            (2, "spark data data data data data"),  # one spark, long doc
            (3, "data join merge filter"),          # no query term
            (4, "spark"),                           # short doc, one hit
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in bm25_topk(docs, ["spark"], k=10).collect()}
    # doc 3 never matches
    assert 3 not in out and len(out) == 3
    # tf saturation + length normalization: doc1 (3x spark, len 4) beats
    # doc4 (1x, len 1) beats doc2 (1x, len 6)
    assert out[1].score > out[4].score > out[2].score
    assert out[1].n_terms_matched == 1
    # idf non-negative even for a term in every doc
    every = bm25_topk(docs, ["data"], k=10).collect()
    assert all(r.score > 0 for r in every)
    with pytest.raises(ValueError):
        bm25_topk(docs, [])


def test_rrf_fusion_consensus_wins(spark):
    from etdtransform_spark.operators.ranking import (
        reciprocal_rank_fusion,
    )

    a = spark.createDataFrame(
        [("q", "x", 1), ("q", "y", 2), ("q", "z", 3)],
        "query_id string, neighbor_id string, rank long",
    )
    b = spark.createDataFrame(
        [("q", "y", 1), ("q", "x", 2), ("q", "w", 3)],
        "query_id string, neighbor_id string, rank long",
    )
    out = {
        r.item: r
        for r in reciprocal_rank_fusion(a, b, k_const=60, topk=10).collect()
    }
    # consensus items (x, y) beat single-list items (z, w)
    assert out["x"].rrf == pytest.approx(1 / 61 + 1 / 62, abs=1e-6)
    assert out["y"].rrf == pytest.approx(1 / 62 + 1 / 61, abs=1e-6)
    assert out["x"].fused_rank <= 2 and out["y"].fused_rank <= 2
    assert out["z"].rrf == pytest.approx(1 / 63, abs=1e-6)
    assert out["z"].in_a == 1 and out["z"].in_b == 0
    assert out["w"].in_a == 0 and out["w"].in_b == 1
    # x and y tie exactly; deterministic tiebreak by item asc
    assert out["x"].fused_rank == 1 and out["y"].fused_rank == 2


def test_nelson_aalen_textbook(spark):
    """Durations 1, 2+, 3 (events at 1 and 3, censored at 2):
    H(1)=1/3, H(3)=1/3+1/1=4/3; var 1/9 then 1/9+1."""
    from etdtransform_spark.operators.funnel import nelson_aalen

    df = spark.createDataFrame(
        [(1.0, 1), (2.0, 0), (3.0, 1)], "duration double, event int"
    )
    out = {r.t: r for r in nelson_aalen(df, "duration", "event").collect()}
    assert set(out) == {1.0, 3.0}
    assert out[1.0].cum_hazard == pytest.approx(1 / 3, abs=1e-6)
    assert out[1.0].cum_hazard_var == pytest.approx(1 / 9, abs=1e-6)
    assert out[3.0].cum_hazard == pytest.approx(4 / 3, abs=1e-6)
    assert out[3.0].cum_hazard_var == pytest.approx(1 / 9 + 1, abs=1e-6)


def test_post_stratified_mean_corrects_skew(spark):
    from etdtransform_spark.operators.stats import post_stratified_mean

    # stratum a (true mean 10) oversampled 4:1 vs b (true mean 0);
    # population is actually 50/50 -> raw mean 8, post-stratified 5
    rows = [("a", 10.0)] * 8 + [("b", 0.0)] * 2
    df = spark.createDataFrame(rows, "s string, x double")
    r = post_stratified_mean(df, "x", "s", {"a": 0.5, "b": 0.5}).collect()[0]
    assert r.mean_raw == pytest.approx(8.0)
    assert r.mean_post_stratified == pytest.approx(5.0)
    assert r.se_post_stratified == 0.0  # zero within-stratum variance
    assert r.n_strata == 2 and r.n_empty_strata == 0

    # a declared stratum with no data fails the estimate closed
    r2 = post_stratified_mean(
        df, "x", "s", {"a": 0.5, "b": 0.3, "c": 0.2}
    ).collect()[0]
    assert r2.n_empty_strata == 1
    assert r2.mean_post_stratified is None
    # an observed stratum with no declared share is dropped + counted
    r3 = post_stratified_mean(df, "x", "s", {"a": 1.0}).collect()[0]
    assert r3.n_unknown_strata == 1
    assert r3.mean_post_stratified == pytest.approx(10.0)
    assert r3.mean_raw == pytest.approx(10.0)  # only weighted strata
    with pytest.raises(ValueError):
        post_stratified_mean(df, "x", "s", {"a": 0.5})
