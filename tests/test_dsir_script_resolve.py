"""Round-3 LLM-pipeline additions: DSIR importance weights, Unicode script
profiling, quality-aware dedup resolution."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_dsir_prefers_target_like_documents(spark):
    """Documents sharing the target sample's vocabulary must outscore
    documents made of off-target vocabulary; zero-token docs drop."""
    from etdtransform_spark.operators.corpus import dsir_importance_weights

    target_text = "alpha beta gamma alpha beta"
    rows = [
        (1, target_text, "t"),          # the target sample itself
        (2, "alpha beta gamma", "s"),   # target-like candidate
        (3, "zz yy xx ww vv uu", "s"),  # off-target candidate
        (4, "   ", "s"),                # zero tokens -> dropped
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, src string")
    out = {
        r.doc_id: r
        for r in dsir_importance_weights(
            df, target=F.col("src") == "t", n_buckets=32, top_n=2
        ).collect()
    }
    assert set(out) == {1, 2, 3}
    assert out[2].logw > out[3].logw
    assert out[2].selected and not out[3].selected
    assert out[2].n_tokens == 3


def test_dsir_deterministic_across_runs(spark):
    from etdtransform_spark.operators.corpus import dsir_importance_weights

    rows = [(i, f"w{i % 7} w{i % 5} common", "t" if i % 4 == 0 else "s")
            for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string, src string")
    a = sorted(map(tuple, dsir_importance_weights(
        df, F.col("src") == "t", n_buckets=16, top_n=10).collect()))
    b = sorted(map(tuple, dsir_importance_weights(
        df, F.col("src") == "t", n_buckets=16, top_n=10).collect()))
    assert a == b
    assert sum(1 for r in a if r[4]) == 10  # exactly top_n selected


def test_dsir_bigram_features(spark):
    """ngram=2 (the paper's hashed-bigram model): a candidate sharing the
    target's word ORDER outscores one with the same words scrambled —
    unigram features cannot tell them apart, bigrams can. Docs shorter
    than the n-gram width have no features and drop."""
    from etdtransform_spark.operators.corpus import dsir_importance_weights

    rows = [
        (1, "the quick brown fox jumps", "t"),
        (2, "the quick brown fox leaps", "s"),   # shares 3 target bigrams
        (3, "fox the brown jumps quick", "s"),   # same words, no bigrams
        (4, "single", "s"),                      # 1 token -> no bigrams
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, src string")
    out = {r.doc_id: r for r in dsir_importance_weights(
        df, F.col("src") == "t", n_buckets=64, ngram=2).collect()}
    assert set(out) == {1, 2, 3}
    assert out[2].logw > out[3].logw
    assert out[1].n_tokens == 4  # 5 tokens -> 4 bigrams


def test_script_profile_counts_and_dominant(spark):
    from etdtransform_spark.operators.text import script_profile

    rows = [
        (1, "Hello Привет 你好"),       # latin 5, cyrillic 6, han 2
        (2, "Привет мир"),              # cyrillic dominant
        (3, "12345 !!"),                # no script chars -> NULL dominant
        (4, None),                      # NULL text -> NULL everything
        (5, "abc абв"),                 # tie 3-3 -> priority order: latin
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in script_profile(df).collect()}
    assert out[1].n_latin == 5 and out[1].n_cyrillic == 6 and out[1].n_han == 2
    assert out[1].dominant_script == "cyrillic"
    assert out[2].dominant_script == "cyrillic"
    assert out[3].dominant_script is None and out[3].n_digit == 5
    assert out[4].n_chars_total is None and out[4].dominant_script is None
    assert out[5].dominant_script == "latin"
    # other = total - all classified
    assert out[1].n_other == out[1].n_chars_total - (
        out[1].n_latin + out[1].n_cyrillic + out[1].n_han + out[1].n_arabic
        + out[1].n_greek + out[1].n_digit + out[1].n_space
    )


def test_resolve_best_keeps_highest_quality(spark):
    from etdtransform_spark.operators.dedup import resolve_duplicates_best

    docs = spark.createDataFrame(
        [(1, 100), (2, 300), (3, 200), (9, 50), (10, None)],
        "doc_id long, n_chars int",
    )
    # {1,2,3} one cluster; 9 singleton; 10 singleton with NULL quality
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
    out = {r.doc_id: r for r in
           resolve_duplicates_best(docs, pairs, "n_chars").collect()}
    assert [out[i].keep for i in (1, 2, 3)] == [False, True, False]
    assert out[2].cluster_id == out[1].cluster_id == out[3].cluster_id == 1
    assert out[9].keep and out[10].keep  # singletons always survive
    assert out[10].quality == -1  # NULL quality coalesced, still total order


def test_dsir_sampled_topn_matches_exact_selection(spark):
    """exact=False (approx-percentile boundary slice) must select the SAME
    documents as the exact global rank, give them the same ranks, and mark
    everything else rank=NULL/selected=false — with the global sort shrunk
    to the candidate slice (plan shows the two-branch union)."""
    from etdtransform_spark.operators.corpus import dsir_importance_weights

    rows = [
        (i, " ".join(f"w{(i * j) % 23}" for j in range(1, 8)),
         "t" if i % 9 == 0 else "s")
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, src string")
    tgt = F.col("src") == "t"
    exact = dsir_importance_weights(df, target=tgt, n_buckets=64, top_n=25)
    approx = dsir_importance_weights(
        df, target=tgt, n_buckets=64, top_n=25, exact=False
    )
    plan = approx._jdf.queryExecution().executedPlan().toString()
    assert "Union" in plan  # boundary-slice path actually taken
    ex = {r.doc_id: r for r in exact.collect()}
    ap = {r.doc_id: r for r in approx.collect()}
    assert set(ex) == set(ap)
    assert {d for d, r in ex.items() if r.selected} == {
        d for d, r in ap.items() if r.selected
    }
    for d, r in ap.items():
        if r.selected:
            assert r.rank == ex[d].rank
        else:
            assert r.rank is None or r.rank == ex[d].rank
        assert r.logw == ex[d].logw


def test_dsir_sampled_small_corpus_falls_back_exact(spark):
    """top_n >= corpus size: every doc selected, ranks dense, no union."""
    from etdtransform_spark.operators.corpus import dsir_importance_weights

    rows = [(i, f"a b c w{i}", "t" if i == 0 else "s") for i in range(8)]
    df = spark.createDataFrame(rows, "doc_id long, text string, src string")
    out = dsir_importance_weights(
        df, target=F.col("src") == "t", n_buckets=16, top_n=50, exact=False
    ).collect()
    assert all(r.selected for r in out)
    assert sorted(r.rank for r in out) == list(range(1, len(out) + 1))
