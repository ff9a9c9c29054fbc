"""Unit tests for the corpus-provenance additions: per-document n-gram
novelty (corpus-level templatedness score) and the cross-source exact-
duplication matrix (count-product pair tally, no pair materialization)."""

from __future__ import annotations

import pytest

from etdtransform_spark.operators.corpus import ngram_novelty
from etdtransform_spark.operators.dedup import cross_source_duplication


def test_ngram_novelty_known_overlap(spark):
    # docs 1 and 2 share their only 3-gram; doc 3 is disjoint.
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c"), (3, "x y z")],
        "doc_id bigint, text string",
    )
    got = {r.doc_id: r for r in ngram_novelty(df, n=3, min_df=2).collect()}
    assert got[1].n_shingles == 1 and got[1].n_shared == 1
    assert got[1].novelty == 0.0 and got[2].novelty == 0.0
    assert got[3].n_shingles == 1 and got[3].n_shared == 0
    assert got[3].novelty == 1.0


def test_ngram_novelty_partial_and_short_docs(spark):
    # doc 1: 4 tokens -> 2 shingles ("a b c", "b c d"); doc 2 shares only
    # "a b c". doc 3 is shorter than n -> one whole-doc shingle, unshared.
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c"), (3, "qq zz")],
        "doc_id bigint, text string",
    )
    got = {r.doc_id: r for r in ngram_novelty(df, n=3, min_df=2).collect()}
    assert (got[1].n_shingles, got[1].n_shared) == (2, 1)
    assert got[1].novelty == pytest.approx(0.5, abs=1e-9)
    assert got[2].novelty == 0.0
    assert got[3].novelty == 1.0


def test_ngram_novelty_hot_shingle_is_aggregate_not_join(spark):
    # A boilerplate shingle shared by every document must not create a pair
    # join: output stays one row per document and the plan has no
    # cartesian/BNLJ (the engine-wide sweep asserts this too; here we pin
    # the row count against the k-document hot key).
    k = 50
    df = spark.createDataFrame(
        [(i, "same old line") for i in range(k)], "doc_id bigint, text string"
    )
    out = ngram_novelty(df, n=3, min_df=2)
    rows = out.collect()
    assert len(rows) == k
    assert all(r.novelty == 0.0 for r in rows)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_per_source_cap_deterministic_and_partial_limit(spark):
    from etdtransform_spark.operators.corpus import per_source_cap

    rows = [(i, "doc %d" % i, "s%d" % (i % 3)) for i in range(90)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string, source string")
    out = per_source_cap(df, max_docs=10)
    got = out.collect()
    # exactly 10 per source, ranks 1..10, and a re-run picks the same docs
    by_src = {}
    for r in got:
        by_src.setdefault(r.source, []).append((r.sample_rank, r.doc_id))
    assert set(by_src) == {"s0", "s1", "s2"}
    for v in by_src.values():
        assert sorted(r for r, _ in v) == list(range(1, 11))
    again = {(r.source, r.doc_id) for r in per_source_cap(df, max_docs=10).collect()}
    assert again == {(r.source, r.doc_id) for r in got}
    # the rank filter must compile to the partial+final WindowGroupLimit so
    # a hot source is pruned map-side before the shuffle
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan
    assert "Partial" in plan


def test_cross_source_duplication_counts(spark):
    # text "t1": 2 copies in s1, 1 in s2 -> within-s1 pair = 1, s1xs2 = 2.
    # text "t2": only s2, 3 copies -> within-s2 pairs = 3.
    # text "u": unique -> contributes nothing.
    rows = [
        (1, "t1", "s1"),
        (2, "t1 ", "s1"),  # whitespace-normalized duplicate
        (3, "T1", "s2"),   # case-normalized duplicate
        (4, "t2", "s2"),
        (5, "t2", "s2"),
        (6, "t2", "s2"),
        (7, "u", "s1"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string, source string")
    got = {
        (r.source_a, r.source_b): (r.n_texts, r.n_dup_pairs)
        for r in cross_source_duplication(df).collect()
    }
    assert got[("s1", "s1")] == (1, 1)
    assert got[("s1", "s2")] == (1, 2)
    assert got[("s2", "s2")] == (1, 3)
    # no zero rows for untouched pairs
    assert ("s2", "s1") not in got and len(got) == 3


def test_cross_source_duplication_hot_text_stays_count_sized(spark):
    # One text duplicated 100x across two sources: the pair tally is a
    # product of two counts (50*50 cross + 2*C(50,2) within), computed from
    # TWO count rows — never 100^2 materialized pairs.
    rows = [(i, "boilerplate page", "s%d" % (i % 2)) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string, source string")
    got = {
        (r.source_a, r.source_b): r.n_dup_pairs
        for r in cross_source_duplication(df).collect()
    }
    assert got[("s0", "s1")] == 50 * 50
    assert got[("s0", "s0")] == 50 * 49 // 2
    assert got[("s1", "s1")] == 50 * 49 // 2
