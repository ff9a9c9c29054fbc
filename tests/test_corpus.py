"""Unit tests for corpus-prep operators: chunk boundaries, packing
semantics, PII overlap ordering, contamination exactness."""

from __future__ import annotations

from pyspark.sql import functions as F

from etdtransform_spark.operators.corpus import (
    chunk_documents,
    contamination,
    pack_documents,
    scrub_pii,
)


def _doc(spark, text, doc_id=1, source="web"):
    return spark.createDataFrame(
        [(doc_id, text, source)], "doc_id long, text string, source string"
    )


def test_chunk_exact_boundaries(spark):
    words = [f"w{i}" for i in range(100)]
    out = chunk_documents(
        _doc(spark, " ".join(words)), chunk_tokens=64, overlap=16
    ).collect()
    by_id = {r.chunk_id: r for r in out}
    # starts at 0, 48 (96 > upper-1 = 83)
    assert sorted(by_id) == [0, 1]
    assert by_id[0].chunk_start == 0 and by_id[0].n_chunk_tokens == 64
    assert by_id[0].chunk_text.split(" ") == words[:64]
    assert by_id[1].chunk_start == 48 and by_id[1].n_chunk_tokens == 52
    assert by_id[1].chunk_text.split(" ") == words[48:100]
    # overlap region is shared
    assert by_id[0].chunk_text.split(" ")[48:] == by_id[1].chunk_text.split(" ")[:16]


def test_chunk_short_doc_single_chunk(spark):
    out = chunk_documents(_doc(spark, "a b c"), chunk_tokens=64, overlap=16).collect()
    assert len(out) == 1
    assert out[0].n_chunk_tokens == 3 and out[0].chunk_text == "a b c"


def test_chunk_exact_multiple(spark):
    # n = chunk_tokens: exactly one chunk, not one plus an overlap-only tail
    words = " ".join(f"w{i}" for i in range(64))
    out = chunk_documents(_doc(spark, words), chunk_tokens=64, overlap=16).collect()
    assert len(out) == 1


def test_pack_documents_bins_and_straddle(spark):
    rows = [
        (1, "a " * 1000, "web"),   # 1000 tokens -> bin 0, offset 0
        (2, "b " * 1500, "web"),   # starts at 1000 -> bin 0, straddles into 1
        (3, "c " * 10, "web"),     # starts at 2500 -> bin 1
        (4, "d " * 5, "books"),    # separate partition -> bin 0
    ]
    df = spark.createDataFrame(
        [(i, t.strip(), s) for i, t, s in rows],
        "doc_id long, text string, source string",
    )
    out = {
        r.doc_id: (r.bin_id, r.bin_offset, r.n_tokens)
        for r in pack_documents(df, budget_tokens=2048).collect()
    }
    assert out[1] == (0, 0, 1000)
    assert out[2] == (0, 1000, 1500)
    assert out[3] == (1, 2500 % 2048, 10)
    assert out[4] == (0, 0, 5)


def test_scrub_pii_all_categories_and_order(spark):
    text = (
        "see https://x.org/a/1234567890 mail bob@x.org "
        "server 192.168.0.1 call +31 6 1234 5678 end"
    )
    r = scrub_pii(_doc(spark, text)).collect()[0]
    assert (r.n_url, r.n_email, r.n_ip, r.n_phone) == (1, 1, 1, 1)
    s = r.text_scrubbed
    for tok in ("<URL>", "<EMAIL>", "<IP>", "<PHONE>"):
        assert tok in s, s
    assert "bob@" not in s and "192.168" not in s and "1234 5678" not in s
    # URL digits were consumed by <URL> BEFORE the phone pass: no phone
    # match inside the url, and the url count is exactly 1
    assert s.count("<PHONE>") == 1


def test_scrub_pii_clean_text_identity(spark):
    r = scrub_pii(_doc(spark, "just plain words here")).collect()[0]
    assert (r.n_url, r.n_email, r.n_ip, r.n_phone) == (0, 0, 0, 0)
    assert r.text_scrubbed == "just plain words here"


def test_contamination_exact_shared_ngrams(spark):
    bench = _doc(spark, "one two three four five six", doc_id=100)
    corpus = spark.createDataFrame(
        [
            (1, "zero one two three four five seven"),  # shares 2 5-grams
            (2, "totally unrelated words in this doc x"),  # clean
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.n_shared for r in contamination(corpus, bench, n=5).collect()}
    # corpus doc 1 shingles: (zero..four),(one..five),(two..seven); bench has
    # (one..five),(two..six) -> exactly 1 shared
    assert got == {1: 1}


def test_word_shingle_hashes_matches_string_shingles(spark):
    """word_shingle_hashes must induce the SAME per-doc distinct counts and
    the same cross-doc intersection counts as hashing word_shingles'
    strings — the equality structure contamination's join consumes.
    Covers: normal docs, repeated shingles (array_distinct), short docs
    (< n tokens → one shingle of all tokens), single-token, NULL and
    empty/whitespace-only text (NULL array → row absent at explode)."""
    from pyspark.sql import functions as F

    from etdtransform_spark.functions.hashing import (
        word_shingle_hashes,
        word_shingles,
    )

    rows = [
        (1, "a b c d e f"),
        (2, "a b c a b c a b c"),          # repeated shingles collapse
        (3, "x y"),                         # short doc: one 2-token shingle
        (4, "solo"),                        # single token
        (5, None),                          # NULL text
        (6, "   "),                         # whitespace-only -> 0 tokens
        (7, "b c d e f g"),                 # overlaps doc 1
        (8, "x y"),                         # exact short-doc match with 3
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    n = 3
    via_str = df.select(
        "doc_id",
        F.transform(
            word_shingles("text", n), lambda s: F.xxhash64(s)
        ).alias("sh"),
    ).collect()
    via_hash = df.select(
        "doc_id", word_shingle_hashes("text", n).alias("sh")
    ).collect()
    s = {r.doc_id: r.sh for r in via_str}
    h = {r.doc_id: r.sh for r in via_hash}
    assert set(s) == set(h)
    for d in s:
        # NULL-ness and distinct count agree per doc
        assert (s[d] is None) == (h[d] is None), d
        if s[d] is not None:
            assert len(set(s[d])) == len(s[d])  # word_shingles is distinct
            assert len(set(h[d])) == len(h[d])
            assert len(s[d]) == len(h[d]), d
    # pairwise intersection counts agree (the join semantics)
    ids = [d for d in s if s[d] is not None]
    for i in ids:
        for j in ids:
            if i < j:
                assert len(set(s[i]) & set(s[j])) == len(
                    set(h[i]) & set(h[j])
                ), (i, j)


def _mix_corpus(spark, sizes):
    rows = []
    i = 0
    for grp, n in sizes.items():
        for _ in range(n):
            rows.append((i, f"text {i}", grp))
            i += 1
    return spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    )


def test_rebalance_binding_group_kept_whole(spark):
    from etdtransform_spark.operators.corpus import rebalance_mixture

    # b binds: T = min(300/0.5, 60/0.5) = 120 -> b rate 1.0, a rate 0.2
    df = _mix_corpus(spark, {"a": 300, "b": 60})
    out = rebalance_mixture(df, "source", "doc_id", {"a": 0.5, "b": 0.5})
    counts = {r.source: r.n for r in
              out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert counts["b"] == 60  # binding group never thinned
    # a is hash-thinned toward 60; binomial(300, 0.2) stays well inside
    assert 35 <= counts.get("a", 0) <= 85, counts
    rates = {r.source: r.accept_rate
             for r in out.select("source", "accept_rate").distinct().collect()}
    assert rates["b"] == 1.0
    assert abs(rates["a"] - 0.2) < 1e-9


def test_rebalance_drops_untargeted_and_is_deterministic(spark):
    from etdtransform_spark.operators.corpus import rebalance_mixture

    # a is thinned (rate 0.5: T = min(80/.5, 40/.5) = 80), so the seed
    # actually selects a subset — equal group sizes would make every rate
    # 1.0 and the seed-sensitivity check vacuous
    df = _mix_corpus(spark, {"a": 80, "b": 40, "junk": 50})
    out = rebalance_mixture(df, "source", "doc_id", {"a": 0.5, "b": 0.5})
    assert out.filter(F.col("source") == "junk").count() == 0
    ids1 = sorted(r.doc_id for r in out.select("doc_id").collect())
    ids2 = sorted(
        r.doc_id
        for r in rebalance_mixture(
            df, "source", "doc_id", {"a": 0.5, "b": 0.5}
        ).select("doc_id").collect()
    )
    assert ids1 == ids2  # hash acceptance, not rand(): rerun-identical
    # a different seed samples a different corpus
    ids3 = sorted(
        r.doc_id
        for r in rebalance_mixture(
            df, "source", "doc_id", {"a": 0.5, "b": 0.5}, seed="other"
        ).select("doc_id").collect()
    )
    assert ids1 != ids3


def test_rebalance_validates_weights(spark):
    import pytest

    from etdtransform_spark.operators.corpus import rebalance_mixture

    df = _mix_corpus(spark, {"a": 10})
    with pytest.raises(ValueError, match="sum to 1"):
        rebalance_mixture(df, "source", "doc_id", {"a": 0.5})
    with pytest.raises(ValueError, match="strictly positive"):
        rebalance_mixture(df, "source", "doc_id", {"a": 1.5, "b": -0.5})


def test_remove_duplicate_spans_crafted(spark):
    """Canonical (first) occurrence keeps its text; later exact 3-gram
    occurrences are cut, including the within-doc repeat; short docs pass
    through with whitespace normalized."""
    from etdtransform_spark.operators.corpus import remove_duplicate_spans

    docs = spark.createDataFrame(
        [
            # doc 1 owns "x y z" (lowest doc id, first position)
            (1, "a b x y z c"),
            # doc 2 repeats it -> those 3 tokens vanish
            (2, "p q x y z r"),
            # doc 3: within-doc repetition, second occurrence cut
            (3, "x y z m n x y z"),
            # doc 4: too short for any 3-gram -> untouched (normalized)
            (4, "  just   two "),
        ],
        ["doc_id", "text"],
    )
    out = {
        r.doc_id: r
        for r in remove_duplicate_spans(docs, n=3).collect()
    }
    assert out[1].clean_text == "a b x y z c" and out[1].n_removed == 0
    assert out[2].clean_text == "p q r" and out[2].n_removed == 3
    # doc 3: grams at pos 1 ("x y z") dup (doc1 owns), pos 6 dup too;
    # middle grams ("y z m" etc.) unique -> only overlapping cover counts
    assert out[3].n_removed >= 3
    assert "m n" in out[3].clean_text or out[3].clean_text == ""
    assert out[4].clean_text == "just two" and out[4].n_removed == 0


def test_remove_duplicate_spans_overlap_cover(spark):
    """Overlapping duplicated spans cover the union of their tokens, not
    double-remove; a doc duplicating a long passage loses exactly that
    passage."""
    from etdtransform_spark.operators.corpus import remove_duplicate_spans

    long = "one two three four five six"
    docs = spark.createDataFrame(
        [(1, long + " tail"), (2, "head " + long)],
        ["doc_id", "text"],
    )
    out = {
        r.doc_id: r for r in remove_duplicate_spans(docs, n=3).collect()
    }
    # doc2's copies of every 3-gram of the passage are all non-canonical
    # (doc1 is lower), so the whole passage goes; 'head' survives only if
    # not covered — "head one two" is a unique gram but its span covers
    # 'head'? No: gram "head one two" occurs once -> canonical -> kept.
    assert out[1].n_removed == 0
    assert out[2].clean_text.startswith("head")
    assert "six" not in out[2].clean_text.split()[1:] or out[2].n_removed >= 4


def test_bpe_train_classic_corpus(spark):
    """Sennrich-style toy corpus: merge order follows pair frequency with
    deterministic lexicographic ties; word boundaries never merge across."""
    from etdtransform_spark.operators.corpus import bpe_encode, bpe_train

    text = " ".join(
        ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    )
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    merges = bpe_train(df, n_merges=5)
    assert merges[0] == ("e", "s", 9)
    assert merges[1] == ("es", "t", 9)
    assert merges[2] == ("est", "</w>", 9)
    assert merges[3][:2] == ("l", "o")

    [enc] = bpe_encode(df, merges).collect()
    assert enc.n_words == 16
    # with more merges, token count must not increase
    merges8 = bpe_train(df, n_merges=8)
    [enc8] = bpe_encode(df, merges8).collect()
    assert enc8.n_bpe_tokens <= enc.n_bpe_tokens


def test_bpe_merge_application_nonoverlapping(spark):
    """aaa with merge (a,a) -> [aa, a, </w>]: left-to-right, no overlap."""
    from pyspark.sql import functions as F

    from etdtransform_spark.operators.corpus import _bpe_apply_merge

    df = spark.createDataFrame([(["a", "a", "a", "</w>"],)], ["syms"])
    [r] = df.select(
        _bpe_apply_merge(F.col("syms"), "a", "a").alias("out")
    ).collect()
    assert r.out == ["aa", "a", "</w>"]


def test_remove_boilerplate_lines(spark):
    from etdtransform_spark.operators.corpus import remove_boilerplate_lines

    header = "SITE NAV | home | about"
    rows = [
        (1, header + "\n\nunique body one\nsecond line one"),
        (2, header + "\nunique body two"),
        (3, header + "\nunique body three\n  " + header + "  "),
        (4, None),                      # NULL text: excluded entirely
        (5, "only unique content"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in remove_boilerplate_lines(
        df, min_doc_frac=0.5, min_docs=2).collect()}
    assert set(out) == {1, 2, 3, 5}
    # header appears in 3 of 4 counted docs -> boilerplate everywhere,
    # including the whitespace-padded variant (trim-matched)
    assert out[1].text_clean == "\nunique body one\nsecond line one"
    assert out[1].n_lines == 4 and out[1].n_removed == 1
    assert out[1].removed_ratio == 0.25
    assert out[2].text_clean == "unique body two"
    assert out[3].text_clean == "unique body three"
    assert out[3].n_removed == 2  # raw and padded header both dropped
    assert out[5].text_clean == "only unique content"
    assert out[5].n_removed == 0

    # below both thresholds nothing is dropped (min_docs floor binds)
    two = spark.createDataFrame(rows[:1] + rows[4:], "doc_id long, text string")
    kept = {r.doc_id: r for r in remove_boilerplate_lines(
        two, min_doc_frac=0.9, min_docs=2).collect()}
    assert kept[1].n_removed == 0

    # fully-boilerplate doc comes back emptied, not dropped
    all_bp = spark.createDataFrame(
        [(1, header), (2, header)], "doc_id long, text string"
    )
    e = {r.doc_id: r for r in remove_boilerplate_lines(
        all_bp, min_doc_frac=0.5, min_docs=2).collect()}
    assert e[1].text_clean == "" and e[1].removed_ratio == 1.0

    empty = spark.createDataFrame([], "doc_id long, text string")
    assert remove_boilerplate_lines(empty).count() == 0
