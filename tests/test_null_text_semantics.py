"""NULL/empty-text semantics for the document operators.

The driver fixture is null-free, so the oracle gate can never catch a
null-handling divergence (the ADVICE round-1 pattern). These tests pin the
declared semantics — NULL text drops out of shingle-based operators instead
of fabricating a '' shingle via concat_ws, and never counts as an exact
duplicate — and prove Spark/DuckDB parity end-to-end on a corpus that DOES
contain NULL and empty documents.
"""

from __future__ import annotations

import os

import duckdb
import pytest
from pyspark.sql import functions as F

from etdtransform_spark.functions.hashing import word_shingles
from etdtransform_spark.operators import corpus, dedup


ROWS = [
    (1, "a b c d e", "s1"),
    (2, None, "s1"),
    (3, "", "s2"),
    (4, "a b c d e", "s2"),
    (5, None, "s2"),
    (6, "", "s1"),
]
SCHEMA = "doc_id bigint, text string, lang string, source string"


def _docs(spark):
    return spark.createDataFrame(
        [(i, t, "en", s) for i, t, s in ROWS], SCHEMA
    )


def test_word_shingles_null_propagates(spark):
    out = _docs(spark).select(
        "doc_id", word_shingles("text", 3).alias("sh")
    ).collect()
    got = {r.doc_id: r.sh for r in out}
    assert got[1] == ["a b c", "b c d", "c d e"]
    assert got[2] is None  # NULL text -> NULL array, not ['']
    assert got[3] is None  # zero-token text -> NULL array too


def test_shingle_joins_drop_null_docs(spark):
    pairs = dedup.ngram_jaccard_pairs(
        _docs(spark), id_col="doc_id", threshold=0.8
    ).collect()
    got = {(r.id_a, r.id_b) for r in pairs}
    # the two real duplicates pair; NULL and empty docs pair with nothing
    assert got == {(1, 4)}


def test_containment_drops_null_docs(spark):
    pairs = dedup.containment_pairs(_docs(spark), threshold=0.8).collect()
    assert all(r.id_a not in (2, 5) and r.id_b not in (2, 5) for r in pairs)


def test_cross_source_dup_excludes_null_text(spark):
    got = {
        (r.source_a, r.source_b): r.n_dup_pairs
        for r in dedup.cross_source_duplication(_docs(spark)).collect()
    }
    # 'a b c d e' spans s1 x s2 (1 pair); '' spans s1 x s2 (1 pair);
    # the four NULL-text docs contribute nothing
    assert got == {("s1", "s2"): 2}


def test_novelty_drops_null_docs(spark):
    out = {r.doc_id for r in corpus.ngram_novelty(_docs(spark)).collect()}
    assert out == {1, 4}


# the contract queries that the round-2 null sweep caught diverging (plus
# the two new provenance ops): the full corpus-wide sweep is
# scripts/make_null_fixture.py + tests/oracle_harness.py; this pins the
# fixed ones in CI on a tiny corpus
NULL_SENSITIVE_QUERIES = [
    "dedup_exact",
    "fingerprint",
    "ngram_jaccard",
    "ngram_novelty",
    "cross_source_dup",
    "chunk_documents",
    "repetition_ratio",
    "gopher_gate",
    "frame_sample",
    "multimodal_features",
    "token_counts",
]


# event queries the round-2 events-null sweep caught diverging: NULL-ts
# ingestion gate, NULLS FIRST ordering, empty-list array_to_string,
# malformed JSON, all-null EWMA frames, never-observed stateful keys
NULL_SENSITIVE_EVENT_QUERIES = [
    "window_lag_diff",
    "window_rank_family",
    "ewma",
    "json_extract",
    "union_evolved",
    "session_paths",
    "resample_15min",
    "group_mode",
    "merge_intervals",
    "touch_attribution",
]


def test_oracle_parity_with_null_events(spark, tmp_path):
    """The NULL-ts ingestion gate (_t/_EV), NULLS FIRST window ordering,
    and JSON/empty-list guards hold end-to-end on an events table with
    NULL ts/user/type/value and malformed JSON props."""
    import __spark_entry__ as e
    import oracle_harness

    rows = [
        (i, f"2024-01-{(i % 27) + 1:02d} {(i * 7) % 24:02d}:15:00",
         i % 4, ["click", "view", "purchase", "error"][i % 4],
         float(i % 11) if i % 5 else None, None)
        for i in range(120)
    ] + [
        (990001, None, 3, "click", 1.5, None),
        (990002, "2024-01-15 12:00:00", None, "view", None, '{"plan": 1}'),
        (990003, "2024-01-16 08:30:00", 5, None, 2.0, None),
        (990004, None, None, None, None, None),
        (990005, "2024-01-17 20:45:00", 7, "purchase", None, "not-json"),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id bigint, ts string, user_id bigint, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    ev.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(str(tmp_path), "events.parquet")
    )
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW events AS FROM '{tmp_path}/events.parquet/*.parquet'"
    )

    qs, sqls = e.queries(), e.oracle_sql()
    failures = {}
    for name in NULL_SENSITIVE_EVENT_QUERIES:
        try:
            problems = oracle_harness.compare_query(
                spark, con, name, qs[name], sqls[name], str(tmp_path)
            )
        except Exception as ex:  # noqa: BLE001
            problems = [f"EXCEPTION: {type(ex).__name__}: {str(ex)[:200]}"]
        if problems:
            failures[name] = problems
    assert not failures, f"null-events divergences: {failures}"


# ANN queries gated by the embeddings ingestion filter (NULL/empty/
# NULL-element vectors quarantined — DuckDB's list_inner_product errors
# on NULL elements, Spark's zip_with fold silently yields NULL)
NULL_SENSITIVE_EMBEDDING_QUERIES = [
    "embedding_norms",
    "cosine_topk",
    "embedding_near_dup",
    "ivf_topk",
    "quantize_embeddings",
    "embedding_centroids",
]


def test_oracle_parity_with_null_embeddings(spark, tmp_path):
    """The embeddings ingestion gate (_t/_EMB) holds end-to-end on a table
    with NULL, empty, and NULL-element vectors."""
    import __spark_entry__ as e
    import oracle_harness

    dim = 8
    import random

    rng = random.Random(7)
    rows = [
        (i, [round(rng.uniform(-1, 1), 3) for _ in range(dim)], i % 3)
        for i in range(60)
    ] + [
        (880001, None, 1),
        (880002, [], None),
        (880003, [None] + [0.25] * (dim - 1), 2),
        (880004, [0.5] * dim, None),
    ]
    emb = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    )
    emb.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(str(tmp_path), "embeddings.parquet")
    )
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW embeddings AS "
        f"FROM '{tmp_path}/embeddings.parquet/*.parquet'"
    )

    qs, sqls = e.queries(), e.oracle_sql()
    failures = {}
    for name in NULL_SENSITIVE_EMBEDDING_QUERIES:
        try:
            problems = oracle_harness.compare_query(
                spark, con, name, qs[name], sqls[name], str(tmp_path)
            )
        except Exception as ex:  # noqa: BLE001
            problems = [f"EXCEPTION: {type(ex).__name__}: {str(ex)[:200]}"]
        if problems:
            failures[name] = problems
    assert not failures, f"null-embeddings divergences: {failures}"


def test_oracle_parity_with_null_documents(spark, tmp_path):
    """End-to-end: every null-sensitive contract oracle agrees with its
    Spark query on a corpus containing NULL/empty/whitespace text — the
    exact divergence class the null-free driver fixture cannot see."""
    import __spark_entry__ as e
    import oracle_harness

    docs_null = spark.createDataFrame(
        [(i, t, "en" if i % 2 else None, s, len(t) if t else None)
         for i, t, s in ROWS]
        + [(7, "the quick brown fox jumps over the lazy dog", "en", "s1", 43),
           (8, "   ", None, "books", 3)],
        "doc_id bigint, text string, lang string, source string, "
        "n_chars bigint",
    )
    docs_null.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(str(tmp_path), "documents.parquet")
    )
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS "
        f"FROM '{tmp_path}/documents.parquet/*.parquet'"
    )

    qs, sqls = e.queries(), e.oracle_sql()
    failures = {}
    for name in NULL_SENSITIVE_QUERIES:
        problems = oracle_harness.compare_query(
            spark, con, name, qs[name], sqls[name], str(tmp_path)
        )
        if problems:
            failures[name] = problems
    assert not failures, f"null-corpus divergences: {failures}"
