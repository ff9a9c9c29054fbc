"""Zero-row input behavior for the model-sync operators.

An empty corpus must yield an empty, correctly-schemaed result — not an
analysis error from a VOID-typed literal (kmeans/PQ centroid arrays), a
driver-side TypeError (first()[...] on no rows), or a numpy axis error
(0-vector matrix). Caught by the round-2 empty-fixture sweep
(scripts/make_null_fixture.py's sibling: every table filtered to 0 rows,
full harness run); pinned here per operator.
"""

from __future__ import annotations

from etdtransform_spark.operators.dedup import embedding_near_duplicates
from etdtransform_spark.operators.similarity import (
    kmeans,
    pq_adc_topk,
    pq_deterministic_codebook,
    pq_encode,
    pq_train,
    semantic_dedup,
)

EMB_SCHEMA = "vec_id bigint, embedding array<float>, label int"


def _empty(spark):
    return spark.createDataFrame([], EMB_SCHEMA)


def test_kmeans_empty_corpus(spark):
    out = kmeans(_empty(spark), k=4, iters=2)
    assert out.collect() == []
    assert set(out.columns) == {"cluster_id", "n_members", "inertia", "centroid"}


def test_semantic_dedup_empty_corpus(spark):
    out = semantic_dedup(_empty(spark), k=4, iters=2)
    assert out.collect() == []
    assert set(out.columns) == {"vec_id", "cluster_id", "keep"}


def test_pq_family_empty_corpus(spark):
    empty = _empty(spark)
    cb = pq_train(empty, m=2, k=4, iters=1)
    assert cb.collect() == []
    cb2 = pq_deterministic_codebook(empty, m=2, k=4)
    assert cb2.collect() == []
    codes = pq_encode(empty, cb)
    assert codes.collect() == []
    topk = pq_adc_topk(empty, codes, cb, k=3)
    assert topk.collect() == []


def test_embedding_near_dup_empty_corpus(spark):
    out = embedding_near_duplicates(_empty(spark))
    assert out.collect() == []
    assert set(out.columns) == {"id_a", "id_b", "cosine"}
