"""Recall contract for the approximate ANN family.

The hash-checked contract queries pin lsh_cosine_topk / ivf_topk /
ivfpq_topk values on deterministic fixtures, but nothing there pins
their RECALL vs the exact baseline as data shifts. This suite plants a
clustered corpus (150 quadruplet cliques — each vector's exact top-3 IS
its 3 co-members, so recall@3 measures cluster-level resolution, the
property ANN is deployed for) and asserts floors at the contract's own
bucket/probe settings. Floors sit ~0.08 under the measured values
(lsh 0.93, ivf 1.0, ivfpq(m=4,k=8) 0.74, ivfpq(m=8,k=16) 1.0) so a
refactor that degrades candidate generation fails loudly while seed-
level jitter does not.

Corpus ids INTERLEAVE clusters (id = cluster + n_clusters*i): the
deterministic lowest-id IVF centroids then span distinct clusters. With
block ids (all of cluster 0 first) every centroid lands in one cluster
and IVF recall collapses to ~0.1 — worth knowing for any production use
of the deterministic-centroid trade; kmeans-trained centroids don't
have this sensitivity.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from etdtransform_spark.operators.similarity import (
    cosine_topk,
    ivf_topk,
    ivfpq_topk,
    lsh_cosine_topk,
    pq_deterministic_codebook,
)

K = 3
N_CLUSTERS, PER, DIM = 150, 4, 16


@pytest.fixture(scope="module")
def clustered(spark):
    rng = random.Random(42)
    rows = []
    for c in range(N_CLUSTERS):
        center = [rng.uniform(-1, 1) for _ in range(DIM)]
        for i in range(PER):
            rows.append(
                (
                    c + N_CLUSTERS * i,
                    [x + rng.uniform(-0.03, 0.03) for x in center],
                )
            )
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).repartition(8)
    queries = emb.filter(F.col("vec_id") < 30)
    truth: dict[int, set[int]] = {}
    for r in cosine_topk(queries, emb, k=K).collect():
        truth.setdefault(r.query_id, set()).add(r.neighbor_id)
    return emb, queries, truth


def _recall(df, truth):
    got: dict[int, set[int]] = {}
    for r in df.collect():
        got.setdefault(r.query_id, set()).add(r.neighbor_id)
    return sum(len(got.get(q, set()) & t) for q, t in truth.items()) / sum(
        len(t) for t in truth.values()
    )


def test_exact_truth_is_the_planted_cliques(clustered):
    _, _, truth = clustered
    for q, t in truth.items():
        assert t == {q + N_CLUSTERS * i for i in range(1, PER)}, (q, t)


def test_lsh_cosine_topk_recall_floor(clustered):
    emb, queries, truth = clustered
    r = _recall(lsh_cosine_topk(queries, emb, k=K, bucket_dims=4), truth)
    assert r >= 0.85, r


def test_ivf_flat_recall_floor(clustered):
    emb, queries, truth = clustered
    r = _recall(ivf_topk(queries, emb, k=K, nlist=8, nprobe=2), truth)
    assert r >= 0.95, r


def test_ivfpq_recall_floor_contract_settings(clustered):
    """m=4,k=8 — the contract query's codebook. PQ at 8 codes/subspace is
    coarse by design; candidate pruning must still put most co-members in
    the top-3."""
    emb, queries, truth = clustered
    cb = pq_deterministic_codebook(emb, m=4, k=8)
    r = _recall(
        ivfpq_topk(queries, emb, cb, k=K, nlist=8, nprobe=2), truth
    )
    assert r >= 0.6, r


def test_ivfpq_recall_recovers_with_finer_codebook(clustered):
    """The knob the 100 TB operator turns: a finer codebook (m=8,k=16)
    must lift recall to ~exact on this corpus."""
    emb, queries, truth = clustered
    cb = pq_deterministic_codebook(emb, m=8, k=16)
    r = _recall(
        ivfpq_topk(queries, emb, cb, k=K, nlist=8, nprobe=2), truth
    )
    assert r >= 0.9, r
