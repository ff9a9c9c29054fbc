"""Unit tests for the IVF ANN operator and the stateful streaming gap
detector (state must survive micro-batch boundaries)."""

from __future__ import annotations

import datetime as dt
import math
import time

import pytest
from pyspark.sql import functions as F

from etdtransform_spark.operators.similarity import cosine_topk, ivf_topk


def _vectors(spark, n=40, dim=8):
    import random

    rng = random.Random(7)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(dim)]) for i in range(n)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_ivf_topk_subset_of_probed_lists(spark):
    emb = _vectors(spark)
    queries = emb.filter(F.col("vec_id") < 3)
    exact = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in cosine_topk(queries, emb, k=3).collect()
    }
    approx = ivf_topk(queries, emb, k=3, nlist=4, nprobe=4).collect()
    # with nprobe == nlist every list is probed -> results equal brute force
    got = {(r["query_id"], r["rank"]): r["neighbor_id"] for r in approx}
    assert got == exact


def test_ivf_topk_fewer_probes_is_subset(spark):
    emb = _vectors(spark)
    queries = emb.filter(F.col("vec_id") < 3)
    full = ivf_topk(queries, emb, k=40, nlist=4, nprobe=4)
    part = ivf_topk(queries, emb, k=40, nlist=4, nprobe=1)
    full_pairs = {(r["query_id"], r["neighbor_id"]) for r in full.collect()}
    part_pairs = {(r["query_id"], r["neighbor_id"]) for r in part.collect()}
    assert part_pairs < full_pairs  # strictly fewer candidates scored


def test_streaming_gap_state_across_batches(spark, tmp_path):
    """A gap that spans two micro-batches is only detectable through state:
    batch 1 ends at 01:00, batch 2 begins at 13:00 the same day."""
    from etdtransform_spark.streaming.gap_detect import streaming_gap_detect

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    schema = "event_id long, user_id long, ts timestamp"
    batch1 = [(1, 1, t0), (2, 1, t0 + dt.timedelta(hours=1))]
    batch2 = [
        (3, 1, t0 + dt.timedelta(hours=13)),  # 12h gap vs batch1's last row
        (4, 1, t0 + dt.timedelta(hours=14)),
    ]
    import os

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = tmp_path / "src"
    src.mkdir()
    cols = ["event_id", "user_id", "ts"]
    for i, batch in enumerate([batch1, batch2]):
        pdf = pd.DataFrame(batch, columns=cols)
        pq.write_table(
            pa.Table.from_pandas(pdf, preserve_index=False),
            str(src / f"b{i}.parquet"),
            # µs timestamps: ns would be read as long under the session's
            # nanosAsLong shim
            coerce_timestamps="us",
            allow_truncated_timestamps=True,
        )
        # file source processes files in modification-time order
        os.utime(str(src / f"b{i}.parquet"), (1700000000 + i, 1700000000 + i))
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    gaps = streaming_gap_detect(stream, gap_seconds=6 * 3600.0)
    name = f"gaps_{int(time.time() * 1000)}"
    q = (
        gaps.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.table(name).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["user_id"] == 1
    assert r["gap_start"] == t0 + dt.timedelta(hours=1)
    assert r["gap_end"] == t0 + dt.timedelta(hours=13)
    assert math.isclose(r["gap_seconds"], 12 * 3600.0)


def test_quantize_adc_recall(spark):
    """ADC over the quantized corpus must agree with exact cosine top-1 for
    nearly all queries (256 levels on 64 dims is a fine grid), and the
    reconstruction must be within one quantization step per dimension."""
    from pyspark.sql import functions as F

    from etdtransform_spark.operators.similarity import (
        adc_topk,
        cosine_topk,
        quantize_embeddings,
    )
    from etdtransform_spark.sources.parquet import read_table

    emb = read_table(spark, "/root/testdata/sf0.001/embeddings.parquet")
    n_dims = 64
    codes = quantize_embeddings(emb, n_dims=n_dims)
    v = F.col("embedding")
    stats = emb.agg(
        *[F.min(v[i].cast("double")).alias(f"mn{i}") for i in range(n_dims)],
        *[F.max(v[i].cast("double")).alias(f"mx{i}") for i in range(n_dims)],
    )
    queries = emb.filter(F.col("vec_id") < 20)
    exact = {
        r.query_id: r.neighbor_id
        for r in cosine_topk(queries, emb, k=1).collect()
    }
    approx = {
        r.query_id: r.corpus_id
        for r in adc_topk(queries, codes, stats, k=1, n_dims=n_dims).collect()
    }
    hits = sum(1 for q in exact if approx.get(q) == exact[q])
    assert hits >= int(0.9 * len(exact)), (hits, len(exact))

    # reconstruction bound: |x - xhat| <= step/2 + eps per dimension
    srow = stats.collect()[0]
    crow = {r.vec_id: r.codes for r in codes.limit(50).collect()}
    for r in emb.filter(F.col("vec_id").isin(list(crow))).collect():
        for i, x in enumerate(r.embedding):
            mn, mx = srow[f"mn{i}"], srow[f"mx{i}"]
            step = (mx - mn) / 255.0 if mx > mn else 0.0
            xhat = mn + crow[r.vec_id][i] * step
            assert abs(float(x) - xhat) <= step / 2 + 1e-9


def test_streaming_hll_distinct_merges_across_batches(spark, tmp_path):
    """HLL sketch state must union across micro-batches: the same user in
    both batches counts once; overlapping user sets merge exactly (sparse
    mode)."""
    import os

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from etdtransform_spark.streaming.cardinality_stream import (
        streaming_distinct_count,
    )

    t0 = dt.datetime(2024, 1, 1, 6, 0, 0)
    # batch 1: users 0..49; batch 2: users 25..74 -> 75 distinct
    batch1 = [(i, i, t0, "click") for i in range(50)]
    batch2 = [(100 + i, 25 + i, t0 + dt.timedelta(minutes=5), "click")
              for i in range(50)]
    src = tmp_path / "src"
    src.mkdir()
    cols = ["event_id", "user_id", "ts", "event_type"]
    for i, batch in enumerate([batch1, batch2]):
        pdf = pd.DataFrame(batch, columns=cols)
        pq.write_table(
            pa.Table.from_pandas(pdf, preserve_index=False),
            str(src / f"b{i}.parquet"),
            coerce_timestamps="us",
            allow_truncated_timestamps=True,
        )
        os.utime(str(src / f"b{i}.parquet"), (1700000000 + i, 1700000000 + i))
    stream = (
        spark.readStream.schema(
            "event_id long, user_id long, ts timestamp, event_type string"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    agg = streaming_distinct_count(stream, ["event_type"], "user_id", "1 day")
    name = f"hll_{int(time.time() * 1000)}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.table(name).collect()
    assert len(rows) == 1
    assert rows[0]["n_distinct"] == 75


def test_pq_train_encode_adc_recall(spark):
    """Product quantization end-to-end: codebook trained per subspace,
    codes are nearest-centroid, and ADC top-1 over the compressed corpus
    agrees with exact cosine top-1 for nearly all queries on clustered,
    normalized data."""
    import random as _random

    from pyspark.sql import functions as F

    from etdtransform_spark.operators.similarity import (
        cosine_topk,
        pq_adc_topk,
        pq_encode,
        pq_train,
    )

    rng = _random.Random(11)
    d, n_clusters = 16, 6
    centers = [
        [rng.gauss(0, 1) for _ in range(d)] for _ in range(n_clusters)
    ]

    def normed(v):
        s = sum(x * x for x in v) ** 0.5
        return [x / s for x in v]

    rows = []
    for i in range(240):
        c = centers[i % n_clusters]
        rows.append((i, normed([x + rng.gauss(0, 0.05) for x in c])))
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])

    cb = pq_train(df, m=4, k=8, iters=4)
    assert cb.count() == 4 * 8
    codes = pq_encode(df, cb)
    first = codes.first()
    assert len(first.codes) == 4 and all(0 <= c < 8 for c in first.codes)

    queries = df.limit(20)
    approx = {
        r.vec_id: r.neighbor_id
        for r in pq_adc_topk(queries, codes, cb, k=1).collect()
    }
    exact = {
        r.query_id: r.neighbor_id
        for r in cosine_topk(queries, df, k=1).collect()
    }
    # same-cluster agreement: the approx neighbor must share the exact
    # neighbor's cluster (ids mod n_clusters encode the cluster)
    agree = sum(
        1 for q in exact
        if approx[q] % n_clusters == exact[q] % n_clusters
    )
    assert agree >= int(0.9 * len(exact)), (agree, len(exact))


def test_ivfpq_candidates_subset_and_recall(spark):
    """IVF-PQ results must come only from probed lists (a candidate-subset
    property), and at nprobe=nlist with a trained codebook the top-1 should
    match the exact neighbor's cluster on separable data."""
    import random as _random

    from etdtransform_spark.operators.similarity import (
        cosine_topk,
        ivfpq_topk,
        pq_train,
    )

    rng = _random.Random(13)
    d, ncl = 16, 4
    centers = [[rng.gauss(0, 1) for _ in range(d)] for _ in range(ncl)]

    def normed(v):
        s = sum(x * x for x in v) ** 0.5
        return [x / s for x in v]

    rows = [
        (i, normed([x + rng.gauss(0, 0.04) for x in centers[i % ncl]]))
        for i in range(160)
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    cb = pq_train(df, m=4, k=8, iters=4)
    queries = df.limit(12)
    approx = {
        r.query_id: r.neighbor_id
        for r in ivfpq_topk(queries, df, cb, k=1, nlist=8, nprobe=8).collect()
    }
    exact = {
        r.query_id: r.neighbor_id
        for r in cosine_topk(queries, df, k=1).collect()
    }
    agree = sum(
        1 for qid in exact if approx[qid] % ncl == exact[qid] % ncl
    )
    assert agree >= int(0.9 * len(exact)), (agree, len(exact))


def test_streaming_leaderboard_snapshot(spark, tmp_path):
    """foreachBatch leaderboard: ranked snapshot on disk equals the batch
    top-N, ties broken by item name."""
    import os

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from etdtransform_spark.streaming.topn_stream import streaming_leaderboard

    t0 = dt.datetime(2024, 2, 1, 10, 0)
    rows = (
        [(i, 1, t0, "x") for i in range(5)]
        + [(10 + i, 1, t0, "y") for i in range(3)]
        + [(20 + i, 1, t0, "z") for i in range(3)]
        + [(30 + i, 1, t0, "w") for i in range(1)]
    )
    src = tmp_path / "src"
    src.mkdir()
    pdf = pd.DataFrame(rows, columns=["event_id", "user_id", "ts", "event_type"])
    pq.write_table(
        pa.Table.from_pandas(pdf, preserve_index=False),
        str(src / "b0.parquet"),
        coerce_timestamps="us",
        allow_truncated_timestamps=True,
    )
    stream = (
        spark.readStream.schema(
            "event_id long, user_id long, ts timestamp, event_type string"
        )
        .parquet(str(src))
    )
    out = str(tmp_path / "board")
    q = streaming_leaderboard(stream, "event_type", out, window="1 day", n=3)
    q.awaitTermination(120)
    board = {(r.item): (r.n_events, r.rank)
             for r in spark.read.parquet(out).collect()}
    # top-3: x(5), then y and z tied at 3 -> y before z; w excluded
    assert board == {"x": (5, 1), "y": (3, 2), "z": (3, 3)}


def test_semantic_dedup_keeps_lowest_id_per_chain(spark):
    """Planted near-dup group: vectors 1/2/3 nearly identical, 10/11
    nearly identical but very different direction, 20 unique. Lowest id
    of each chain survives; unique vectors always keep."""
    from etdtransform_spark.operators.similarity import semantic_dedup

    def vec(base, eps, dim=8):
        v = [0.0] * dim
        v[base] = 1.0
        v[(base + 1) % dim] = eps
        return v

    # ids chosen so the k=3 lowest-id init seeds span three DISTINCT
    # directions (seeding k centroids inside one near-dup chain would
    # split the chain across clusters — inherent SemDeDup recall loss)
    rows = [
        (1, vec(0, 0.00)), (5, vec(0, 0.01)), (6, vec(0, 0.02)),
        (2, vec(4, 0.00)), (7, vec(4, 0.01)),
        (3, vec(7, 0.0)),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r.vec_id: r for r in semantic_dedup(
        df, k=3, iters=3, threshold=0.95).collect()}
    assert {i for i, r in out.items() if r.keep} == {1, 2, 3}
    # near-dups landed in the same cluster as their survivor
    assert out[5].cluster_id == out[1].cluster_id
    assert out[6].cluster_id == out[1].cluster_id
    assert out[7].cluster_id == out[2].cluster_id


def test_embedding_decontaminate_flags_planted_leak(spark):
    """A train vector nearly parallel to an eval vector must flag; an
    orthogonal one must not; zero-norm / NULL-vector train rows survive
    with contaminated=false and NULL match columns (no ANSI divide)."""
    from etdtransform_spark.operators.similarity import embedding_decontaminate

    ev = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    tr = spark.createDataFrame(
        [
            (10, [0.99, 0.1, 0.0, 0.0]),   # ~eval 0 -> contaminated
            (11, [0.0, 0.0, 1.0, 0.0]),    # orthogonal -> clean
            (12, [0.0, 0.0, 0.0, 0.0]),    # zero norm -> clean, NULL match
            (13, None),                    # NULL vector -> clean, NULL match
        ],
        "vec_id long, embedding array<double>",
    )
    out = {r.id: r for r in embedding_decontaminate(tr, ev, 0.9).collect()}
    assert set(out) == {10, 11, 12, 13}
    assert out[10].contaminated and out[10].top_eval_id == 0
    assert not out[11].contaminated and out[11].top_cosine is not None
    for i in (12, 13):
        assert not out[i].contaminated
        assert out[i].top_eval_id is None and out[i].top_cosine is None


def test_embedding_decontaminate_lsh_strategy(spark):
    """The LSH path must score only within sign-prefix buckets (equijoin,
    no cartesian over the scored side) and still find a same-bucket
    planted leak."""
    from etdtransform_spark.operators.similarity import embedding_decontaminate

    ev = spark.createDataFrame(
        [(0, [1.0, 1.0, 1.0, 1.0])], "vec_id long, embedding array<double>"
    )
    tr = spark.createDataFrame(
        [
            (10, [0.9, 1.1, 1.0, 1.0]),     # same orthant -> found
            (11, [-1.0, -1.0, -1.0, -1.0]), # opposite orthant -> unscored
        ],
        "vec_id long, embedding array<double>",
    )
    out = {
        r.id: r
        for r in embedding_decontaminate(
            tr, ev, 0.9, strategy="lsh", bucket_dims=4
        ).collect()
    }
    assert out[10].contaminated
    # cosine(11, ev0) = -1: a bucketed join never even scores it
    assert out[11].top_cosine is None and not out[11].contaminated


def test_kmeans_assign_broadcast_model_parity(spark):
    """The broadcast-1-row-frame model path (k*d > 2048 dispatch) must be
    bit-identical to the literal path — same zip_with fold, same argmin
    tie-break."""
    from etdtransform_spark.operators.similarity import (
        _kmeans_assign,
        _kmeans_base,
    )

    rows = [
        (i, [float((i * 7 + j * 3) % 11) / 11 for j in range(16)])
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    base = _kmeans_base(df, "vec_id", "embedding")
    cent = [(c, [float((c + j) % 5) for j in range(16)]) for c in range(6)]
    lit = {
        r._vid: (r.cluster_id, r.d2)
        for r in _kmeans_assign(base, cent, model_via="literal").collect()
    }
    bc = {
        r._vid: (r.cluster_id, r.d2)
        for r in _kmeans_assign(base, cent, model_via="broadcast").collect()
    }
    assert lit == bc  # bit-identical incl. float d2


def test_kmeans_fit_sync_fused_parity(spark):
    """The per-round-sync and fused-single-plan Lloyd deliveries must fit
    BIT-IDENTICAL models (same d2 fold, argmin tie-break, avg-per-dim
    aggregation, empty-cluster carryover) — r14 scopes the delivery per
    call site, so divergence would silently fork the family's results."""
    from etdtransform_spark.operators.similarity import (
        _kmeans_base,
        _kmeans_fit,
    )

    rows = [
        (i, [float((i * 7 + j * 3) % 11) / 11 for j in range(8)])
        for i in range(40)
    ]
    # id 999 forces an empty-cluster carryover: a far outlier seeds a
    # cluster that loses all members after round 1
    rows.append((999, [100.0] * 8))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    base = _kmeans_base(df, "vec_id", "embedding").persist()
    fused = _kmeans_fit(base, k=5, iters=3, via="fused")
    sync = _kmeans_fit(base, k=5, iters=3, via="sync")
    base.unpersist()
    assert fused == sync  # exact float equality, not approx


def test_dot_expr_fixed_parity(spark):
    """dot_expr_fixed must reproduce dot_expr's doubles exactly (same
    left-assoc fold from a 0.0 seed) and fall back per-row on arrays of a
    different length."""
    from etdtransform_spark.operators.similarity import (
        dot_expr,
        dot_expr_fixed,
    )

    rows = [
        (i, [float((i * 3 + j) % 7) / 7 for j in range(8)],
         [float((i + j * 5) % 9) / 9 for j in range(8)])
        for i in range(20)
    ]
    rows.append((99, [1.0, 2.0], [3.0, 4.0]))  # short arrays: guard falls back
    df = spark.createDataFrame(rows, "id long, a array<double>, b array<double>")
    out = df.select(
        "id",
        dot_expr(F.col("a"), F.col("b")).alias("generic"),
        dot_expr_fixed(F.col("a"), F.col("b"), 8).alias("fixed"),
    ).collect()
    for r in out:
        assert r.generic == r.fixed  # bit-identical


def test_semantic_dedup_sampled_fit_exact_dup_invariant(spark):
    """Exact duplicates share a cluster under ANY centroid model, so the
    sampled-fit path must flag them identically to the full fit; the
    sampled keep-set stays deterministic across reruns."""
    from etdtransform_spark.operators.similarity import semantic_dedup

    # one period of the pattern grid: the 17 head vectors are pairwise
    # below cosine 0.9990 (max cross cosine 0.99896), so at threshold
    # 0.9995 the ONLY near-dups are the planted exact copies
    rows = []
    for i in range(17):
        v = [float((i * 13 + j * 5) % 17) / 17 for j in range(8)]
        rows.append((i, v))
        rows.append((i + 100, v))  # exact duplicate, higher id
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    full = {r.vec_id: r.keep for r in semantic_dedup(
        df, k=4, iters=3, threshold=0.9995).collect()}
    samp = {r.vec_id: r.keep for r in semantic_dedup(
        df, k=4, iters=3, threshold=0.9995, fit_sample_mod=7).collect()}
    samp2 = {r.vec_id: r.keep for r in semantic_dedup(
        df, k=4, iters=3, threshold=0.9995, fit_sample_mod=7).collect()}
    assert samp == samp2  # deterministic
    for i in range(17):
        # the exact duplicate (higher id) is dropped under BOTH fits
        assert full[i + 100] is False and samp[i + 100] is False
        assert full[i] is True and samp[i] is True


def test_kmeans_assign_ivf_pruned_parity_and_guarantees(spark):
    """IVF-pruned assignment (nprobe): probing EVERY coarse cell must be
    bit-identical to the exhaustive scan (same fold, same lowest-position
    tie-break), on both model-delivery paths; small nprobe stays a pure
    deterministic function of the vector (exact duplicates agree)."""
    from etdtransform_spark.operators.similarity import (
        _coarse_quantize_centroids,
        _kmeans_assign,
        _kmeans_base,
    )

    rows = [
        (i, [float((i * 7 + j * 3) % 11) / 11 for j in range(16)])
        for i in range(80)
    ] + [(1000 + i, [float((i * 7 + j * 3) % 11) / 11 for j in range(16)])
         for i in range(10)]  # exact duplicates of the first 10
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    base = _kmeans_base(df, "vec_id", "embedding")
    cent = [(c, [float((c * 3 + j) % 9) for j in range(16)]) for c in range(9)]

    full = {
        r._vid: (r.cluster_id, r.d2)
        for r in _kmeans_assign(base, cent).collect()
    }
    # nprobe = nlist: every cell probed -> exhaustive, bit-identical
    coarse, lists = _coarse_quantize_centroids(cent, 3)
    assert sorted(p for lst in lists for p in lst) == list(range(9))
    for via in ("literal", "broadcast"):
        pruned_all = {
            r._vid: (r.cluster_id, r.d2)
            for r in _kmeans_assign(
                base, cent, model_via=via, nprobe=len(coarse), nlist=3
            ).collect()
        }
        assert pruned_all == full
    # nprobe=1: approximate but deterministic; every assignment is a
    # member of the probed cell, and exact duplicates agree
    p1 = {
        r._vid: r.cluster_id
        for r in _kmeans_assign(base, cent, nprobe=1, nlist=3).collect()
    }
    p1_again = {
        r._vid: r.cluster_id
        for r in _kmeans_assign(base, cent, nprobe=1, nlist=3).collect()
    }
    assert p1 == p1_again
    for i in range(10):
        assert p1[i] == p1[1000 + i]
    valid = {p for lst in lists for p in lst}
    assert set(p1.values()) <= valid


def test_semantic_dedup_assign_nprobe_exact_dup_invariant(spark):
    """assign_nprobe keeps the SemDeDup guarantee: exact duplicates are
    flagged identically to the exhaustive assignment, and the pruned
    keep-set is deterministic across reruns."""
    from etdtransform_spark.operators.similarity import semantic_dedup

    rows = []
    for i in range(17):
        v = [float((i * 13 + j * 5) % 17) / 17 for j in range(8)]
        rows.append((i, v))
        rows.append((i + 100, v))  # exact duplicate, higher id
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    full = {r.vec_id: r.keep for r in semantic_dedup(
        df, k=4, iters=3, threshold=0.9995).collect()}
    pr = {r.vec_id: r.keep for r in semantic_dedup(
        df, k=4, iters=3, threshold=0.9995, assign_nprobe=1).collect()}
    pr2 = {r.vec_id: r.keep for r in semantic_dedup(
        df, k=4, iters=3, threshold=0.9995, assign_nprobe=1).collect()}
    assert pr == pr2  # deterministic
    for i in range(17):
        assert full[i + 100] is False and pr[i + 100] is False
        assert full[i] is True and pr[i] is True


def test_kmeans_assignment_recall_contract_operator(spark):
    """kmeans_assignment_recall: nprobe >= nlist probes every cell so
    agreement is exactly 1.0; nprobe=1 reports a genuine in-[0,1]
    agreement with the floor verdict; empty corpus is vacuous-true."""
    from etdtransform_spark.operators.similarity import (
        kmeans_assignment_recall,
    )

    rows = [
        (i, [float((i * 7 + j * 3) % 11) / 11 for j in range(16)])
        for i in range(120)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    exact = kmeans_assignment_recall(
        df, k=9, nprobe=9, nlist=3, floor=0.99
    ).collect()[0]
    assert exact.n == 120 and exact.n_agree == 120
    assert exact.agreement == 1.0 and exact.floor_ok is True

    pruned = kmeans_assignment_recall(
        df, k=9, nprobe=1, nlist=3, floor=0.0
    ).collect()[0]
    assert pruned.n == 120 and 0 <= pruned.n_agree <= 120
    assert 0.0 <= pruned.agreement <= 1.0 and pruned.floor_ok is True
    # rerun-stable (pure function of the vectors)
    again = kmeans_assignment_recall(
        df, k=9, nprobe=1, nlist=3, floor=0.0
    ).collect()[0]
    assert again.n_agree == pruned.n_agree

    # an unreachable floor flips the verdict, agreement unchanged
    strict = kmeans_assignment_recall(
        df, k=9, nprobe=1, nlist=3, floor=1.01
    ).collect()[0]
    assert strict.floor_ok is False and strict.n_agree == pruned.n_agree

    empty = spark.createDataFrame(
        [], "vec_id long, embedding array<double>"
    )
    r = kmeans_assignment_recall(empty, k=9, nprobe=1, nlist=3).collect()[0]
    assert r.n == 0 and r.n_agree == 0
    assert r.agreement is None and r.floor_ok is True
