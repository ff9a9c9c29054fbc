"""Ranking-quality evaluation: graded NDCG, reciprocal rank,
precision/recall@k, and rank-biased overlap between two rankings.

The retrieval half of the evaluation family (operators/evaluation.py
covers classification/regression/calibration): a pipeline that ranks —
search results, RAG retrieval, ANN candidates, recommendation slates —
is judged by position-weighted relevance, not by AUC. RBO additionally
compares two RANKINGS against each other without any relevance labels,
which is exactly the question an ANN rollout asks ("how close is the
IVF ordering to brute force?") — finer-grained than set recall@k
because it weights agreement at the top.

Scale shapes: every metric is per-query windows over per-query result
lists (a few × k rows each) + one final aggregate — queries
parallelize embarrassingly; nothing here ever shuffles more than the
(query, item) result table that the upstream retriever already
produced.

No reference counterpart (the reference is an energy ETL); part of the
beyond-reference LLM-pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.scalars import qround


def ranking_metrics(
    df: DataFrame,
    query_col: str,
    item_col: str,
    score_col: str,
    rel_col: str,
    k: int = 10,
    digits: int = 6,
) -> DataFrame:
    """Per-query graded ranking metrics at cutoff ``k``: DCG@k / IDCG@k
    / NDCG@k (gain 2^rel − 1, log2 position discount — the standard
    graded formulation), reciprocal rank of the first relevant item,
    and precision/recall@k (an item is "relevant" when rel > 0).

    The ranking is score DESC with item-id ASC tie-break (deterministic
    cross-engine; NULL/NaN scores carry no ranking evidence and are
    excluded, as are NULL relevances). IDCG ranks the SAME items by
    relevance — a query whose results hold no relevant item has
    IDCG = 0 and NULL ndcg/rr/recall (undefined, not 0: the retriever
    cannot be graded against an empty ideal).

    Returns one row per query: (query, n_items, n_rel, dcg, idcg, ndcg,
    rr, precision_at_k, recall_at_k). Two per-query windows + one
    aggregate; per-query lists are retriever-output-sized (≈ k), so
    partitions stay small no matter the query count.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    s = F.col(score_col).cast("double")
    rel = F.col(rel_col).cast("double")
    base = df.filter(
        s.isNotNull() & ~F.isnan(s)
        & rel.isNotNull() & ~F.isnan(rel)
        & F.col(query_col).isNotNull()
    ).select(
        F.col(query_col).alias("query"),
        F.col(item_col).alias("_item"),
        s.alias("_s"),
        rel.alias("_rel"),
    )
    w_rank = Window.partitionBy("query").orderBy(
        F.col("_s").desc(), F.col("_item").asc()
    )
    w_ideal = Window.partitionBy("query").orderBy(
        F.col("_rel").desc(), F.col("_item").asc()
    )
    pos = F.row_number().over(w_rank)
    ipos = F.row_number().over(w_ideal)
    gain = F.pow(F.lit(2.0), F.col("_rel")) - 1.0
    ranked = base.select(
        "query",
        "_rel",
        pos.alias("_pos"),
        ipos.alias("_ipos"),
        gain.alias("_gain"),
    )
    disc = lambda p: F.log2(p.cast("double") + 1.0)  # noqa: E731
    agg = ranked.groupBy("query").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum((F.col("_rel") > 0).cast("bigint")).alias("n_rel"),
        F.sum(
            F.when(F.col("_pos") <= k, F.col("_gain") / disc(F.col("_pos")))
        ).alias("_dcg"),
        F.sum(
            F.when(F.col("_ipos") <= k, F.col("_gain") / disc(F.col("_ipos")))
        ).alias("_idcg"),
        F.min(F.when(F.col("_rel") > 0, F.col("_pos"))).alias("_first_rel"),
        F.sum(
            ((F.col("_pos") <= k) & (F.col("_rel") > 0)).cast("bigint")
        ).alias("_rel_at_k"),
    )
    dcg = F.coalesce(F.col("_dcg"), F.lit(0.0))
    idcg = F.coalesce(F.col("_idcg"), F.lit(0.0))
    return agg.select(
        "query",
        "n_items",
        "n_rel",
        qround(dcg, digits).alias("dcg"),
        qround(idcg, digits).alias("idcg"),
        qround(F.when(idcg > 0, dcg / idcg), digits).alias("ndcg"),
        qround(
            F.when(
                F.col("_first_rel").isNotNull(),
                1.0 / F.col("_first_rel").cast("double"),
            ),
            digits,
        ).alias("rr"),
        qround(
            F.col("_rel_at_k").cast("double") / F.lit(float(k)), digits
        ).alias("precision_at_k"),
        qround(
            F.when(
                F.col("n_rel") > 0,
                F.col("_rel_at_k").cast("double")
                / F.col("n_rel").cast("double"),
            ),
            digits,
        ).alias("recall_at_k"),
    )


def ranking_summary(
    df: DataFrame,
    query_col: str,
    item_col: str,
    score_col: str,
    rel_col: str,
    k: int = 10,
    digits: int = 6,
) -> DataFrame:
    """Corpus-level rollup of :func:`ranking_metrics`: ONE row with
    query count and mean NDCG@k / MRR / precision@k / recall@k (means
    skip queries where the metric is undefined — the per-query NULL
    convention propagates instead of polluting the average with 0s)."""
    per_q = ranking_metrics(
        df, query_col, item_col, score_col, rel_col, k=k, digits=None
    )
    return per_q.agg(
        F.count(F.lit(1)).alias("n_queries"),
        qround(F.avg("ndcg"), digits).alias("mean_ndcg"),
        qround(F.avg("rr"), digits).alias("mrr"),
        qround(F.avg("precision_at_k"), digits).alias("mean_precision_at_k"),
        qround(F.avg("recall_at_k"), digits).alias("mean_recall_at_k"),
    )


def rbo_overlap(
    ranking_a: DataFrame,
    ranking_b: DataFrame,
    query_col: str = "query_id",
    item_col: str = "neighbor_id",
    rank_col: str = "rank",
    p: float = 0.9,
    k: int = 10,
    digits: int = 6,
) -> DataFrame:
    """Rank-biased overlap (Webber, Moffat & Zobel 2010) between two
    rankings of the same queries, truncated at depth ``k``:
    RBO@k = (1−p) Σ_{d=1..k} p^{d−1} · |A_:d ∩ B_:d| / d — top-weighted
    ranking agreement WITHOUT relevance labels. The question an ANN /
    index rollout actually asks: how close is the candidate ordering to
    the exact one, counting the top more than the tail. The truncated
    sum is reported as-is (no extrapolation residual): it is a lower
    bound on full RBO, the conservative side for a rollout gate, and
    the p^k residual mass is reported alongside so callers see the
    truncation.

    Inputs are (query, item, rank) tables with ranks 1..k (extra depth
    is ignored). An item's ENTRY DEPTH into the overlap is
    max(rank_a, rank_b); per query the overlap curve X_d is the
    cumulative count of entries ≤ d, evaluated on a per-query depth
    spine of k rows. Everything is per-query dictionary-sized: matched
    items ≤ k, spine = k.

    Queries present in only ONE ranking get RBO against the empty list
    — overlap 0 at every depth, rbo = 0 (a retriever that returns
    nothing for a query the other side answers IS disagreement).

    Returns one row per query: (query, n_matched, rbo) plus constant
    (p_residual) — and callers average rbo for the corpus number.
    """
    if not 0.0 < p < 1.0:
        raise ValueError(f"p must be in (0, 1), got {p}")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")

    def side(r: DataFrame, out: str) -> DataFrame:
        # Collapse to ONE row per (query, item) — a malformed input that
        # lists the same item at two ranks would otherwise multiply the
        # equijoin matches and silently inflate X_d (ADVICE r10 #2). An
        # item's effective rank is its best (minimum) one; on well-formed
        # rankings this aggregate is the identity.
        return (
            r.filter(F.col(rank_col) <= k)
            .groupBy(
                F.col(query_col).alias("query"),
                F.col(item_col).alias("_item"),
            )
            .agg(F.min(F.col(rank_col).cast("bigint")).alias(out))
        )

    a = side(ranking_a, "_ra")
    b = side(ranking_b, "_rb")
    matched = a.join(b, ["query", "_item"]).select(
        "query", F.greatest("_ra", "_rb").alias("_entry")
    )
    queries = (
        a.select("query").union(b.select("query")).distinct()
    )
    # per-query depth spine d = 1..k; X_d = #entries <= d
    spine = queries.select(
        "query",
        F.explode(F.sequence(F.lit(1), F.lit(k))).alias("_d"),
    )
    per_depth = spine.join(
        matched, ["query"], "left"
    ).groupBy("query", "_d").agg(
        F.sum(
            F.when(F.col("_entry") <= F.col("_d"), 1).otherwise(0)
        ).alias("_xd"),
    )
    term = (
        F.lit(1.0 - p)
        * F.pow(F.lit(p), F.col("_d").cast("double") - 1.0)
        * F.col("_xd").cast("double")
        / F.col("_d").cast("double")
    )
    # entry depth <= k always (both sides filtered), so X_k = |A∩B|
    out = per_depth.groupBy("query").agg(
        F.max("_xd").alias("_nm"),
        qround(F.sum(term), digits).alias("rbo"),
    )
    return out.select(
        "query",
        F.col("_nm").cast("bigint").alias("n_matched"),
        "rbo",
        qround(F.lit(float(p ** k)), digits).alias("p_residual"),
    )


def reciprocal_rank_fusion(
    ranking_a: DataFrame,
    ranking_b: DataFrame,
    query_col: str = "query_id",
    item_col: str = "neighbor_id",
    rank_col: str = "rank",
    k_const: int = 60,
    topk: int = 10,
    digits: int = 6,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Buettcher 2009) of two
    rankings of the same queries — THE standard hybrid-retrieval merge
    (BM25 list ⊕ embedding list): per (query, item),

        rrf = Σ_lists 1 / (k_const + rank)

    summed over the lists that contain the item, then top-``topk`` per
    query by (rrf desc, item asc — deterministic). No score calibration
    needed — only ranks, which is why it is the default fusion for
    heterogeneous retrievers.

    Each side is collapsed to min(rank) per (query, item) first (the
    same malformed-input guard as :func:`rbo_overlap`); the outer merge
    and the per-query window run on ≤ 2·listlen rows per query —
    dictionary-sized work after the retrievers' own top-k.

    Returns (query, item, in_a, in_b, rrf, fused_rank), fused_rank ≤
    ``topk``. ``in_a``/``in_b`` are 0/1 INTs (nullable BOOLEAN stays
    out of contract outputs).
    """
    if k_const < 1:
        raise ValueError(f"k_const must be >= 1, got {k_const}")

    def side(r: DataFrame, out: str) -> DataFrame:
        return (
            r.groupBy(
                F.col(query_col).alias("query"),
                F.col(item_col).alias("item"),
            )
            .agg(F.min(F.col(rank_col).cast("bigint")).alias(out))
        )

    a = side(ranking_a, "_ra")
    b = side(ranking_b, "_rb")
    merged = a.join(b, ["query", "item"], "full")
    contrib = (
        F.when(
            F.col("_ra").isNotNull(),
            1.0 / (F.lit(float(k_const)) + F.col("_ra").cast("double")),
        ).otherwise(0.0)
        + F.when(
            F.col("_rb").isNotNull(),
            1.0 / (F.lit(float(k_const)) + F.col("_rb").cast("double")),
        ).otherwise(0.0)
    )
    scored = merged.select(
        "query",
        "item",
        F.col("_ra").isNotNull().cast("int").alias("in_a"),
        F.col("_rb").isNotNull().cast("int").alias("in_b"),
        qround(contrib, digits).alias("rrf"),
    )
    w = Window.partitionBy("query").orderBy(
        F.col("rrf").desc(), F.col("item")
    )
    return (
        scored.withColumn("fused_rank", F.row_number().over(w))
        .filter(F.col("fused_rank") <= topk)
        .withColumn("fused_rank", F.col("fused_rank").cast("bigint"))
    )


def mmr_rerank(
    candidates: DataFrame,
    vectors: DataFrame,
    k: int = 3,
    lambda_: float = 0.7,
    rel_col: str = "cosine",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    digits: int = 6,
) -> DataFrame:
    """Maximal-marginal-relevance re-ranking (Carbonell & Goldstein 1998)
    of a per-query candidate pool — the diversity pass between retrieval
    and prompt assembly: greedily pick k items maximizing
    λ·relevance − (1−λ)·max-cosine-to-already-selected, so near-duplicate
    passages don't crowd a RAG context.

    ``candidates`` is a (query_id, neighbor_id, ``rel_col``) pool (e.g.
    cosine_topk output — pool-sized per query, NOT corpus-sized);
    ``vectors`` supplies the candidate embeddings for the pairwise
    diversity term. Selection runs as k unrolled rounds over the pool:
    round 1 sees an empty selected set (max-sim 0, so it picks pure
    relevance), each later round anti-joins the selected set, takes the
    max similarity to it, and picks the arg-max of the ROUNDED MMR score
    (round-before-rank, id tiebreak — the cross-engine determinism rule
    every ranked operator here follows). Queries whose pool is exhausted
    before k simply stop producing rows.

    Scale shape: the pairwise sim table is pool²-per-query (bounded by
    the retriever's k, never data-sized) and is localCheckpointed once
    for its k−1 consumers; each round is a pool-sized anti-join + one
    aggregate. Same executor-loss caveat as funnel_steps. Returns
    (query_id, neighbor_id, mmr_rank, relevance, mmr_score).
    """
    from .similarity import dot_expr, norm_expr

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if not 0.0 <= lambda_ <= 1.0:
        raise ValueError(f"lambda_ must be in [0, 1], got {lambda_}")
    lam = float(lambda_)
    om = 1.0 - lam
    pool = candidates.select(
        "query_id",
        "neighbor_id",
        F.col(rel_col).cast("double").alias("_rel"),
    ).localCheckpoint(eager=False)
    v = vectors.select(
        F.col(id_col).alias("_vid"),
        F.col(vec_col).alias("_v"),
        norm_expr(F.col(vec_col)).alias("_n"),
    )
    pv = pool.join(
        v, pool["neighbor_id"] == v["_vid"]
    ).select("query_id", "neighbor_id", "_v", "_n")
    a = pv.select(
        "query_id",
        F.col("neighbor_id").alias("_ca"),
        F.col("_v").alias("_va"),
        F.col("_n").alias("_na"),
    )
    b = pv.select(
        "query_id",
        F.col("neighbor_id").alias("_cb"),
        F.col("_v").alias("_vb"),
        F.col("_n").alias("_nb"),
    )
    sim = (
        a.join(b, "query_id")
        .filter(F.col("_ca") != F.col("_cb"))
        .select(
            "query_id",
            "_ca",
            "_cb",
            qround(
                dot_expr(F.col("_va"), F.col("_vb"))
                / (F.col("_na") * F.col("_nb")),
                digits,
            ).alias("_s"),
        )
        .localCheckpoint(eager=False)
    )
    selected: DataFrame | None = None
    for r in range(1, k + 1):
        if selected is None:
            scored = pool.withColumn("_ms", F.lit(0.0))
        else:
            rem = pool.join(
                selected.select("query_id", "neighbor_id"),
                ["query_id", "neighbor_id"],
                "left_anti",
            )
            sel_b = selected.select(
                "query_id", F.col("neighbor_id").alias("_cb")
            )
            ms_tbl = (
                sim.join(sel_b, ["query_id", "_cb"])
                .groupBy("query_id", "_ca")
                .agg(F.max("_s").alias("_ms"))
                .select(
                    "query_id",
                    F.col("_ca").alias("neighbor_id"),
                    "_ms",
                )
            )
            scored = rem.join(
                ms_tbl, ["query_id", "neighbor_id"], "left"
            ).withColumn("_ms", F.coalesce(F.col("_ms"), F.lit(0.0)))
        scored = scored.withColumn(
            "_mmr",
            qround(
                F.lit(lam) * F.col("_rel") - F.lit(om) * F.col("_ms"),
                digits,
            ),
        )
        w = Window.partitionBy("query_id").orderBy(
            F.col("_mmr").desc(), F.col("neighbor_id")
        )
        pick = (
            scored.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select(
                "query_id",
                "neighbor_id",
                F.lit(r).cast("bigint").alias("mmr_rank"),
                "_rel",
                "_mmr",
            )
        )
        selected = pick if selected is None else selected.union(pick)
        selected = selected.localCheckpoint(eager=False)
    return selected.select(
        "query_id",
        "neighbor_id",
        "mmr_rank",
        qround(F.col("_rel"), digits).alias("relevance"),
        F.col("_mmr").alias("mmr_score"),
    )
