"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exact baseline; a sign-prefix (random
hyperplane style) bucketed variant as the scale path. Dot products are pure
``F.zip_with`` + ``F.aggregate`` Catalyst expressions — JVM-side, no Python.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from ..functions.scalars import qround


def dot_expr(a: Column, b: Column) -> Column:
    """Sequential-order dot product of two array<numeric> columns (matches
    DuckDB list_dot_product accumulation order for oracle parity)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm_expr(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )


def dot_expr_fixed(a: Column, b: Column, d: int) -> Column:
    """``dot_expr`` specialised to a known dimensionality ``d``, with a
    per-row fallback guard. The generic form is an interpreted
    higher-order-function fold (zip_with + aggregate — never
    whole-stage-codegen'd, ~10 µs/pair at d=64); the unrolled
    ``a[0]*b[0] + a[1]*b[1] + …`` is one codegen'd expression. The sum is
    built LEFT-ASSOCIATIVE from a 0.0 seed — ``(((0.0 + t0) + t1) + …)``
    — exactly the fold order of ``aggregate``'s accumulator, so the
    doubles are bit-identical; rows whose arrays are not d-long fall back
    to the generic fold per row. Only worth it where the consuming plan is
    small (the r13 unroll attempt lost on Catalyst planning time when the
    64-term tree was replicated across a composite's subtrees)."""
    terms: Column = F.lit(0.0)
    for i in range(d):
        terms = terms + a[i] * b[i]
    return F.when(
        (F.size(a) == d) & (F.size(b) == d), terms
    ).otherwise(dot_expr(a, b))


def cosine_expr(a: Column, b: Column) -> Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact brute-force cosine top-k: for each query vector, the k most
    similar corpus vectors (self-matches excluded).

    The query side is expected to be small (it is broadcast); the corpus side
    streams. Output: (query_id, neighbor_id, cosine, rank) — cosine rounded to
    6 decimals, ties broken by neighbor id, so results are deterministic and
    engine-portable.
    """
    # norms are computed ONCE per vector (not re-folded per pair: that
    # would triple the per-pair work); dot/(qn*cn) runs the identical op
    # sequence as cosine_expr, so oracle values are bit-equal
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("qv"),
            norm_expr(F.col(vec_col)).alias("_qn"),
        )
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        norm_expr(F.col(vec_col)).alias("_cn"),
    )
    pairs = q.crossJoin(c).filter(F.col("query_id") != F.col("neighbor_id"))
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        qround(
            dot_expr(F.col("qv"), F.col("cv")) / (F.col("_qn") * F.col("_cn")),
            6,
        ).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def embedding_decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    strategy: str = "broadcast",
    bucket_dims: int = 4,
) -> DataFrame:
    """Embedding-level train/eval decontamination: flag every training
    item whose embedding cosine against ANY eval-set item reaches
    ``threshold`` — the semantic complement of the n-gram contamination
    check (corpus.py:contamination_check), catching paraphrased eval
    leakage that exact n-grams miss (the eval-hygiene step behind e.g.
    GPT-3/Llama decontamination reports).

    ``strategy='broadcast'`` (default, EXACT): the eval set — small by
    nature, it's a benchmark — broadcasts; each train row scores against
    it and keeps only its best match via one map-side-combinable
    max(struct) aggregate. No shuffle wider than the train key.
    ``strategy='lsh'``: both sides bucket by sign prefix
    (:func:`sign_prefix_bucket`) and score within buckets only — for the
    rare huge-eval case; recall < 1 by construction (documented trade,
    same as :func:`lsh_cosine_topk`).

    Zero-norm / NULL / empty embeddings cannot claim similarity: they are
    excluded from scoring on both sides (ANSI-safe — no 0/0) and such
    train rows come back contaminated=false with NULL match columns.
    Returns every train row as (id, top_eval_id, top_cosine,
    contaminated) — cosine rounded to 6 digits, ties to the lowest eval
    id, so the flag is deterministic and engine-portable."""
    ev = eval_df.select(
        F.col(id_col).alias("eid"),
        F.col(vec_col).alias("ev"),
        norm_expr(F.col(vec_col)).alias("_en"),
    ).filter(F.col("_en") > 0)
    tr = train.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("tv"),
        norm_expr(F.col(vec_col)).alias("_tn"),
    )
    scoreable = tr.filter(F.col("_tn") > 0)
    if strategy == "lsh":
        evb = ev.withColumn("_b", sign_prefix_bucket(F.col("ev"), bucket_dims))
        trb = scoreable.withColumn(
            "_b", sign_prefix_bucket(F.col("tv"), bucket_dims)
        )
        pairs = trb.join(F.broadcast(evb), "_b")
    else:
        pairs = scoreable.crossJoin(F.broadcast(ev))
    cos = qround(
        dot_expr(F.col("tv"), F.col("ev")) / (F.col("_tn") * F.col("_en")), 6
    )
    top = (
        pairs.select("id", F.col("eid"), cos.alias("_c"))
        .groupBy("id")
        .agg(F.max(F.struct(F.col("_c"), (-F.col("eid")).alias("_ne"))).alias("_m"))
        .select(
            "id",
            (-F.col("_m._ne")).alias("top_eval_id"),
            F.col("_m._c").alias("top_cosine"),
        )
    )
    return tr.select("id").join(top, "id", "left").select(
        "id",
        "top_eval_id",
        "top_cosine",
        F.coalesce(F.col("top_cosine") >= threshold, F.lit(False)).alias(
            "contaminated"
        ),
    )


def sign_prefix_bucket(vec: Column, n_dims: int) -> Column:
    """LSH bucket id from the signs of the first ``n_dims`` components —
    a deterministic stand-in for random-hyperplane LSH (hyperplanes = axis
    planes), portable to any engine."""
    bucket = F.lit(0).cast("bigint")
    for d in range(n_dims):
        bucket = bucket + F.when(vec[d] >= 0, F.lit(2 ** d).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
    return bucket


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    nlist: int = 8,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF (inverted-file) approximate cosine top-k — the classic
    coarse-quantizer ANN layout (Jégou et al., "Product Quantization for
    Nearest Neighbor Search", TPAMI 2011, §III-A; same partitioning FAISS's
    IndexIVFFlat uses).

    Index build: every corpus vector is assigned to its nearest of ``nlist``
    centroids (one shuffle-free broadcast scan — centroids are tiny). Search:
    each query probes its ``nprobe`` nearest centroids and scores only the
    vectors in those lists, an equijoin on list id instead of a full cross
    join — cost drops by ~nlist/nprobe with recall controlled by nprobe.

    Centroids here are taken deterministically (the ``nlist`` lowest-id
    corpus vectors) so every engine reproduces the identical index; a
    production build would instead sample + k-means, which changes only the
    centroid table, not the dataflow.

    At 100 TB: centroids stay broadcast; the corpus scan assigns + writes
    bucketed by list id once, and each query batch shuffles only (query x
    nprobe) rows to the co-located lists.
    """
    cent = F.broadcast(
        corpus.orderBy(id_col)
        .limit(nlist)
        .select(
            F.col(id_col).alias("centroid_id"),
            F.col(vec_col).alias("cvec"),
            norm_expr(F.col(vec_col)).alias("_ctn"),
        )
    )
    # index build: nearest centroid per corpus vector (rounded cosine +
    # centroid-id tiebreak => engine-portable determinism). max_by instead of
    # a row_number window: hash aggregation with map-side partials — no sort,
    # and at 100 TB the corpus never needs to be range-shuffled. Norms are
    # folded once per vector, never per pair (identical op sequence to
    # cosine_expr — oracle values bit-equal).
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        norm_expr(F.col(vec_col)).alias("_cn"),
    )
    acos = qround(
        dot_expr(F.col("cv"), F.col("cvec")) / (F.col("_cn") * F.col("_ctn")), 6
    )
    assign_order = F.struct(
        acos.alias("s"), (-F.col("centroid_id")).alias("tb")
    )
    lists = (
        c.crossJoin(cent)
        .groupBy("neighbor_id")
        .agg(
            F.max_by(F.col("centroid_id"), assign_order).alias("list_id"),
            F.first("cv").alias("cv"),
            F.first("_cn").alias("_cn"),
        )
        .select("neighbor_id", "cv", "_cn", "list_id")
    )
    # search: probe nprobe nearest centroids per query
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        norm_expr(F.col(vec_col)).alias("_qn"),
    )
    probe_w = Window.partitionBy("query_id").orderBy(
        F.col("pcos").desc(), F.col("centroid_id").asc()
    )
    probes = (
        q.crossJoin(cent)
        .select(
            "query_id",
            "qv",
            "_qn",
            "centroid_id",
            qround(
                dot_expr(F.col("qv"), F.col("cvec"))
                / (F.col("_qn") * F.col("_ctn")),
                6,
            ).alias("pcos"),
        )
        .withColumn("_rn", F.row_number().over(probe_w))
        .filter(F.col("_rn") <= nprobe)
        .select("query_id", "qv", "_qn", F.col("centroid_id").alias("list_id"))
    )
    scored = (
        probes.join(lists, "list_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            qround(
                dot_expr(F.col("qv"), F.col("cv"))
                / (F.col("_qn") * F.col("_cn")),
                6,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def lsh_cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_dims: int = 4,
) -> DataFrame:
    """Approximate cosine top-k: corpus is bucketed by sign prefix; each query
    only scores against its own bucket. Recall < 1 by construction; at scale
    this turns an O(Q x N) scan into O(Q x N / 2^bucket_dims) with a co-
    partitioned equijoin instead of a broadcast cross join."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        norm_expr(F.col(vec_col)).alias("_qn"),
        sign_prefix_bucket(F.col(vec_col), bucket_dims).alias("bucket"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        norm_expr(F.col(vec_col)).alias("_cn"),
        sign_prefix_bucket(F.col(vec_col), bucket_dims).alias("bucket"),
    )
    pairs = q.join(c, "bucket").filter(F.col("query_id") != F.col("neighbor_id"))
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        qround(
            dot_expr(F.col("qv"), F.col("cv")) / (F.col("_qn") * F.col("_cn")),
            6,
        ).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def embedding_dim_stats(
    df: DataFrame,
    vec_col: str = "embedding",
    n_dims: int = 64,
) -> DataFrame:
    """Per-dimension min/max of an embedding column as the 1-row wide
    frame (mn0..mn{d-1}, mx0..mx{d-1}) that :func:`quantize_embeddings`
    and :func:`adc_topk` consume.

    Computed via posexplode + ONE (dim) hash aggregate rather than 2*d
    side-by-side aggregates: identical result, but the wide form compiles
    a whole-stage-codegen method quadratic in d (measured 5x slower at
    d=64 from compile time alone) while this shape stays d-independent.
    The d-row result pivots to the wide row driver-side (d values — model
    metadata, not data)."""
    spark = df.sparkSession
    rows = (
        df.select(F.posexplode(F.col(vec_col)).alias("_dim", "_x"))
        .filter(F.col("_dim") < n_dims)
        .groupBy("_dim")
        .agg(
            F.min(F.col("_x").cast("double")).alias("mn"),
            F.max(F.col("_x").cast("double")).alias("mx"),
        )
        .collect()
    )
    by_dim = {r["_dim"]: (r["mn"], r["mx"]) for r in rows}
    return spark.createDataFrame(
        [tuple(v for i in range(n_dims) for v in by_dim.get(i, (None, None)))],
        ", ".join(f"mn{i} double, mx{i} double" for i in range(n_dims)),
    )


def groupwise_embedding_mean(
    df: DataFrame,
    keys: list[str],
    vec_col: str = "embedding",
    n_dims: int = 64,
    digits: int = 6,
) -> DataFrame:
    """Element-wise mean vector per group — class centroids / cluster
    profiles / per-source embedding signatures, the aggregation step every
    embedding-space analysis needs (and the re-estimation half of
    :func:`kmeans`, exposed standalone).

    Shape: posexplode to (key, dim, x) and ONE hash aggregate on
    (keys, dim) — map-side combined, so the shuffle carries |keys| x
    n_dims partial sums, never vectors; the centroid array is re-assembled
    with an order-safe sort over the collected (dim, mean) structs. Null
    vectors drop out; each dim averages over the vectors present.

    Returns (keys..., n_vectors, centroid array<double>).
    """
    exploded = df.filter(F.col(vec_col).isNotNull()).select(
        *keys, F.posexplode(F.col(vec_col)).alias("_dim", "_x")
    )
    per_dim = exploded.groupBy(*keys, "_dim").agg(
        qround(F.avg(F.col("_x").cast("double")), digits).alias("_m"),
        F.count(F.lit(1)).alias("_n"),
    )
    return per_dim.groupBy(*keys).agg(
        F.max("_n").alias("n_vectors"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("_dim", "_m"))),
            lambda s: s["_m"],
        ).alias("centroid"),
    )


def quantize_embeddings(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_dims: int = 64,
    levels: int = 256,
    stats_df: DataFrame | None = None,
) -> DataFrame:
    """Per-dimension scalar quantization to ``levels`` codes (int8-style):
    code_d = floor((x_d - min_d) / (max_d - min_d) * (levels-1) + 0.5),
    with global per-dimension min/max learned from the corpus itself.

    This is the memory side of large-scale ANN: 64 float32 dims (256 B)
    become 64 codes (64 B); at 10^10 vectors that is the difference between
    2.5 TB and 640 GB of resident index. The stats pass is
    :func:`embedding_dim_stats` (exploded per-dim aggregate — codegen
    stays d-independent); encoding is a narrow map with the 1-row stats
    broadcast — no shuffle of the corpus itself.

    Returns (id, codes array<bigint>). Dequantization for asymmetric
    distance: x̂_d = min_d + code_d * (max_d - min_d) / (levels-1)
    (see :func:`adc_topk`).
    """
    v = F.col(vec_col)
    # accept a precomputed stats frame so a caller that also needs the
    # stats (adc_topk's dequantize side) pays the corpus stats pass once
    srow = (
        stats_df if stats_df is not None else embedding_dim_stats(df, vec_col, n_dims)
    ).collect()[0]
    m = float(levels - 1)
    # Stats are model metadata (2*d doubles) — inline them as LITERAL
    # arrays and encode with one zip_with fold: constant-folded codegen,
    # no broadcast join, d-independent method size.
    mns = F.array(*[F.lit(srow[f"mn{i}"]).cast("double") for i in range(n_dims)])
    mxs = F.array(*[F.lit(srow[f"mx{i}"]).cast("double") for i in range(n_dims)])

    def encode(x, mn, mx):
        scaled = (x.cast("double") - mn) / (mx - mn) * F.lit(m) + F.lit(0.5)
        fl = scaled - (scaled % F.lit(1.0))  # exact double floor (x >= 0)
        return (
            # NULL elements stay NULL — least() skips NULLs, so without
            # the guard a NULL dimension would fabricate the top code
            F.when(x.isNull(), F.lit(None))
            .when(mx == mn, F.lit(0.0))
            .otherwise(F.least(F.lit(m), fl))
        ).cast("bigint")

    codes = F.zip_with(
        F.zip_with(F.slice(v, 1, n_dims), mns, lambda x, mn: F.struct(
            x.alias("x"), mn.alias("mn")
        )),
        mxs,
        lambda s, mx: encode(s["x"], s["mn"], mx),
    )
    return df.select(F.col(id_col), codes.alias("codes"))


def adc_topk(
    queries: DataFrame,
    codes: DataFrame,
    stats_df: DataFrame,
    k: int = 5,
    n_dims: int = 64,
    levels: int = 256,
    query_id: str = "vec_id",
    query_vec: str = "embedding",
    codes_id: str = "vec_id",
) -> DataFrame:
    """Asymmetric-distance top-k: float queries against the QUANTIZED corpus
    (codes dequantized on the fly against broadcast per-dim stats). The
    recall/memory trade of production ANN: the corpus never exists in float
    form at query time. Same join/window shape as cosine_topk.
    ``codes_id`` mirrors quantize_embeddings' ``id_col``.

    ``stats_df`` is the 1-row frame with mn{i}/mx{i} columns (reuse the agg
    from :func:`quantize_embeddings` to keep one stats pass for both)."""
    m = float(levels - 1)
    deq = F.transform(
        F.arrays_zip(
            F.col("codes"),
            F.array(*[F.col(f"mn{i}") for i in range(n_dims)]),
            F.array(*[F.col(f"mx{i}") for i in range(n_dims)]),
        ),
        lambda t: t["1"] + t["codes"] * (t["2"] - t["1"]) / F.lit(m),
    )
    corpus = codes.crossJoin(F.broadcast(stats_df)).select(
        F.col(codes_id).alias("corpus_id"),
        deq.alias("_vhat"),
    ).withColumn("_vn", norm_expr(F.col("_vhat")))
    q = queries.select(
        F.col(query_id).alias("query_id"),
        F.col(query_vec).alias("_q"),
        norm_expr(F.col(query_vec)).alias("_qn"),
    )
    pairs = q.crossJoin(corpus).filter(F.col("query_id") != F.col("corpus_id"))
    scored = pairs.select(
        "query_id",
        "corpus_id",
        (
            dot_expr(F.col("_q"), F.col("_vhat"))
            / (F.col("_qn") * F.col("_vn"))
        ).alias("cos_adc"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_adc").desc(), F.col("corpus_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "corpus_id", qround(F.col("cos_adc"), 6).alias("cos_adc"), "rank")
    )


def kmeans(
    corpus: DataFrame,
    k: int = 8,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    init: str = "lowest_ids",
) -> DataFrame:
    """Lloyd's k-means over an embedding column — the production training
    step for :func:`ivf_topk`'s coarse quantizer (which ships with
    deterministic lowest-id centroids for oracle parity; this replaces
    them with fitted ones).

    Distributed shape per iteration: centroids (k x d doubles — bounded by
    the model, not the data) broadcast to executors; every vector finds its
    nearest centroid via a broadcast nested-loop scan (``min(struct(dist,
    cluster))`` — hash-aggregable, no sort); new centroids come from one
    posexplode + (cluster, dim) average. Only the k x d centroid table
    returns to the driver between iterations — the MLlib pattern: driver
    syncs the model, never the data. Init is the k lowest-id vectors, so
    reruns are reproducible.

    Returns (cluster_id, centroid array<double>, n_members, inertia) for
    the final assignment.
    """
    # localCheckpoint (lazy), not persist(): the fit references the vector
    # frame every round and the final assignment once more — one
    # materialization either way — but checkpoint storage is released by
    # the ContextCleaner when the caller drops the result, so the returned
    # frame can stay LAZY (no eager output materialization + memcpy +
    # re-read before the caller's own action).
    base = _kmeans_base(corpus, id_col, vec_col).localCheckpoint(eager=False)
    # full-corpus fit: per-round model sync (see _kmeans_fit ``via`` — the
    # fused 5-round nested plan costs more driver replanning than 5 small
    # job submissions at every scale where the fit set is the corpus)
    cent = _kmeans_fit(base, k, iters, init, via="sync")
    if not cent:
        return corpus.sparkSession.createDataFrame(
            [],
            "cluster_id int, n_members bigint, inertia double, "
            "centroid array<double>",
        )
    cent_lit = F.array(
        *[F.array(*[F.lit(float(x)) for x in c]) for _cid, c in cent]
    )
    return (
        # model_via="broadcast": this assignment feeds exactly ONE
        # consumer (the groupBy), so the broadcast frame costs one extra
        # join node while the k·d-literal tree costs Catalyst analysis at
        # every reference — A/B at k=8,d=64 (r13 batch 7): wall 10.9/10.7
        # → 7.1/7.8 s with broadcast, CPU flat. semantic_dedup keeps the
        # size dispatch: its assignment is referenced 3× (pair sides +
        # keep join) and the same flip measured +2–4 s there.
        _kmeans_assign(base, cent, model_via="broadcast")
        .groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            qround(F.sum("d2"), 4).alias("inertia"),
        )
        # fitted model attached from the driver-side literal (k x d doubles)
        .withColumn("centroid", F.element_at(cent_lit, F.col("cluster_id") + 1))
    )


def _kmeans_base(corpus: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    return corpus.select(
        F.col(id_col).alias("_vid"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("_v"),
    )


def _coarse_quantize_centroids(cent_rows, nlist: int, iters: int = 5):
    """Driver-side Lloyd over the k centroid VECTORS (the model, not the
    data — k·d doubles already live on the driver): cluster the
    centroids into ≤ ``nlist`` coarse cells so :func:`_kmeans_assign`
    can prune. Deterministic (first-``nlist`` init, fixed iterations, no
    RNG). Returns (coarse_cells [[d-doubles]], lists [[centroid
    POSITION]]), with empty cells dropped — every returned cell owns at
    least one centroid, so a probed cell always yields candidates."""
    vecs = [[float(x) for x in c] for _cid, c in cent_rows]
    nlist = min(int(nlist), len(vecs))

    def _d2(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    def _nearest(v, cells):
        best, bd = 0, None
        for j, cc in enumerate(cells):
            d = _d2(v, cc)
            if bd is None or d < bd:
                best, bd = j, d
        return best

    coarse = [list(vecs[i]) for i in range(nlist)]
    for _ in range(iters):
        assign = [_nearest(v, coarse) for v in vecs]
        for j in range(nlist):
            members = [vecs[i] for i, a in enumerate(assign) if a == j]
            if members:
                coarse[j] = [sum(xs) / len(members) for xs in zip(*members)]
    lists = [[] for _ in range(nlist)]
    for pos, v in enumerate(vecs):
        lists[_nearest(v, coarse)].append(pos)
    kept = [(cc, lst) for cc, lst in zip(coarse, lists) if lst]
    return [cc for cc, _ in kept], [lst for _, lst in kept]


def _kmeans_assign(
    base: DataFrame,
    cent_rows,
    model_via: str | None = None,
    nprobe: int | None = None,
    nlist: int | None = None,
) -> DataFrame:
    """Nearest-centroid assignment against the k x d centroid model:
    per row, distance to each centroid (zip_with fold) and argmin via
    array_position of the min (first occurrence = lowest cluster id, the
    same tie-break as min(struct(d2, cluster_id))). No per-iteration
    groupBy-by-row-id, no join-back shuffle.

    Model delivery is size-dispatched: a small model inlines as an
    array-of-arrays LITERAL (pure whole-stage-codegen projection); a
    large one (k·d > 2048 doubles) rides a broadcast 1-row frame instead
    — Catalyst spends seconds PER JOB code-generating a multi-thousand-
    literal expression (measured: ~30 s of driver time across the Lloyd
    jobs at k=80, d=64, invariant to fit-sample size; PLANS.md
    "Scale-stress r8"), while the broadcast column is one constant in
    the generated code. The arithmetic — zip_with fold, array_min,
    array_position tie-break — is identical either way. ``model_via``
    forces "literal" or "broadcast" (unit-test parity pin); None
    dispatches on size.

    ``nprobe``: IVF-pruned assignment — the same list pruning
    :func:`ivf_topk` applies to the corpus, applied to the CENTROID
    model: the k centroids are coarse-quantized driver-side into
    ``nlist`` cells (default ≈ √k; model-sized work), and each row
    scores the ``nprobe`` nearest cells' member centroids only —
    O((nlist + nprobe·k/nlist)·d) per row instead of O(k·d). The fold
    arithmetic and the lowest-position tie-break are IDENTICAL to the
    full scan, so ``nprobe >= nlist`` reproduces it bit-for-bit (pinned
    by unit test); smaller nprobe is the standard IVF approximation.
    Deterministic either way — the assignment stays a pure function of
    the vector, which is what semantic_dedup's duplicates-share-a-
    cluster guarantee needs."""
    k_times_d = sum(len(c) for _cid, c in cent_rows)
    pruned = nprobe is not None and len(cent_rows) > 1
    if pruned:
        if nlist is None:
            nlist = max(2, int(math.isqrt(len(cent_rows))))
        coarse, lists = _coarse_quantize_centroids(cent_rows, nlist)
        nprobe = max(1, min(int(nprobe), len(coarse)))
    if model_via == "broadcast" or (model_via is None and k_times_d > 2048):
        spark = base.sparkSession
        cents = [[float(x) for x in c] for _cid, c in cent_rows]
        if pruned:
            cent_df = spark.createDataFrame(
                [(cents, coarse, lists)],
                "_cents array<array<double>>, "
                "_coarse array<array<double>>, _lists array<array<int>>",
            )
            coarse_lit = F.col("_coarse")
            lists_lit = F.col("_lists")
        else:
            cent_df = spark.createDataFrame(
                [(cents,)], "_cents array<array<double>>"
            )
        cent_lit = F.col("_cents")
        base = base.crossJoin(F.broadcast(cent_df))  # 1-row model frame
    else:
        cent_lit = F.array(
            *[F.array(*[F.lit(float(x)) for x in c]) for _cid, c in cent_rows]
        )
        if pruned:
            coarse_lit = F.array(
                *[F.array(*[F.lit(float(x)) for x in cc]) for cc in coarse]
            )
            lists_lit = F.array(
                *[F.array(*[F.lit(int(p)) for p in lst]) for lst in lists]
            )

    def fold_d2(c):
        return F.aggregate(
            F.zip_with(F.col("_v"), c, lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    if pruned:
        # nprobe nearest coarse cells (struct sort: d2 then cell index —
        # deterministic), their member centroid positions concatenated,
        # then the same fold scored over candidates only; min(struct(d2,
        # position)) ties to the lowest position, exactly the full
        # scan's first-occurrence argmin
        probed = F.slice(
            F.array_sort(
                F.transform(
                    coarse_lit,
                    lambda c, i: F.struct(
                        fold_d2(c).alias("d"), i.alias("i")
                    ),
                )
            ),
            1,
            int(nprobe),
        )
        cand = F.flatten(
            F.transform(
                probed, lambda s: F.element_at(lists_lit, s["i"] + 1)
            )
        )
        best = F.array_min(
            F.transform(
                cand,
                lambda p: F.struct(
                    fold_d2(F.element_at(cent_lit, p + 1)).alias("d"),
                    p.alias("p"),
                ),
            )
        )
        return base.select("_vid", "_v", best.alias("_b")).select(
            "_vid",
            "_v",
            F.col("_b.p").cast("int").alias("cluster_id"),
            F.col("_b.d").alias("d2"),
        )
    d2s = F.transform(cent_lit, fold_d2)
    return base.select("_vid", "_v", d2s.alias("_d2s")).select(
        "_vid",
        "_v",
        (F.array_position(F.col("_d2s"), F.array_min(F.col("_d2s"))) - 1)
        .cast("int")
        .alias("cluster_id"),
        F.array_min(F.col("_d2s")).alias("d2"),
    )


def _kmeans_init_farthest(base: DataFrame, k: int):
    """Deterministic k-means++-style seeding (farthest-first traversal,
    the exact-argmax variant of D² sampling — no RNG, rerun-stable): the
    first seed is the lowest-id vector; each next seed is the point with
    the MAXIMUM squared distance to its nearest chosen seed, ties to the
    lowest id. k-1 driver rounds, each returning ONE row (an argmax over
    the broadcast-seed assignment) — model-sized sync, like the Lloyd
    loop itself. Far better-spread seeds than lowest-id init on clustered
    data (pinned by unit test: strictly lower inertia on a separable
    fixture)."""
    first = base.orderBy("_vid").limit(1).collect()
    if not first:
        return []
    cent = [(0, [float(x) for x in first[0]["_v"]])]
    for i in range(1, k):
        row = (
            _kmeans_assign(base, cent)
            .select(F.struct(F.col("d2"), (-F.col("_vid")).alias("_nid"),
                             F.col("_v")).alias("_s"))
            .agg(F.max("_s").alias("_m"))
            .collect()[0]["_m"]
        )
        if row is None:
            break
        cent.append((i, [float(x) for x in row["_v"]]))
    return cent


def _kmeans_fit(
    base: DataFrame,
    k: int,
    iters: int,
    init: str = "lowest_ids",
    seed_cent=None,
    via: str = "fused",
):
    """Lloyd iterations over a (persisted) ``_kmeans_base`` frame; returns
    the fitted [(cluster_id, centroid)] model. ``init='lowest_ids'`` (the
    oracle-parity default: k lowest-id vectors) or ``'kmeanspp'``
    (deterministic farthest-first D²-argmax seeding). Only the k x d
    centroid table returns to the driver between iterations (the MLlib
    model-sync pattern). ``seed_cent`` injects an already-collected
    [(cluster_id, centroid)] seed — callers that collected the seed rows
    for another purpose skip the duplicate TopK job.

    ``via`` picks the round delivery, model-identical either way (same
    zip_with d² fold, same argmin tie-break, same per-cluster avg-per-dim
    aggregation, same empty-cluster carryover — pinned by unit test):
    - "fused": ALL rounds in one linear plan, model carried through the
      aggregation; one job, no per-round driver sync. Wins when the
      per-round job-submission latency dominates (small persisted fit
      sets: the sampled/pruned variants).
    - "sync": one collect per round (the classic MLlib model sync).
      Wins when the fused plan's nested 5-round Catalyst/AQE replanning
      dominates (full-corpus fits: r14 A/B measured sync 3.3-3.9 s wall /
      0.6-0.7 CPU vs fused 5.0-5.5 / 1.2 on the sf0.1 embeddings)."""
    if seed_cent is not None:
        cent = list(seed_cent)
    elif init == "kmeanspp":
        cent = _kmeans_init_farthest(base, k)
    elif init == "lowest_ids":
        cent = [
            (int(i), [float(x) for x in r["_v"]])
            for i, r in enumerate(base.orderBy("_vid").limit(k).collect())
        ]
    else:
        raise ValueError("init must be 'lowest_ids' or 'kmeanspp'")
    if not cent:
        # empty corpus: no model — callers early-return empty frames
        # rather than building a VOID-typed centroid literal
        return []
    if via == "sync":
        dim = len(cent[0][1])
        for _ in range(iters):
            new = (
                _kmeans_assign(base, cent)
                .groupBy("cluster_id")
                .agg(
                    F.array(
                        *[F.avg(F.col("_v")[i]) for i in range(dim)]
                    ).alias("_c")
                )
                .collect()
            )
            # empty clusters keep their previous centroid
            updated = {
                int(r["cluster_id"]): [float(x) for x in r["_c"]] for r in new
            }
            cent = [(cid, updated.get(cid, old)) for cid, old in cent]
        return cent
    # ALL Lloyd iterations run in ONE job: the model rides a 1-row
    # broadcast frame through the plan (assign → per-(cluster, dim) avg →
    # carryover merge → next round's model frame), and only the FINAL
    # k x d centroid table is collected. The per-iteration collect() of
    # the old loop cost one full job submission + Catalyst planning pass
    # per round (measured ~1.1 s/round over a 214-row cached fit frame at
    # sf0.1 — pure driver/scheduler overhead, the arithmetic is
    # microseconds); fusing the rounds keeps the driver out of the loop,
    # which is the MLlib-style model-sync pattern minus the per-round
    # sync. Every expression (zip_with d² fold, argmin tie-break,
    # posexplode avg, empty-cluster carryover) is IDENTICAL to the
    # per-round formulation, so the fitted model is unchanged.
    spark = base.sparkSession
    k_eff = len(cent)
    cent_df = spark.createDataFrame(
        [([[float(x) for x in c] for _cid, c in cent],)],
        "_cents array<array<double>>",
    )

    def _fold_d2(c):
        return F.aggregate(
            F.zip_with(F.col("_v"), c, lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    for _ in range(iters):
        d2s = F.transform(F.col("_cents"), _fold_d2)
        # _cents is CARRIED THROUGH the aggregation (identical on every
        # row of the broadcast cross join, so first() is deterministic):
        # each round then references the model frame exactly ONCE and the
        # whole fit is a single linear plan — no per-round checkpoint, no
        # per-round Catalyst pass (the checkpointed formulation paid ~0.5 s
        # planning + 3 jobs per round in the r13 timeline probe)
        assigned = base.crossJoin(F.broadcast(cent_df)).select(
            (F.array_position(d2s, F.array_min(d2s)) - 1)
            .cast("int")
            .alias("cluster_id"),
            "_v",
            "_cents",
        )
        # per-cluster means as one avg per dimension in a SINGLE groupBy
        # (d is fixed and known from the seed) — the posexplode +
        # (cluster, dim) + (cluster) two-level aggregate paid an extra
        # exchange per round; per-partition accumulation order is
        # unchanged (row order, dim by dim), so the means are the same
        # doubles the exploded formulation produced
        dim = len(cent[0][1])
        percl = assigned.groupBy("cluster_id").agg(
            F.array(
                *[F.avg(F.col("_v")[i]) for i in range(dim)]
            ).alias("_c"),
            F.first("_cents").alias("_oc"),
        )
        # empty clusters keep their previous centroid (map lookup falls
        # through to the prior round's model row). base is never empty
        # here (an empty corpus early-returns above), so the aggregate
        # always sees >= 1 cluster row and _oc is always populated.
        newmap = percl.agg(
            F.map_from_entries(
                F.collect_list(F.struct(F.col("cluster_id"), F.col("_c")))
            ).alias("_m"),
            F.first("_oc").alias("_oc"),
        )
        cent_df = newmap.select(
            F.transform(
                F.sequence(F.lit(0), F.lit(k_eff - 1)),
                lambda i: F.coalesce(
                    F.element_at(F.col("_m"), i.cast("int")),
                    F.element_at(F.col("_oc"), i.cast("int") + 1),
                ),
            ).alias("_cents")
        )
    fitted = cent_df.collect()[0]["_cents"]
    return [
        (cid, [float(x) for x in vec]) for cid, vec in enumerate(fitted)
    ]


def semantic_dedup(
    corpus: DataFrame,
    k: int = 8,
    iters: int = 5,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    fit_sample_mod: int | None = None,
    assign_nprobe: int | None = None,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): semantic near-duplicate pruning —
    cluster the embedding corpus with k-means, then compare pairs ONLY
    within a cluster and drop every document that has a sufficiently
    similar (cosine >= ``threshold``) neighbor with a lower id in its
    cluster. The kept set is deterministic: per near-dup chain the
    lowest-id member survives (documented variant of the paper's
    keep-one-per-epsilon-ball; the paper keeps a random or
    farthest-from-centroid member).

    The 100 TB story IS the clustering: an all-pairs cosine join is
    O(n²), but the cluster-key equijoin bounds candidates to Σ|cluster|²
    — with k scaled so clusters stay ~constant-sized, that's O(n²/k),
    the SemDeDup design point. Assignment is a literal-model projection
    (no shuffle); the pair join shuffles on cluster_id; AQE's skew-join
    splits a degenerate hot cluster.

    ``fit_sample_mod``: cap the LLOYD cost at scale. Keeping clusters
    constant-sized means k grows with n, and full-corpus Lloyd is
    O(n·k·d) per iteration — measured at 10x sf it overtakes the pair
    join (46 s fit vs 3.7 s pairs at k=80 on 20k vectors; PLANS.md
    "Scale-stress r8"). With ``fit_sample_mod = m``, centroids are
    fitted on the deterministic ~1/m subset
    ((id % 100003) * 2654435761) % m == 0 — portable arithmetic, no
    RNG, no hash function — ALWAYS unioned with the k lowest ids (so
    the fit set is never empty and the seeding is identical to the
    unsampled path); the FINAL assignment and the pair join still cover
    the full corpus. Requires an integer ``id_col``. Sampled centroids
    differ from full-fit centroids, but exact duplicates always share a
    cluster under ANY centroid model, so the dedup guarantee that
    matters is sample-invariant (pinned by unit test).

    ``assign_nprobe``: cap the ASSIGNMENT cost at scale — the residual
    term after sampled fit is the full-corpus nearest-centroid scan,
    O(n·k·d) (PLANS.md "Scale-stress r8" decomposition). When set, the
    final assignment runs IVF-pruned (:func:`_kmeans_assign` ``nprobe``:
    centroids coarse-quantized into ≈√k cells, each row scores only the
    nprobe nearest cells' centroids — O(n·√k·nprobe·d)). Still a pure
    deterministic function of the vector, so exact duplicates still
    share a cluster and the kept set stays rerun-stable; cluster
    boundaries may differ from the exhaustive scan (standard IVF
    approximation; ``nprobe >= √k`` recovers it exactly).

    Returns (``id_col``, cluster_id, keep) — discrete columns only, so
    the oracle compare is float-free.
    """
    # lazy localCheckpoint instead of persist(): same single
    # materialization (the fit-seed TopK triggers it), but storage is
    # ContextCleaner-released when the caller drops the result, so the
    # returned frame stays LAZY — the old eager-output + unpersist dance
    # computed the whole pair join before returning and then re-read the
    # copy.
    base = _kmeans_base(corpus, id_col, vec_col).localCheckpoint(eager=False)
    if fit_sample_mod is not None and fit_sample_mod > 1:
        # ONE TopK job: the k lowest rows both seed the fit (identical to
        # the unsampled path's lowest_ids init) and anchor the fit set
        low = base.orderBy("_vid").limit(k).collect()
        low_ids = [r["_vid"] for r in low]
        seed = [
            (int(i), [float(x) for x in r["_v"]]) for i, r in enumerate(low)
        ]
        pred = (
            F.pmod(
                F.pmod(F.col("_vid"), F.lit(100003)) * F.lit(2654435761),
                F.lit(int(fit_sample_mod)),
            )
            == 0
        )
        fit_base = base.filter(pred | F.col("_vid").isin(low_ids)).persist()
        cent = _kmeans_fit(fit_base, k, iters, seed_cent=seed)
        fit_base.unpersist()
    else:
        # full-corpus fit: the per-round model sync beats the fused
        # single plan here — the fused form's 5-round nested plan costs
        # more Catalyst/AQE replanning than 5 small job submissions
        # (r14 A/B: sync 3.3-3.9 s wall / 0.6-0.7 CPU vs fused 5.0-5.5 /
        # 1.2 on the sf0.1 embeddings; VERDICT r13 #1 — this was the
        # round's one driver-flagged regression, 0.71x)
        cent = _kmeans_fit(base, k, iters, via="sync")
    if not cent:
        return corpus.sparkSession.createDataFrame(
            [], f"{id_col} bigint, cluster_id int, keep boolean"
        )
    # norms precomputed ONCE per vector (the pair join would otherwise
    # re-fold both norms for every candidate — 3x the per-pair work);
    # dot/(na*nb) is the identical op sequence to the oracle's
    # list_dot_product / (sqrt(dp_aa) * sqrt(dp_bb))
    assigned = _kmeans_assign(base, cent, nprobe=assign_nprobe).select(
        "_vid", "_v", "cluster_id", norm_expr(F.col("_v")).alias("_nrm")
    ).localCheckpoint(eager=False)
    a = assigned.select(
        F.col("cluster_id"),
        F.col("_vid").alias("id_a"),
        F.col("_v").alias("va"),
        F.col("_nrm").alias("na"),
    )
    b = assigned.select(
        F.col("cluster_id"),
        F.col("_vid").alias("id_b"),
        F.col("_v").alias("vb"),
        F.col("_nrm").alias("nb"),
    )
    # within-cluster pairs only: cluster-key equijoin, never a cross join
    # the per-pair dot is the family's dominant executor cost (Σ|cluster|²
    # pairs × d); the d-specialised unroll swaps the interpreted HOF fold
    # for one codegen'd expression with identical fold order (d from the
    # fitted model). Safe here because the checkpoint above keeps the
    # consuming plan small — the single 64-term tree is planned once.
    d_fit = len(cent[0][1])
    dup_b = (
        a.join(b, "cluster_id")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(
            qround(
                dot_expr_fixed(F.col("va"), F.col("vb"), d_fit)
                / (F.col("na") * F.col("nb")),
                6,
            )
            >= F.lit(float(threshold))
        )
        .select(F.col("id_b").alias("_dup"))
        .distinct()
    )
    return (
        assigned.join(
            dup_b, assigned["_vid"] == dup_b["_dup"], "left"
        )
        .select(
            F.col("_vid").alias(id_col),
            "cluster_id",
            F.col("_dup").isNull().alias("keep"),
        )
    )


def kmeans_assignment_recall(
    corpus: DataFrame,
    k: int = 8,
    nprobe: int = 1,
    nlist: int | None = None,
    floor: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    digits: int = 6,
) -> DataFrame:
    """Recall audit for the IVF-pruned assignment SCALE path: run
    :func:`_kmeans_assign` twice against the same deterministic
    lowest-id centroid model — once exhaustive, once pruned
    (``nprobe`` < ``nlist``, the regime :func:`semantic_dedup`'s
    ``assign_nprobe`` ships at 100 TB) — and report agreement in ONE
    row (n, n_agree, agreement, floor_ok). This is the ANN-style
    recall-floor check (`ivf_topk`'s unit floors, promoted to a driver
    contract): the production pruning is an approximation by design,
    and the floor is the guarantee a user relies on when they turn
    ``assign_nprobe`` on.

    The centroid model is the k lowest-id vectors (no data-sized Lloyd
    — this audits the ASSIGNMENT machinery, not the fit; the fit has
    its own contracts). Pruned and full assignments are both pure
    deterministic functions of the vector, so agreement is exact and
    rerun-stable. ``floor_ok`` is TRUE on an empty corpus (vacuous).

    Scale shape: two broadcast-model projections over the corpus (the
    audited operator itself) + one id-equijoin + ONE aggregate — run it
    on a sample in production; cost is 2× one assignment pass.
    """
    # try/finally so an exception between persist() and the eager
    # checkpoint cannot pin the cached frame for the session (the same
    # leak class fixed in preference.transitivity_violations)
    base = _kmeans_base(corpus, id_col, vec_col).persist()
    try:
        cent = [
            (int(i), [float(x) for x in r["_v"]])
            for i, r in enumerate(base.orderBy("_vid").limit(k).collect())
        ]
        spark = corpus.sparkSession
        if not cent:
            return spark.createDataFrame(
                [(0, 0, None, True)],
                "n bigint, n_agree bigint, agreement double,"
                " floor_ok boolean",
            )
        full = _kmeans_assign(base, cent).select(
            F.col("_vid").alias("_fid"), F.col("cluster_id").alias("_cf")
        )
        pruned = _kmeans_assign(
            base, cent, nprobe=nprobe, nlist=nlist
        ).select(
            F.col("_vid").alias("_pid"), F.col("cluster_id").alias("_cp")
        )
        j = full.join(pruned, F.col("_fid") == F.col("_pid"))
        agg = j.agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.count(F.when(F.col("_cf") == F.col("_cp"), 1))
            .cast("bigint")
            .alias("n_agree"),
        )
        agreement = qround(
            F.when(
                F.col("n") > 0,
                F.col("n_agree").cast("double") / F.col("n").cast("double"),
            ),
            digits,
        )
        return agg.select(
            "n",
            "n_agree",
            agreement.alias("agreement"),
            F.when(F.col("n") > 0, agreement >= F.lit(float(floor)))
            .otherwise(F.lit(True))
            .alias("floor_ok"),
        ).localCheckpoint(eager=True)
    finally:
        base.unpersist()


def pq_train(
    corpus: DataFrame,
    m: int = 4,
    k: int = 16,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Train a product-quantization codebook: split the d dimensions into
    ``m`` contiguous subspaces and run :func:`kmeans` independently in each
    — the FAISS PQ training step. With m subspaces of k codes, a vector
    compresses to m small ints (m bytes at k ≤ 256) while distances stay
    computable against the codebook — the memory format that makes
    10^10-vector ANN feasible where even int8 scalar codes are too big.

    m driver-loop kmeans runs, each the broadcast-model pattern (only
    k × d/m doubles sync per iteration); the corpus is scanned per
    subspace fit. Returns (subspace, code, centroid) — model-sized.
    """
    row = corpus.select(F.size(F.col(vec_col)).alias("d")).first()
    if row is None:
        return corpus.sparkSession.createDataFrame(
            [], "subspace int, code int, centroid array<double>"
        )
    d = row["d"]
    if d % m != 0:
        raise ValueError(f"dims {d} not divisible by m={m}")
    sub = d // m
    parts = []
    for s in range(m):
        sliced = corpus.select(
            F.col(id_col),
            F.slice(
                F.transform(F.col(vec_col), lambda x: x.cast("double")),
                s * sub + 1,
                sub,
            ).alias("embedding"),
        )
        cb = kmeans(sliced, k=k, iters=iters, id_col=id_col,
                    vec_col="embedding")
        parts.append(
            cb.select(
                F.lit(s).alias("subspace"),
                F.col("cluster_id").cast("int").alias("code"),
                F.col("centroid"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _pq_codebook_frame(codebook: DataFrame):
    """Collect a trained codebook to a BROADCAST 1-row frame whose single
    column ``_pq_cb`` is the nested array CB[s][code] = centroid
    (model-sized: m·k·d/m doubles). Callers crossJoin(broadcast(frame))
    and index with ``F.col("_pq_cb")[s]`` — arithmetic identical to the
    former literal delivery (same doubles, same fold order), but the model
    is ONE constant in the generated code instead of an m·k·sub-literal
    expression tree inlined at every use site. The literal form made
    Catalyst re-analyze ~512-literal subtrees at 8+ sites per query
    (plans/r13/pq_adc_topk_before.txt: 114 KB of plan text; ~2.8 s of
    driver planning gaps in the r13 timeline probe) — the same
    pathology `_kmeans_assign` size-dispatches around, hit here at a
    smaller model size because the tree is replicated per subspace per
    consumer. Returns (frame, m, sub); (None, 0, 0) on an empty codebook
    (callers early-return empty result frames)."""
    rows = codebook.select("subspace", "code", "centroid").collect()
    by_s: dict[int, dict[int, list[float]]] = {}
    for r in rows:
        by_s.setdefault(r.subspace, {})[r.code] = list(r.centroid)
    m = len(by_s)
    if m == 0:
        return None, 0, 0
    # element_at(cb[s], code+1) decodes by POSITION: a codebook whose code
    # values have gaps (e.g. an empty kmeans cluster dropped upstream) would
    # silently score the wrong centroid for any externally-produced codes
    # table — fail loudly instead (ADVICE r13).
    for s in range(m):
        cs = sorted(by_s.get(s, {}))
        if not cs or cs != list(range(len(cs))):
            raise ValueError(
                f"codebook subspace {s} has non-contiguous codes {cs[:8]}; "
                "element_at position decode requires codes 0..k-1 in every "
                "subspace 0..m-1"
            )
    cb = [
        [[float(x) for x in by_s[s][c]] for c in sorted(by_s[s])]
        for s in range(m)
    ]
    frame = codebook.sparkSession.createDataFrame(
        [(cb,)], "_pq_cb array<array<array<double>>>"
    )
    sub = len(cb[0][0])
    return frame, m, sub


def pq_encode(
    corpus: DataFrame,
    codebook: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode vectors against a trained PQ codebook: per subspace, the
    nearest-centroid code (L2, lowest-code tie-break). A pure projection —
    the codebook rides a broadcast 1-row frame; no shuffle. Returns
    (id, codes array<int>)."""
    cb_df, m, sub = _pq_codebook_frame(codebook)
    if m == 0:
        return corpus.sparkSession.createDataFrame(
            [], f"{id_col} bigint, codes array<int>"
        )
    return _pq_encode_with_frame(corpus, cb_df, m, sub, id_col, vec_col)


def _pq_encode_with_frame(
    corpus: DataFrame,
    cb_df: DataFrame,
    m: int,
    sub: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """pq_encode against an already-built codebook frame — callers that
    also score against the codebook (ivfpq_topk) build the frame ONCE and
    thread it here, instead of collecting + broadcasting the codebook
    twice per query (ADVICE r13)."""
    cb = F.col("_pq_cb")
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))

    def code_for(s: int):
        q = F.slice(v, s * sub + 1, sub)
        d2s = F.transform(
            cb[s],
            lambda c: F.aggregate(
                F.zip_with(q, c, lambda a, b: (a - b) * (a - b)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
        )
        return (F.array_position(d2s, F.array_min(d2s)) - 1).cast("int")

    return corpus.crossJoin(F.broadcast(cb_df)).select(
        F.col(id_col),
        F.array(*[code_for(s) for s in range(m)]).alias("codes"),
    )


def pq_deterministic_codebook(
    corpus: DataFrame,
    m: int = 4,
    k: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Codebook from the k LOWEST-ID vectors' subspace slices instead of
    k-means — the same determinism trade `ivf_topk` ships for oracle
    parity: encode/search are identical operators either way, only the
    (model-sized) codebook table differs. Production uses `pq_train`."""
    row = corpus.select(F.size(F.col(vec_col)).alias("d")).first()
    if row is None:
        return corpus.sparkSession.createDataFrame(
            [], "subspace int, code int, centroid array<double>"
        )
    d = row["d"]
    if d % m != 0:
        raise ValueError(f"dims {d} not divisible by m={m}")
    sub = d // m
    rows = corpus.select(id_col, vec_col).orderBy(id_col).limit(k).collect()
    data = []
    for code, r in enumerate(rows):
        vec = [float(x) for x in r[vec_col]]
        for s in range(m):
            data.append((s, code, vec[s * sub:(s + 1) * sub]))
    return corpus.sparkSession.createDataFrame(
        data, "subspace int, code int, centroid array<double>"
    )


def pq_adc_topk(
    queries: DataFrame,
    codes: DataFrame,
    codebook: DataFrame,
    k: int = 5,
    query_id: str = "vec_id",
    query_vec: str = "embedding",
    codes_id: str = "vec_id",
) -> DataFrame:
    """Asymmetric-distance top-k over the PQ-compressed corpus: the float
    query meets only codes — per subspace the score contribution is
    dot(query_slice, CB[s][code_s]), summed across subspaces (≈ the full
    dot product when vectors are normalized). Queries broadcast against the
    compact code table (the corpus floats never load); per-query top-k is
    one window. Compose with IVF list pruning for the full IVF-PQ shape —
    same operator over the per-list code subset."""
    from pyspark.sql import Window

    cb_df, m, sub = _pq_codebook_frame(codebook)
    if m == 0:
        return queries.sparkSession.createDataFrame(
            [],
            f"{query_id} bigint, neighbor_id bigint, "
            "approx_dot double, rank int",
        )
    cb = F.col("_pq_cb")
    q = queries.select(
        F.col(query_id).alias("qid"),
        F.transform(F.col(query_vec), lambda x: x.cast("double")).alias("_q"),
    )
    c = codes.select(F.col(codes_id).alias("did"), "codes")
    joined = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("qid") != F.col("did"))
        .crossJoin(F.broadcast(cb_df))
    )
    score = None
    for s in range(m):
        qs = F.slice(F.col("_q"), s * sub + 1, sub)
        cent = F.element_at(cb[s], F.element_at(F.col("codes"), s + 1) + 1)
        contrib = F.aggregate(
            F.zip_with(qs, cent, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        score = contrib if score is None else score + contrib
    w = Window.partitionBy("qid").orderBy(
        F.col("approx_dot").desc(), F.col("did").asc()
    )
    return (
        # rounded BEFORE ranking so rank ties are cross-engine stable
        joined.withColumn("approx_dot", qround(score, 6))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("qid").alias(query_id),
            F.col("did").alias("neighbor_id"),
            "approx_dot",
            "rank",
        )
    )


def ivfpq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    codebook: DataFrame,
    k: int = 5,
    nlist: int = 8,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Full IVF-PQ approximate top-k (FAISS IndexIVFPQ, Jégou et al. 2011):
    IVF coarse quantizer prunes the search to ``nprobe`` of ``nlist``
    inverted lists, PQ asymmetric distance scores only the CODES of the
    candidates — the float corpus is touched neither at search time nor in
    the shuffle. This is the composition the 10^10-vector regime runs:
    cost ≈ (queries × nprobe/nlist × corpus) code-table lookups, memory ≈
    m bytes/vector.

    Centroids are the deterministic lowest-id vectors (ivf_topk's oracle
    trade — production swaps in kmeans/pq_train models, identical
    dataflow). List assignment is a broadcast-scan max_by (no window over
    the corpus); the probe→list join is an equijoin on list_id; scores are
    rounded before ranking for engine-stable ties."""
    from pyspark.sql import Window

    cent = F.broadcast(
        corpus.orderBy(id_col)
        .limit(nlist)
        .select(
            F.col(id_col).alias("centroid_id"),
            F.col(vec_col).alias("cvec"),
            norm_expr(F.col(vec_col)).alias("_ctn"),
        )
    )
    c = corpus.select(
        F.col(id_col).alias("did"),
        F.col(vec_col).alias("cv"),
        norm_expr(F.col(vec_col)).alias("_cn"),
    )
    acos = qround(
        dot_expr(F.col("cv"), F.col("cvec")) / (F.col("_cn") * F.col("_ctn")), 6
    )
    lists = (
        c.crossJoin(cent)
        .groupBy("did")
        .agg(
            F.max(
                F.struct(
                    acos.alias("_a"),
                    (-F.col("centroid_id")).alias("_nc"),
                    F.col("centroid_id").alias("_c"),
                )
            ).alias("_m")
        )
        .select("did", F.col("_m._c").alias("list_id"))
    )
    # build the codebook frame ONCE: both the encode step and the ADC
    # scorer below ride the same collected + broadcast model (ADVICE r13 —
    # the pq_encode call re-collected and re-broadcast it)
    cb_df, m, sub = _pq_codebook_frame(codebook)
    if m == 0:
        return queries.sparkSession.createDataFrame(
            [],
            "query_id bigint, neighbor_id bigint, "
            "approx_dot double, rank bigint",
        )
    codes = _pq_encode_with_frame(corpus, cb_df, m, sub, id_col, vec_col)
    cand = codes.withColumnRenamed(id_col, "did").join(lists, "did")

    q = queries.select(
        F.col(id_col).alias("qid"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("_q"),
    ).withColumn("_qn", norm_expr(F.col("_q")))
    pcos = qround(
        dot_expr(F.col("_q"), F.col("cvec")) / (F.col("_qn") * F.col("_ctn")), 6
    )
    wp = Window.partitionBy("qid").orderBy(
        F.col("_p").desc(), F.col("centroid_id").asc()
    )
    probes = (
        q.crossJoin(cent)
        .withColumn("_p", pcos)
        .withColumn("_rn", F.row_number().over(wp))
        .filter(F.col("_rn") <= nprobe)
        .select("qid", "_q", F.col("centroid_id").alias("list_id"))
    )

    cb = F.col("_pq_cb")
    joined = (
        probes.join(cand, "list_id")
        .filter(F.col("qid") != F.col("did"))
        .crossJoin(F.broadcast(cb_df))
    )
    score = None
    for s in range(m):
        qs = F.slice(F.col("_q"), s * sub + 1, sub)
        centroid = F.element_at(cb[s], F.element_at(F.col("codes"), s + 1) + 1)
        contrib = F.aggregate(
            F.zip_with(qs, centroid, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        score = contrib if score is None else score + contrib
    wk = Window.partitionBy("qid").orderBy(
        F.col("approx_dot").desc(), F.col("did").asc()
    )
    return (
        joined.withColumn("approx_dot", qround(score, 6))
        .withColumn("rank", F.row_number().over(wk))
        .filter(F.col("rank") <= k)
        .select(
            F.col("qid").alias("query_id"),
            F.col("did").alias("neighbor_id"),
            "approx_dot",
            F.col("rank").cast("bigint").alias("rank"),
        )
    )


def embedding_drift(
    df: DataFrame,
    vec_col: str,
    sample_col: str,
    sample_a,
    sample_b,
    keys: list[str] = (),
    digits: int = 6,
    mean_digits: int = 6,
) -> DataFrame:
    """Embedding-space drift per key segment: cosine similarity and
    Euclidean distance between the two samples' centroid vectors — the
    representation-drift complement to the scalar monitors
    (stats.ks_2samp / psi_drift). A centroid cosine falling from ~1.0
    flags a shifted embedding population (new domain, re-trained encoder,
    corrupted batch) before any scalar metric moves.

    Scale shape: posexplode to (keys, sample, dim, x) and ONE map-side
    combined hash aggregate — the shuffle carries |segments| x 2 x n_dims
    partial sums, never vectors. Centroids are re-assembled dictionary-
    sized (collect_list + array_sort, the :func:`groupwise_embedding_mean`
    pattern) and compared with sequential-order folds (dot_expr /
    norm_expr) so the arithmetic is bit-reproducible cross-engine.
    Per-dim means are qround'd before comparison for the same reason.

    Segments present in only one sample surface with the other n = 0 and
    NULL cosine/shift (drift against nothing is undefined); a full-outer
    null-safe key join keeps NULL-keyed segments real, as in GROUP BY.

    Returns (keys..., n_a, n_b, centroid_cos, centroid_shift).
    """
    klist = list(keys)
    in_a = F.col(sample_col) == sample_a
    in_b = F.col(sample_col) == sample_b
    exploded = (
        df.filter((in_a | in_b) & F.col(vec_col).isNotNull())
        .select(
            *klist,
            F.when(in_a, F.lit("a")).otherwise(F.lit("b")).alias("_s"),
            F.posexplode(F.col(vec_col)).alias("_dim", "_x"),
        )
    )
    per_dim = exploded.groupBy(*klist, "_s", "_dim").agg(
        qround(F.avg(F.col("_x").cast("double")), mean_digits).alias("_m"),
        F.count(F.lit(1)).alias("_n"),
    )
    cents = per_dim.groupBy(*klist, "_s").agg(
        F.max("_n").alias("_n"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("_dim", "_m"))),
            lambda s: s["_m"],
        ).alias("_c"),
    )
    # both sides share the cents lineage: uniquely-prefixed key copies
    # sidestep Spark's ambiguous-self-join resolution
    jk = klist if klist else ["_jk"]
    a_side = cents.filter(F.col("_s") == "a").select(
        *[F.col(k).alias(f"_ak_{k}") for k in klist],
        *([] if klist else [F.lit(1).alias("_ak__jk")]),
        F.col("_n").alias("_na"),
        F.col("_c").alias("_ca"),
    )
    b_side = cents.filter(F.col("_s") == "b").select(
        *[F.col(k).alias(f"_bk_{k}") for k in klist],
        *([] if klist else [F.lit(1).alias("_bk__jk")]),
        F.col("_n").alias("_nb"),
        F.col("_c").alias("_cb"),
    )
    cond = None
    for k in jk:
        c = F.col(f"_ak_{k}").eqNullSafe(F.col(f"_bk_{k}"))
        cond = c if cond is None else cond & c
    joined = a_side.join(b_side, cond, "full_outer").select(
        *[
            F.coalesce(F.col(f"_ak_{k}"), F.col(f"_bk_{k}")).alias(k)
            for k in klist
        ],
        "_na", "_ca", "_nb", "_cb",
    )
    dot = dot_expr(F.col("_ca"), F.col("_cb"))
    na_norm = norm_expr(F.col("_ca"))
    nb_norm = norm_expr(F.col("_cb"))
    shift = F.sqrt(
        F.aggregate(
            F.zip_with(
                F.col("_ca"), F.col("_cb"), lambda x, y: (x - y) * (x - y)
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    both = F.col("_na").isNotNull() & F.col("_nb").isNotNull()
    return joined.select(
        *klist,
        F.coalesce(F.col("_na"), F.lit(0)).cast("bigint").alias("n_a"),
        F.coalesce(F.col("_nb"), F.lit(0)).cast("bigint").alias("n_b"),
        qround(
            F.when(both & (na_norm > 0) & (nb_norm > 0), dot / (na_norm * nb_norm)),
            digits,
        ).alias("centroid_cos"),
        qround(F.when(both, shift), digits).alias("centroid_shift"),
    )
