"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exact baseline; a sign-prefix (random
hyperplane style) bucketed variant as the scale path. Dot products are pure
``F.zip_with`` + ``F.aggregate`` Catalyst expressions — JVM-side, no Python.
"""

from __future__ import annotations

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
    q = F.broadcast(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    pairs = q.crossJoin(c).filter(F.col("query_id") != F.col("neighbor_id"))
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        qround(cosine_expr(F.col("qv"), F.col("cv")), 6).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
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
        .select(F.col(id_col).alias("centroid_id"), F.col(vec_col).alias("cvec"))
    )
    # index build: nearest centroid per corpus vector (rounded cosine +
    # centroid-id tiebreak => engine-portable determinism). max_by instead of
    # a row_number window: hash aggregation with map-side partials — no sort,
    # and at 100 TB the corpus never needs to be range-shuffled.
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    acos = qround(cosine_expr(F.col("cv"), F.col("cvec")), 6)
    assign_order = F.struct(
        acos.alias("s"), (-F.col("centroid_id")).alias("tb")
    )
    lists = (
        c.crossJoin(cent)
        .groupBy("neighbor_id")
        .agg(
            F.max_by(F.col("centroid_id"), assign_order).alias("list_id"),
            F.first("cv").alias("cv"),
        )
        .select("neighbor_id", "cv", "list_id")
    )
    # search: probe nprobe nearest centroids per query
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    probe_w = Window.partitionBy("query_id").orderBy(
        F.col("pcos").desc(), F.col("centroid_id").asc()
    )
    probes = (
        q.crossJoin(cent)
        .select(
            "query_id",
            "qv",
            "centroid_id",
            qround(cosine_expr(F.col("qv"), F.col("cvec")), 6).alias("pcos"),
        )
        .withColumn("_rn", F.row_number().over(probe_w))
        .filter(F.col("_rn") <= nprobe)
        .select("query_id", "qv", F.col("centroid_id").alias("list_id"))
    )
    scored = (
        probes.join(lists, "list_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            qround(cosine_expr(F.col("qv"), F.col("cv")), 6).alias("cosine"),
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
        sign_prefix_bucket(F.col(vec_col), bucket_dims).alias("bucket"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        sign_prefix_bucket(F.col(vec_col), bucket_dims).alias("bucket"),
    )
    pairs = q.join(c, "bucket").filter(F.col("query_id") != F.col("neighbor_id"))
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        qround(cosine_expr(F.col("qv"), F.col("cv")), 6).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
