"""Embedding-space statistics: covariance structure, per-dimension
normalization, and dimensionality diagnostics.

The ANN/dedup operators (operators/similarity.py, operators/dedup.py)
consume embeddings as-is; this module answers the questions a pipeline
asks BEFORE wiring those up at 100 TB: which dimensions carry signal
(energy profile), is the space anisotropic enough to need whitening or
centering (covariance), can vectors be truncated Matryoshka-style to
cut ANN cost (truncation recall), and a standardized projection for
drift-sensitive downstream statistics.

Scale shapes, uniformly: the only data-sized work is ONE map-side-
combined aggregate per statistic — the shuffle carries O(d) or O(d²)
partial sums per task, never vectors. Model-sized results (d-vectors,
d×d matrices) may be collected to the driver and re-broadcast as
literals, the same discipline as the k-means/PQ codebook path
(similarity.py). The d²-row map-side explode in the covariance is the
documented cost knob: at d=64 it is 4096 short rows per vector inside
one codegen stage; for d ≳ 512 swap in an Arrow mapInPandas partial
X^T X kernel (the dedup.py:660 BLAS pattern) — same output contract.

No reference counterpart (the reference is an energy ETL); part of the
beyond-reference LLM-pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.scalars import qround


def _valid_vectors(df: DataFrame, vec_col: str) -> DataFrame:
    """Rows whose vector is non-NULL, non-empty, with no NULL element —
    the same ingestion gate the contract layer applies to embeddings
    (a vector with holes cannot enter any linear-algebra aggregate)."""
    v = F.col(vec_col)
    return df.filter(
        v.isNotNull()
        & (F.size(v) > 0)
        & (F.size(F.filter(v, lambda x: x.isNull())) == 0)
    )


def embedding_covariance(
    df: DataFrame,
    vec_col: str = "embedding",
    n_dims: int = 64,
    center: bool = True,
    digits: int = 6,
) -> DataFrame:
    """Upper-triangle covariance matrix of an embedding column as rows
    (i, j, cov, n) with 0-based i ≤ j — the substrate for whitening,
    PCA (:func:`pca_project`), and anisotropy diagnostics.

    cov(i,j) = (Σ x_i x_j − Σx_i·Σx_j/n) / (n−1) (sample covariance;
    ``center=False`` gives the raw second moment Σ x_i x_j / n). The
    sums come from ONE hash aggregate over the map-side (i, j, x_i·x_j)
    pair explode — partial aggregation means the shuffle carries at
    most d(d+1)/2 partial-sum rows per map task regardless of row
    count. n < 2 yields NULL cov (sample covariance undefined).

    Vectors shorter than ``n_dims`` contribute only the dims they have;
    ragged inputs therefore carry per-cell n (the count aggregated per
    (i,j), not a global scalar).
    """
    base = _valid_vectors(df, vec_col).select(
        F.slice(F.col(vec_col), 1, n_dims).alias("_v")
    )
    left = base.select(
        F.posexplode("_v").alias("_i", "_xi"), F.col("_v")
    )
    pairs = left.select(
        "_i",
        F.col("_xi").cast("double").alias("_x"),
        F.posexplode("_v").alias("_j", "_xj"),
    ).filter(F.col("_j") >= F.col("_i"))
    agg = pairs.groupBy("_i", "_j").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("_x") * F.col("_xj").cast("double")).alias("_sxy"),
        F.sum("_x").alias("_sx"),
        F.sum(F.col("_xj").cast("double")).alias("_sy"),
    )
    n = F.col("n").cast("double")
    if center:
        cov = F.when(
            F.col("n") > 1,
            (F.col("_sxy") - F.col("_sx") * F.col("_sy") / n) / (n - 1),
        )
    else:
        cov = F.when(F.col("n") > 0, F.col("_sxy") / n)
    return agg.select(
        F.col("_i").alias("i"),
        F.col("_j").alias("j"),
        qround(cov, digits).alias("cov"),
        "n",
    )


def embedding_standardize(
    df: DataFrame,
    vec_col: str = "embedding",
    n_dims: int = 64,
    digits: int = 6,
) -> DataFrame:
    """Per-dimension z-score projection (diagonal whitening): each
    vector element is centered by its dimension's mean and scaled by
    its sample standard deviation — the cheap anisotropy fix before
    cosine/drift statistics when full whitening is overkill.

    Two jobs: ONE d-row (dim) aggregate collected to the driver (model-
    sized, the codebook discipline) and re-broadcast as literal arrays;
    the projection itself is a zero-shuffle zip_with. Dimensions with
    zero variance (or a single observation) standardize to NULL — a
    constant dimension carries no information and 0/0 must not
    fabricate one. Output replaces ``vec_col`` with the standardized
    array (element order preserved, length min(len, n_dims)).
    """
    base = _valid_vectors(df, vec_col)
    stats = (
        base.select(F.posexplode(F.slice(F.col(vec_col), 1, n_dims))
                    .alias("_i", "_x"))
        .groupBy("_i")
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.avg(F.col("_x").cast("double")).alias("_m"),
            F.stddev_samp(F.col("_x").cast("double")).alias("_s"),
        )
        .collect()
    )
    by_dim = {r["_i"]: (r["_m"], r["_s"]) for r in stats}
    means = F.array(*[
        F.lit(by_dim.get(i, (None, None))[0]).cast("double")
        for i in range(n_dims)
    ])
    stds = F.array(*[
        F.lit(by_dim.get(i, (None, None))[1]).cast("double")
        for i in range(n_dims)
    ])
    # index the LITERAL stat arrays only (i < len(slice) <= n_dims, always
    # valid); never element_at into the data vector — Catalyst's
    # InferFiltersFromGenerate can evaluate downstream-derived predicates
    # on rows the ingestion gate excludes (empty vectors), and an indexed
    # access would throw under ANSI there
    z = F.transform(
        F.slice(F.col(vec_col), 1, n_dims),
        lambda x, i: qround(
            F.when(
                F.element_at(stds, i + 1) > 0,
                (x.cast("double") - F.element_at(means, i + 1))
                / F.element_at(stds, i + 1),
            ),
            digits,
        ),
    )
    return base.withColumn(vec_col, z)


def embedding_energy_profile(
    df: DataFrame,
    vec_col: str = "embedding",
    n_dims: int = 64,
    digits: int = 6,
) -> DataFrame:
    """Per-dimension variance ("energy") ranking with cumulative share —
    the Matryoshka/truncation planning table: "how many dimensions hold
    95 % of the variance" is read straight off ``cum_share``.

    ONE (dim) hash aggregate (shuffle: d partials per task) + windows
    over the d-row result. Returns (rank, dim, variance, share,
    cum_share) ordered by variance descending, ties broken by dim —
    deterministic cross-engine. Zero-variance corpora (or n < 2) yield
    NULL shares rather than 0/0.
    """
    from pyspark.sql import Window

    base = _valid_vectors(df, vec_col).select(
        F.posexplode(F.slice(F.col(vec_col), 1, n_dims)).alias("_i", "_x")
    )
    per_dim = base.groupBy("_i").agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(F.col("_x").cast("double")).alias("_sx"),
        F.sum(F.col("_x").cast("double") * F.col("_x").cast("double"))
        .alias("_sxx"),
    )
    n = F.col("_n").cast("double")
    var = F.when(
        F.col("_n") > 1,
        (F.col("_sxx") - F.col("_sx") * F.col("_sx") / n) / (n - 1),
    )
    # round the variance FIRST: rank order and shares must be computed
    # from the same value both engines see
    dims = per_dim.select(
        F.col("_i").alias("dim"), qround(var, digits).alias("variance")
    )
    w_rank = Window.orderBy(F.col("variance").desc(), F.col("dim").asc())
    w_cum = w_rank.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    tot = F.sum("variance").over(w_all)
    return dims.select(
        F.row_number().over(w_rank).alias("rank"),
        "dim",
        "variance",
        qround(
            F.when(tot > 0, F.col("variance") / tot), digits
        ).alias("share"),
        qround(
            F.when(tot > 0, F.sum("variance").over(w_cum) / tot), digits
        ).alias("cum_share"),
    )


def matryoshka_recall(
    df: DataFrame,
    m_dims: int,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    queries: DataFrame | None = None,
    digits: int = 6,
) -> DataFrame:
    """Truncation-fidelity measurement: mean recall@k of cosine top-k
    computed on the FIRST ``m_dims`` dimensions against the full-vector
    top-k — the number that decides whether a Matryoshka-style prefix
    truncation can cut ANN cost ×(d/m) without losing neighbors.

    Cosine is scale-invariant, so truncation needs no renormalization
    for RANKING purposes; both sides run the exact brute-force
    :func:`~.similarity.cosine_topk` (deterministic tie-break), making
    this an exact measurement, not an estimate. Intended for a SAMPLED
    query set (``queries``, default: the corpus itself at contract
    scale) — the measurement is a planning probe, not a per-row
    production operator; production ANN then runs at m_dims via
    ivf_topk/pq on the truncated vectors.

    Returns ONE row: (m_dims, k, n_queries, recall) where recall
    averages |top_full ∩ top_trunc| / k over queries.
    """
    from .similarity import cosine_topk

    if m_dims < 1:
        raise ValueError(f"m_dims must be >= 1, got {m_dims}")
    corpus = _valid_vectors(df, vec_col)
    qset = _valid_vectors(queries, vec_col) if queries is not None else corpus
    full = cosine_topk(qset, corpus, k=k, id_col=id_col, vec_col=vec_col)
    trunc_corpus = corpus.withColumn(
        vec_col, F.slice(F.col(vec_col), 1, m_dims)
    )
    trunc_q = qset.withColumn(vec_col, F.slice(F.col(vec_col), 1, m_dims))
    trunc = cosine_topk(trunc_q, trunc_corpus, k=k, id_col=id_col,
                        vec_col=vec_col)
    hits = full.select("query_id", "neighbor_id").join(
        trunc.select("query_id", "neighbor_id"),
        ["query_id", "neighbor_id"],
    )
    per_q = (
        full.groupBy("query_id").agg(F.count(F.lit(1)).alias("_n_full"))
        .join(
            hits.groupBy("query_id").agg(F.count(F.lit(1)).alias("_n_hit")),
            "query_id",
            "left",
        )
        .select(
            (
                F.coalesce(F.col("_n_hit"), F.lit(0)).cast("double")
                / F.lit(float(k))
            ).alias("_r")
        )
    )
    return per_q.agg(
        F.lit(m_dims).alias("m_dims"),
        F.lit(k).alias("k"),
        F.count(F.lit(1)).alias("n_queries"),
        qround(F.avg("_r"), digits).alias("recall"),
    )


def pca_project(
    df: DataFrame,
    n_components: int,
    vec_col: str = "embedding",
    n_dims: int = 64,
    center: bool = True,
    digits: int = 6,
) -> DataFrame:
    """Project embeddings onto their top ``n_components`` principal
    axes. The covariance comes from :func:`embedding_covariance` (one
    distributed aggregate); the d×d eigendecomposition runs driver-side
    on the MODEL-sized matrix (numpy eigh — d ≤ a few thousand by
    assumption, same driver-model discipline as the k-means centroid
    and PQ codebook paths in similarity.py), and the projection is a
    zero-shuffle literal-matrix dot per row.

    Sign convention: each eigenvector is flipped so its largest-
    magnitude component is positive (ties: lowest index wins) — the
    standard determinism fix for the eigenvector sign ambiguity.
    Components are ordered by eigenvalue descending. NOT oracle-
    contracted: an eigendecomposition is not expressible in portable
    SQL; verified by unit properties instead (orthonormality, variance
    ordering, covariance reconstruction — tests/test_r10_properties.py).

    Output: input columns + ``pc`` array<double> of length
    n_components — NULL for vectors failing the ingestion gate AND for
    vectors shorter than ``n_dims`` (a prefix projection against full-
    length eigenvectors would silently treat the missing dimensions as
    values; ragged corpora should pick n_dims = the common prefix, the
    same knob embedding_covariance exposes).
    """
    import numpy as np

    if n_components < 1 or n_components > n_dims:
        raise ValueError(
            f"n_components must be in [1, {n_dims}], got {n_components}"
        )
    cov_rows = embedding_covariance(
        df, vec_col=vec_col, n_dims=n_dims, center=center, digits=None
    ).collect()
    mat = np.zeros((n_dims, n_dims))
    seen = np.zeros((n_dims, n_dims), dtype=bool)
    for r in cov_rows:
        if r["cov"] is None:
            continue
        mat[r["i"], r["j"]] = r["cov"]
        mat[r["j"], r["i"]] = r["cov"]
        seen[r["i"], r["j"]] = seen[r["j"], r["i"]] = True
    if not seen.any():
        raise ValueError("covariance is empty: no valid vectors (or n < 2)")
    vals, vecs = np.linalg.eigh(mat)  # ascending
    order = np.argsort(-vals)[:n_components]
    comps = []
    for c in order:
        v = vecs[:, c]
        pivot = int(np.argmax(np.abs(v)))
        comps.append(v if v[pivot] >= 0 else -v)
    # mean for centering (second tiny aggregate, d-row model)
    if center:
        mean_row = (
            _valid_vectors(df, vec_col)
            .select(F.posexplode(F.slice(F.col(vec_col), 1, n_dims))
                    .alias("_i", "_x"))
            .groupBy("_i")
            .agg(F.avg(F.col("_x").cast("double")).alias("_m"))
            .collect()
        )
        mu = np.zeros(n_dims)
        for r in mean_row:
            mu[r["_i"]] = r["_m"]
    else:
        mu = np.zeros(n_dims)

    v = F.slice(F.col(vec_col), 1, n_dims)
    pcs = []
    for comp in comps:
        centered_dot = F.aggregate(
            F.zip_with(
                v,
                F.array(*[F.lit(float(c)) for c in comp]),
                lambda x, w: (x.cast("double")) * w,
            ),
            F.lit(0.0),
            lambda acc, t: acc + t,
        )
        offset = float(np.dot(mu, comp))
        pcs.append(qround(centered_dot - F.lit(offset), digits))
    gate = (
        F.col(vec_col).isNotNull()
        & (F.size(F.col(vec_col)) >= n_dims)
        & (F.size(F.filter(F.col(vec_col), lambda x: x.isNull())) == 0)
    )
    return df.withColumn("pc", F.when(gate, F.array(*pcs)))


def centroid_shift(
    df_a: DataFrame,
    df_b: DataFrame,
    vec_col: str = "embedding",
    n_dims: int = 64,
    digits: int = 6,
) -> DataFrame:
    """Embedding-space drift between two corpora (model versions, time
    windows, sources): the L2 distance and cosine similarity between
    the two corpus CENTROIDS, plus each centroid's L2 norm — the
    cheapest meaningful detector for "did the embedding distribution
    move" before paying for a full covariance or recall probe.

    Each side is one (dim)-keyed mean aggregate over the first
    ``n_dims`` components (the posexplode is map-side combined to
    ≤ n_dims partials per task); the comparison then runs on two d-row
    tables. Invalid vectors (NULL / short / NULL element) are excluded
    by the standard ingestion gate.

    Returns ONE row: (n_a, n_b, l2_shift, cosine, norm_a, norm_b) —
    NULL metrics when either side is empty or a centroid is zero
    (cosine undefined).
    """
    def side(df: DataFrame, tag: str) -> tuple[DataFrame, DataFrame]:
        v = F.slice(F.col(vec_col), 1, n_dims)
        base = _valid_vectors(df, vec_col).filter(
            F.size(F.col(vec_col)) >= n_dims
        )
        dims = (
            base.select(F.posexplode(v).alias("_i", "_x"))
            .groupBy("_i")
            .agg(F.avg(F.col("_x").cast("double")).alias(f"_m{tag}"))
        )
        cnt = base.agg(F.count(F.lit(1)).cast("bigint").alias(f"n_{tag}"))
        return dims, cnt

    da, ca = side(df_a, "a")
    db, cb = side(df_b, "b")
    joined = da.join(db, "_i", "full")
    ma = F.coalesce(F.col("_ma"), F.lit(0.0))
    mb = F.coalesce(F.col("_mb"), F.lit(0.0))
    stats = joined.agg(
        F.sum((ma - mb) * (ma - mb)).alias("_d2"),
        F.sum(ma * mb).alias("_dot"),
        F.sum(ma * ma).alias("_na2"),
        F.sum(mb * mb).alias("_nb2"),
    )
    return (
        ca.crossJoin(F.broadcast(cb))
        .crossJoin(F.broadcast(stats))
        .select(
            "n_a",
            "n_b",
            qround(
                F.when(
                    (F.col("n_a") > 0) & (F.col("n_b") > 0),
                    F.sqrt(F.col("_d2")),
                ),
                digits,
            ).alias("l2_shift"),
            qround(
                F.when(
                    (F.col("_na2") > 0) & (F.col("_nb2") > 0),
                    F.col("_dot")
                    / (F.sqrt(F.col("_na2")) * F.sqrt(F.col("_nb2"))),
                ),
                digits,
            ).alias("cosine"),
            qround(
                F.when(F.col("n_a") > 0, F.sqrt(F.col("_na2"))), digits
            ).alias("norm_a"),
            qround(
                F.when(F.col("n_b") > 0, F.sqrt(F.col("_nb2"))), digits
            ).alias("norm_b"),
        )
    )
