"""Document deduplication operators: exact, n-gram Jaccard, MinHash+LSH,
SimHash.

All pure DataFrame ops (hash/shingle/explode/join) — no UDFs. Hashing uses
:mod:`..functions.hashing` portable md5 mode by default so results can be
verified against a DuckDB oracle; pass ``fast=True`` for xxhash64 on the
production path.

Scale notes: the shingle/band explodes multiply row count by O(tokens) /
O(bands) but reduce immediately through groupBy — classic map-side-heavy,
shuffle-light shape. Candidate-pair joins key on band buckets (LSH), never a
full cross join; the exact-Jaccard verifier only runs on LSH candidates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from ..functions.scalars import qround

from ..functions.hashing import portable_hash64, word_shingles


def exact_duplicates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    normalize: bool = True,
) -> DataFrame:
    """Exact dedup via hash-groupBy on (normalized) content: one row per
    distinct text with the canonical (minimum) id and duplicate count."""
    key = F.col(text_col)
    if normalize:
        key = F.lower(F.trim(F.regexp_replace(key, r"\s+", " ")))
    return (
        df.select(F.col(id_col), key.alias("_key"))
        .groupBy("_key")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count(F.lit(1)).alias("n_docs"),
        )
        .drop("_key")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Near-duplicate pairs by exact word-n-gram Jaccard similarity >=
    threshold. Pairs are generated through a shingle-equijoin (only documents
    sharing at least one shingle are compared), never a cross join.

    Returns (id_a, id_b, jaccard) with id_a < id_b, jaccard rounded to 6
    decimals for cross-engine comparability.
    """
    shingled = df.select(
        F.col(id_col).alias("id"), word_shingles(text_col, n).alias("shingles")
    ).withColumn("n_shingles", F.size("shingles"))
    exploded = shingled.select(
        "id", "n_shingles", F.explode("shingles").alias("shingle")
    )
    a = exploded.alias("a")
    b = exploded.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.n_shingles").alias("na"),
            F.col("b.n_shingles").alias("nb"),
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    jac = inter.withColumn(
        "jaccard",
        qround(F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 6),
    )
    return jac.filter(F.col("jaccard") >= threshold).select("id_a", "id_b", "jaccard")


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    shingle_n: int = 3,
    fast: bool = False,
) -> DataFrame:
    """MinHash signature per document: for each of ``num_hashes`` independent
    hash functions (seeded portable hashes), the minimum over the document's
    shingle set. Output: (id, minhash array<bigint>)."""
    shingled = df.select(
        F.col(id_col).alias("id"), F.explode(word_shingles(text_col, shingle_n)).alias("sh")
    )
    mins = [
        F.min(portable_hash64(F.col("sh"), seed=i, fast=fast)).alias(f"mh{i}")
        for i in range(num_hashes)
    ]
    sigs = shingled.groupBy("id").agg(*mins)
    return sigs.select(
        "id", F.array(*[F.col(f"mh{i}") for i in range(num_hashes)]).alias("minhash")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    fast: bool = False,
) -> DataFrame:
    """LSH candidate pairs: split each MinHash signature into ``bands`` bands
    of ``num_hashes/bands`` rows; documents sharing any band bucket become a
    candidate pair. Returns (id_a, id_b, n_bands_shared).

    This is the scale path for near-dedup: cost is O(docs x bands) rows into a
    bucket groupBy-join, with candidate verification (exact Jaccard) to be run
    only on this output.
    """
    if num_hashes % bands:
        raise ValueError("num_hashes must be divisible by bands")
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(df, text_col, id_col, num_hashes, shingle_n, fast)
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.concat_ws(
                ",", *[F.col("minhash")[b * rows_per_band + r].cast("string")
                       for r in range(rows_per_band)]
            ).alias("bucket"),
        )
        for b in range(bands)
    ]
    banded = sigs.select("id", F.explode(F.array(*band_structs)).alias("bb")).select(
        "id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_bands_shared"))
    )


def simhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 32,
    fast: bool = False,
) -> DataFrame:
    """Per-document SimHash fingerprint over word tokens: each token hashes to
    a ``bits``-wide pattern; bit b of the fingerprint is 1 iff more tokens set
    bit b than clear it. Pure explode + conditional-sum aggregation.

    Returns (id, simhash bigint). Hamming-close fingerprints indicate
    near-duplicate documents.
    """
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.filter(F.split(text_col, r"\s+"), lambda x: x != F.lit(""))).alias("tok"),
    )
    hashed = toks.withColumn("h", portable_hash64(F.col("tok"), seed="simhash", fast=fast))
    # vote per bit: +1 when set, -1 when clear; bit set iff votes > 0
    votes = hashed.groupBy("id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"v{b}")
            for b in range(bits)
        ]
    )
    fingerprint = None
    for b in range(bits):
        term = F.when(F.col(f"v{b}") > 0, F.lit(2 ** b).cast("bigint")).otherwise(F.lit(0).cast("bigint"))
        fingerprint = term if fingerprint is None else fingerprint + term
    return votes.select("id", fingerprint.alias("simhash"))


def embedding_near_duplicates(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    id_filter_max: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs by embedding cosine similarity >= threshold.
    Brute-force pair join intended for verification / small dims; the scale
    path buckets by sign-prefix first (see similarity.lsh_cosine_topk)."""
    from .similarity import cosine_expr

    base = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    if id_filter_max is not None:
        base = base.filter(F.col("id") < id_filter_max)
    a, b = base.alias("a"), base.alias("b")
    pairs = a.join(b, F.col("a.id") < F.col("b.id"))
    sim = pairs.select(
        F.col("a.id").alias("id_a"),
        F.col("b.id").alias("id_b"),
        qround(cosine_expr(F.col("a.v"), F.col("b.v")), 6).alias("cosine"),
    )
    return sim.filter(F.col("cosine") >= threshold)
