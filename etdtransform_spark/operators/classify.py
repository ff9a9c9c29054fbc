"""Hashed-feature linear classifier scoring (fastText-style).

The standard model-based quality/topic filter in large-scale training-data
pipelines (CCNet, DCLM, fastText's supervised mode): hash each word n-gram
into a fixed feature space, average the features' learned weights, squash
through a sigmoid, and gate documents on the score. Training happens
offline; at corpus scale the pipeline only needs SCORING, which this
module expresses as pure Column operations:

    tokens -> positional n-grams -> hash % n_features
           -> per-row sequential fold over the weight map -> sigmoid

Two weight-delivery paths, chosen by model size:

- ``weights`` as a dict (vocab-hash models are typically <= a few hundred
  thousand buckets): embedded as a ``create_map`` literal -> the whole
  score is a zero-shuffle projection inside whole-stage codegen. Used up
  to ``max_literal_entries`` (expression-tree size stays codegen-friendly).
- larger dicts / a weights DataFrame: posexplode the feature buckets,
  broadcast-hash-join the weight table, re-aggregate per row id. The
  explode is narrow, the join is map-side, and the only shuffle carries
  one partial sum per document — the classic scale shape.

Cross-engine determinism (the DuckDB oracle): hashing uses
``portable_hash64`` (md5-based, identical both engines), the fold is an
explicit SEQUENTIAL ``F.aggregate`` (DuckDB twin: ``list_reduce``), and
the score is qround'ed by the caller's contract query. A NULL or
zero-token document scores NULL (no evidence — never a fabricated 0.5).

No reference counterpart (the reference is an energy ETL); this is part
of the beyond-reference LLM-pipeline surface (VERDICT r6 next-round #7).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import portable_hash64, positional_word_grams, tokens

MAX_LITERAL_ENTRIES = 4096


def feature_buckets(
    text: Column | str,
    n_features: int,
    ngram_sizes: tuple[int, ...] = (1, 2),
    fast: bool = False,
) -> Column:
    """array<bigint> of hashed feature buckets for a text column.

    Positional n-grams (duplicates kept: term frequency weights the fold,
    as in fastText's mean-of-features). NULL/empty text -> NULL array.
    """
    toks = tokens(text)

    def grams_of(t: Column) -> Column:
        parts = []
        for n in ngram_sizes:
            if n == 1:
                parts.append(t)
            else:
                parts.append(
                    F.coalesce(
                        positional_word_grams(t, n), F.array().cast("array<string>")
                    )
                )
        out = parts[0]
        for p in parts[1:]:
            out = F.concat(out, p)
        return F.when(F.size(t) > 0, out)

    grams = F.transform(F.array(toks), grams_of)[0]
    return F.transform(
        grams, lambda g: F.pmod(portable_hash64(g, fast=fast), F.lit(n_features))
    )


def hashed_linear_score(
    df: DataFrame,
    text_col: str,
    weights: dict[int, float] | DataFrame,
    n_features: int,
    ngram_sizes: tuple[int, ...] = (1, 2),
    bias: float = 0.0,
    score_col: str = "score",
    id_col: str | None = None,
    fast: bool = False,
    max_literal_entries: int = MAX_LITERAL_ENTRIES,
) -> DataFrame:
    """Append ``score_col`` = sigmoid(bias + mean of bucket weights).

    ``weights``: dict bucket->weight (literal-map path when small enough)
    or a DataFrame with columns (bucket, weight) (broadcast-join path;
    requires ``id_col`` to restore row identity — it must be a UNIQUE,
    NON-NULL row identifier; the literal-map path has no such
    requirement). Buckets absent from the model weigh 0.0 — the standard
    hashed-model convention. A model row is one weight per bucket: exact
    duplicate rows collapse, but CONFLICTING duplicates are malformed
    input (the join would multiply matches), so they raise — both that
    check and the id_col-uniqueness check run INSIDE the plan
    (``raise_error`` expressions surfacing at action time), keeping the
    operator fully lazy.
    """
    buckets = feature_buckets(
        F.col(text_col), n_features, ngram_sizes=ngram_sizes, fast=fast
    )
    if isinstance(weights, dict) and len(weights) <= max_literal_entries:
        pairs: list[Column] = []
        for k in sorted(weights):
            pairs += [F.lit(int(k)).cast("bigint"), F.lit(float(weights[k]))]
        wmap = F.create_map(*pairs) if pairs else F.map_from_entries(
            F.array().cast("array<struct<key:bigint,value:double>>")
        )
        # let-bind the bucket array so it is computed once per row
        logit = F.transform(
            F.array(buckets),
            lambda b: F.when(
                F.size(b) > 0,
                F.lit(float(bias))
                + F.aggregate(
                    b,
                    F.lit(0.0),
                    lambda acc, x: acc
                    + F.coalesce(wmap[x], F.lit(0.0)),
                )
                / F.size(b),
            ),
        )[0]
        return df.withColumn(score_col, _sigmoid(logit))

    if isinstance(weights, dict):
        spark = df.sparkSession
        weights = spark.createDataFrame(
            [(int(k), float(v)) for k, v in sorted(weights.items())],
            "bucket bigint, weight double",
        )
    if id_col is None:
        raise ValueError("the weights-DataFrame path requires id_col")
    # one weight per bucket: exact duplicates (concatenated model exports)
    # collapse; conflicting duplicates would silently multiply join matches
    # and corrupt both the sum and the count, so they fail loudly — IN the
    # plan (raise_error inside the weight expression, which cannot be
    # pruned because the join reads it), not via an eager collect() that
    # would add a blocking Spark job to an otherwise lazy operator. Any
    # NULL weight is malformed and raises — including a bucket whose ONLY
    # row is NULL (count_distinct skips NULLs, so the indicator is
    # weighted 2 to keep a lone NULL from reading as one clean value).
    weights = (
        weights.select("bucket", "weight")
        .groupBy("bucket")
        .agg(
            (
                F.count_distinct("weight")
                + F.max(F.col("weight").isNull().cast("bigint")) * 2
            ).alias("_nw"),
            F.min("weight").alias("_w"),
        )
        .select(
            "bucket",
            F.when(F.col("_nw") == 1, F.col("_w"))
            .otherwise(
                F.raise_error(
                    F.concat(
                        F.lit(
                            "hashed_linear_score: weights DataFrame has "
                            "conflicting or NULL weight rows for bucket "
                        ),
                        F.col("bucket").cast("string"),
                    )
                )
            )
            .alias("weight"),
        )
    )
    # scale path: explode buckets, broadcast the (dictionary-sized) model,
    # re-aggregate one partial per row — fold order is irrelevant to the
    # THEORETICAL value but floating sums may differ from the literal path
    # in the last ulp; the unit test pins near-equality, the contract
    # queries use the literal path for bit-exact oracles
    exploded = df.select(
        F.col(id_col), F.posexplode_outer(buckets).alias("_pos", "_bucket")
    )
    scored = (
        exploded.join(F.broadcast(weights), exploded["_bucket"] == weights["bucket"], "left")
        .groupBy(id_col)
        .agg(
            F.count("_bucket").alias("_n"),
            F.sum(F.coalesce(F.col("weight"), F.lit(0.0))).alias("_s"),
            F.count("_pos").alias("_np"),
            F.max("_pos").alias("_mp"),
            F.count(F.lit(1)).alias("_nr"),
        )
        # id_col uniqueness guard, also in the plan: a duplicated id would
        # silently merge partial sums here. Two identities together cover
        # every duplicate shape: (a) for a unique id the exploded
        # positions are exactly 0..len-1, so count(_pos) == max(_pos)+1 —
        # duplicates with non-empty bucket arrays break it
        # (n+m > max(n,m)); (b) total exploded rows must equal
        # greatest(count(_pos), 1) — a NULL/empty-text row explodes to
        # ONE all-NULL row with no position, so any duplicate involving
        # an unscorable row (incl. two unscorable rows) breaks THIS
        # identity even though (a) cannot see it. NULL ids are caught on
        # the join's LEFT side below (this group gets pruned here).
        .select(
            F.col(id_col).alias("_score_id"),
            F.when(
                (F.coalesce(F.col("_mp") + 1, F.lit(0)) != F.col("_np"))
                | (F.col("_nr") != F.greatest(F.col("_np"), F.lit(1))),
                F.raise_error(
                    F.concat(
                        F.lit(
                            "hashed_linear_score: duplicated or NULL "
                            f"id_col value in {id_col!r}: "
                        ),
                        F.col(id_col).cast("string"),
                    )
                ),
            )
            .when(
                F.col("_n") > 0,
                _sigmoid(F.lit(float(bias)) + F.col("_s") / F.col("_n")),
            )
            .alias(score_col),
        )
    )
    # The NULL-id check must live on the LEFT side: the equality join
    # condition is null-rejecting, so Catalyst infers _score_id IS NOT
    # NULL and prunes the NULL-id group below the aggregate — a raise
    # branch there never evaluates (observed on 4.1.2).
    joined = df.join(scored, F.col(id_col) == F.col("_score_id"), "left")
    return joined.withColumn(
        score_col,
        F.when(
            F.col(id_col).isNull(),
            F.raise_error(
                F.lit(
                    f"hashed_linear_score: duplicated or NULL id_col "
                    f"value in {id_col!r}: NULL"
                )
            ),
        ).otherwise(F.col(score_col)),
    ).drop("_score_id")


def _sigmoid(logit: Column) -> Column:
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-logit))


def quality_gate(
    df: DataFrame,
    text_col: str,
    weights: dict[int, float] | DataFrame,
    n_features: int,
    threshold: float = 0.5,
    keep_nulls: bool = False,
    **kwargs,
) -> DataFrame:
    """Filter rows whose classifier score clears ``threshold``.

    ``keep_nulls`` decides the fate of NULL-scoring (empty/NULL text)
    documents; the default drops them — an unscorable document must not
    pass a quality gate by default.
    """
    scored = hashed_linear_score(
        df, text_col, weights, n_features, score_col="_q_score", **kwargs
    )
    cond = F.col("_q_score") >= F.lit(float(threshold))
    if keep_nulls:
        cond = cond | F.col("_q_score").isNull()
    return scored.filter(cond).drop("_q_score")
