"""Bloom-filter semi-join: prune the probe side with a compact bitmap
before the exact join.

At 100 TB the common "filter the fact table to keys present in a derived
set" step (dedup against a blocklist, restricting events to a cohort,
incremental-ingest novelty checks) has an awkward middle regime: the key
set is too big to broadcast as a hash relation (hundreds of millions of
keys = tens of GB of join hash table) but its *Bloom filter* is a few MB.
Engines exploit this with runtime filter pushdown (Spark's
``spark.sql.optimizer.runtime.bloomFilter.enabled``, Trino/Snowflake
runtime filters); this module makes the pattern an explicit, testable
operator with a guaranteed-exact result:

1. BUILD: one map-side-combined aggregate over the key set folds each
   key's ``n_hashes`` bit positions (xxhash64 with distinct seeds, JVM
   whole-stage codegen) into a ``num_bits``-wide bitmap stored as a
   map<word_index, long> — a single row, a few MB at most.
2. PRUNE: the bitmap row is broadcast (1-row broadcast nested-loop — the
   plan's only "cross" join is this deliberate scalar broadcast) and each
   probe row tests its ``n_hashes`` bits with pure Column arithmetic.
   Rows failing any bit test are dropped AT THE SCAN-adjacent filter,
   before the join shuffle — the whole point at scale.
3. CONFIRM: survivors flow into a normal left-semi equi-join against the
   key set, eliminating Bloom false positives. The final result is
   EXACTLY the plain semi-join's, so the operator is a drop-in plan
   improvement, not an approximation. (``confirm=False`` exposes the raw
   pruned stream for pipelines that tolerate the ~``fp_rate`` false
   positives and want zero shuffle.)

False-positive rate ~= (1 - e^(-kn/m))^k; the defaults (m = 1<<20 bits,
k = 5) give < 1% at one hundred thousand keys. Positions are
deterministic (seeded xxhash64, no rand()) so task retries rebuild the
identical bitmap — the same determinism requirement as
``skew.salted_join``.

NULL keys: a NULL never joins in an equi-join, and ``xxhash64(NULL)``
degenerates to the seed (memory: NULLs must be filtered before hashing)
— both sides drop NULL keys explicitly, preserving semi-join semantics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bit_positions(key: Column, num_bits: int, n_hashes: int) -> list[Column]:
    """The k deterministic bit positions for a key (seeded xxhash64)."""
    return [
        F.pmod(F.xxhash64(key, F.lit(i)), F.lit(num_bits))
        for i in range(n_hashes)
    ]


def build_bloom(
    keys_df: DataFrame,
    key_col: str,
    num_bits: int = 1 << 20,
    n_hashes: int = 5,
) -> DataFrame:
    """Aggregate the key set into a single-row Bloom bitmap.

    Returns a 1-row DataFrame with column ``bloom_words`` —
    map<int, bigint> from 64-bit word index to word value; absent words
    are all-zero (probe side coalesces misses to 0). Built as: explode
    the k positions per key, reduce to per-word OR masks, collect the
    (word, mask) pairs into a map. The explode is narrow; the only
    shuffle carries at most ``num_bits / 64`` (word, mask) rows.
    """
    pos = F.explode(
        F.array(*_bit_positions(F.col(key_col), num_bits, n_hashes))
    ).alias("_pos")
    words = (
        keys_df.filter(F.col(key_col).isNotNull())
        .select(pos)
        .groupBy((F.col("_pos") / 64).cast("int").alias("_word"))
        .agg(
            F.bit_or(
                F.call_function(
                    "shiftleft",
                    F.lit(1).cast("long"),
                    (F.col("_pos") % 64).cast("int"),
                )
            ).alias("_mask")
        )
    )
    return words.agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("_word"), F.col("_mask")))
        ).alias("bloom_words")
    )


def bloom_might_contain(
    key: Column, bloom_words: Column, num_bits: int = 1 << 20, n_hashes: int = 5
) -> Column:
    """Membership test against a bitmap column (all-JVM Column arithmetic)."""
    test = F.lit(True)
    for p in _bit_positions(key, num_bits, n_hashes):
        word = F.coalesce(
            F.element_at(bloom_words, (p / 64).cast("int")), F.lit(0).cast("long")
        )
        bit = F.call_function(
            "shiftleft", F.lit(1).cast("long"), (p % 64).cast("int")
        )
        test = test & (word.bitwiseAND(bit) != 0)
    return key.isNotNull() & test


def bloom_semi_join(
    probe: DataFrame,
    keys_df: DataFrame,
    key_col: str,
    probe_col: str | None = None,
    num_bits: int = 1 << 20,
    n_hashes: int = 5,
    confirm: bool = True,
) -> DataFrame:
    """Semi-join ``probe`` to the keys in ``keys_df`` via Bloom prune.

    Result is exactly ``probe.join(keys, probe_col == key_col,
    'left_semi')`` (when ``confirm=True``, the default). The Bloom
    bitmap prunes the probe stream before the join shuffle; the confirm
    join sees only survivors. ``keys_df`` may be any derived frame — it
    is deduplicated internally (semi-join semantics never multiply
    rows).
    """
    probe_col = probe_col or key_col
    keys = keys_df.select(F.col(key_col)).filter(F.col(key_col).isNotNull())
    bloom = F.broadcast(build_bloom(keys, key_col, num_bits, n_hashes))
    pruned = (
        probe.join(bloom)  # 1-row broadcast: attaches bloom_words to every row
        .filter(
            bloom_might_contain(
                F.col(probe_col), F.col("bloom_words"), num_bits, n_hashes
            )
        )
        .drop("bloom_words")
    )
    if not confirm:
        return pruned
    # Optimizer barrier: PushDownLeftSemiAntiJoin would hoist the confirm
    # semi-join BELOW the bloom attach (its condition references only probe
    # columns), shuffling the UN-pruned probe — the exact plan this operator
    # exists to avoid. A full-fraction Sample is row-preserving (Bernoulli
    # acceptance x < 1.0 over x in [0,1) keeps every row, fixed seed), costs
    # one RNG draw per surviving row, and is a node the semi-join pushdown
    # does not traverse: the optimized plan keeps the bloom test below the
    # confirm join's Exchange (pinned by test_bloom_plan_prunes_before_
    # shuffle). A lineage break (localCheckpoint) would also work but
    # materializes the pruned stream; the barrier keeps it pipelined.
    # Supported-version note: relies on two Spark behaviors validated on
    # 4.1 and stable across 3.x/4.x — PushDownLeftSemiAntiJoin does not
    # traverse Sample, and the Bernoulli sampler at fraction 1.0 keeps
    # every row (acceptance x < 1.0, x in [0,1)). Both are pinned by
    # test_bloom_plan_prunes_before_shuffle / test_bloom_barrier_row_parity.
    pruned = pruned.sample(False, 1.0, seed=0)
    # Name-based, lineage-independent join resolution: if the caller derives
    # keys_df from the probe DataFrame itself (the natural blocklist pattern),
    # a DataFrame-indexed condition (pruned[probe_col] == keys[key_col]) hits
    # Spark's ambiguous-self-join detection or mis-resolves via plan ids.
    # Renaming the keys side to a unique alias sidesteps lineage entirely
    # (same pattern as stats._null_safe_join).
    # Collision-free alias: a probe that already carries a column with the
    # default alias (nothing stops a caller from round-tripping the output
    # of a prior confirm join) would make the name-based condition
    # ambiguous at analysis — suffix until the name is free.
    confirm_key = "_bloom_confirm_key"
    while confirm_key in pruned.columns:
        confirm_key += "_"
    return pruned.join(
        keys.distinct().withColumnRenamed(key_col, confirm_key),
        on=F.col(probe_col) == F.col(confirm_key),
        how="left_semi",
    )
