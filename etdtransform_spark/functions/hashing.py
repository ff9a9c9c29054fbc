"""Portable deterministic hashing, shared by dedup / similarity / fingerprint
operators.

The correctness oracle runs in DuckDB, so hash-dependent operators (MinHash,
SimHash, fingerprints) must use a hash both engines compute identically.
``xxhash64``/``hash`` (murmur) differ between engines; ``md5`` is identical
everywhere, and the first 15 hex digits (60 bits) fit a signed int64:

    Spark : CAST(conv(substring(md5(s), 1, 15), 16, 10) AS BIGINT)
    DuckDB: ('0x' || substr(md5(s), 1, 15))::BIGINT

md5 per value is ~10x slower than xxhash64, so every function here takes
``fast=True`` to switch to Spark-native ``xxhash64`` when no cross-engine
oracle is needed (the 100 TB production path).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

HASH_BITS = 60  # 15 hex digits


def portable_hash64(col: Column | str, seed: int | str = 0, fast: bool = False) -> Column:
    """Deterministic 60-bit non-negative hash of a string column.

    ``seed`` namespaces independent hash functions (MinHash permutations).
    """
    c = F.col(col) if isinstance(col, str) else col
    salted = F.concat(F.lit(f"{seed}|"), c)
    if fast:
        # mask to the same 60-bit non-negative range as the md5 path:
        # abs(xxhash64) alone spans 63 bits AND returns Long.MIN_VALUE
        # (negative!) for the one input hashing to it, which would break
        # any `hash % n` bucketing downstream
        return F.xxhash64(salted).bitwiseAND(F.lit((1 << 60) - 1))
    return F.conv(F.substring(F.md5(salted), 1, 15), 16, 10).cast("bigint")


def portable_hash64_sql(expr: str, seed: int | str = 0) -> str:
    """DuckDB SQL fragment computing the same value as :func:`portable_hash64`.

    Concatenation uses ``||`` (NULL-propagating), NOT DuckDB's ``concat``
    (which skips NULL arguments): Spark's concat returns NULL for NULL
    input, so a ``concat``-built oracle would fabricate a real hash for a
    NULL value while the operator returns NULL."""
    return f"('0x' || substr(md5('{seed}|' || ({expr})), 1, 15))::BIGINT"


# Universal-hash family derived from ONE md5 base hash: h_i(x) = (a_i * (base
# % 2^31) + b_i) % (2^61 - 1). One md5 per value instead of one per (value,
# seed) — md5 is the expensive part (~10x a multiply) — and the integer math
# is identical in Spark and DuckDB (operands stay < 2^62, no overflow).
_MERSENNE_61 = (1 << 61) - 1
_BASE_MOD = 1 << 31


def _hash_family(n: int) -> list[tuple[int, int]]:
    import random

    rng = random.Random(0xE7D)
    return [
        (rng.randrange(1, _BASE_MOD) | 1, rng.randrange(0, _MERSENNE_61))
        for _ in range(n)
    ]


def derived_hashes(col: Column | str, n: int, fast: bool = False) -> list[Column]:
    """``n`` independent-ish 61-bit hash columns of a string column, from a
    single base hash (MinHash permutations)."""
    base = portable_hash64(col, seed=0, fast=fast) % F.lit(_BASE_MOD)
    return [
        (F.lit(a) * base + F.lit(b)) % F.lit(_MERSENNE_61)
        for a, b in _hash_family(n)
    ]


def derived_hashes_sql(expr: str, n: int) -> list[str]:
    """DuckDB twins of :func:`derived_hashes`."""
    base = f"({portable_hash64_sql(expr, seed=0)} % {_BASE_MOD})"
    return [
        f"(({a} * {base} + {b}) % {_MERSENNE_61})" for a, b in _hash_family(n)
    ]


def tokens(col: Column | str, pattern: str = r"\s+") -> Column:
    """Whitespace tokenization; empty strings removed (portable to DuckDB via
    ``list_filter(regexp_split_to_array(s, '\\s+'), x -> x <> '')``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(c, pattern), lambda x: x != F.lit(""))


def word_shingles(col: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles as an array<string>.

    Built from :func:`tokens` with a sequence/transform composition (pure
    Catalyst expressions; no UDF). A document shorter than ``n`` tokens yields
    a single shingle of all its tokens, so no document with content silently
    drops out of dedup; NULL and zero-token documents yield a NULL array
    (nothing to dedup — and the cross-engine-portable choice, see the note
    in ``build``).

    The token array is LET-BOUND via a single-element-array transform: a
    Catalyst lambda variable is evaluated once per element, so the split/
    filter tokenization runs once per row. Referencing ``toks`` directly
    inside the per-shingle lambda would inline the whole tokenization
    subtree into every element — O(tokens) re-splits per row, measured 7x
    slower on the bench corpus.
    """
    toks = word_shingle_source(col)

    def build(t: Column) -> Column:
        idx = F.sequence(
            F.lit(1), F.greatest(F.size(t) - F.lit(n - 1), F.lit(1))
        )
        grams = F.array_distinct(
            F.transform(idx, lambda i: F.concat_ws(" ", F.slice(t, i, n)))
        )
        # NULL or zero-token text propagates to a NULL shingle array (the
        # row drops at the explode) instead of fabricating a "" shingle via
        # concat_ws — without this every NULL/empty document would
        # exact-match every other one in the shingle joins, and diverge
        # from the DuckDB oracle, whose array_to_string over a NULL/empty
        # slice yields NULL (list_distinct then drops it)
        return F.when(F.size(t) > 0, grams)

    return F.transform(F.array(toks), build)[0]


def word_shingle_source(col: Column | str) -> Column:
    return tokens(col)


def word_shingle_hashes(col: Column | str, n: int = 3) -> Column:
    """64-bit hashes of the DISTINCT word n-gram shingles, built without
    materializing the shingle strings: each token is xxhash64-ed once per
    row, and a shingle's hash is xxhash64 over its n token hashes (pure
    long arithmetic) — no per-shingle word-array slice, no ~n-word string
    allocation, which is the dominant per-shingle cost of
    ``transform(word_shingles(c, n), xxhash64)`` (measured 6.6 s executor
    CPU for the llm_pipeline_e2e benchmark side alone at sf0.1).

    Equality semantics are identical modulo 64-bit collisions (the class
    already adjudicated for every shingle join): tokens are non-empty and
    whitespace-free, so token sequences map injectively to the
    space-joined strings word_shingles builds, and equality of shingle
    strings == equality of token sequences == equality of these hashes.
    Short documents (< n tokens) produce ONE hash of all their tokens —
    ``F.get`` returns NULL out of bounds and xxhash64 skips NULL inputs,
    so the window truncates exactly like word_shingles' slice. NULL and
    zero-token text yields a NULL array (the row drops at the explode),
    as in word_shingles. Both the token-hash array and the token array
    are let-bound via the single-element-array transform (see
    word_shingles) so each is evaluated once per row, not once per
    shingle reference.

    ONLY for engine-internal shingle keys (joins/grouping): the hash
    values differ from xxhash64(shingle_string), so never use where the
    hash itself is a contract output (minhash signatures are pinned)."""
    toks = word_shingle_source(col)

    def inner(th: Column) -> Column:
        idx = F.sequence(
            F.lit(1), F.greatest(F.size(th) - F.lit(n - 1), F.lit(1))
        )
        grams = F.array_distinct(
            F.transform(
                idx,
                lambda i: F.xxhash64(
                    *[F.get(th, i + F.lit(j - 1)) for j in range(n)]
                ),
            )
        )
        return F.when(F.size(th) > 0, grams)

    def build(t: Column) -> Column:
        return F.transform(
            F.array(F.transform(t, lambda w: F.xxhash64(w))), inner
        )[0]

    return F.transform(F.array(toks), build)[0]


def positional_word_grams(toks: Column, n: int) -> Column:
    """All POSITIONAL word n-grams (duplicates kept, order preserved) over a
    token-array expression, with the array let-bound the same way as
    :func:`word_shingles` (evaluated once per row, not once per gram).
    A row shorter than ``n`` tokens yields one gram of all its tokens."""

    def build(t: Column) -> Column:
        idx = F.sequence(
            F.lit(1), F.greatest(F.size(t) - F.lit(n - 1), F.lit(1))
        )
        # same NULL/empty propagation as word_shingles
        return F.when(
            F.size(t) > 0,
            F.transform(idx, lambda i: F.concat_ws(" ", F.slice(t, i, n))),
        )

    return F.transform(F.array(toks), build)[0]


def positional_word_gram_hashes(toks: Column, n: int) -> Column:
    """xxhash64 keys of all POSITIONAL word n-grams (duplicates kept,
    order preserved) — the string-free counterpart of
    ``transform(positional_word_grams(toks, n), xxhash64)``, built the
    :func:`word_shingle_hashes` way: each token hashed once per row, a
    gram's key = xxhash64 over its n token hashes. Same equality classes
    modulo 64-bit collisions, same short-row (< n tokens: one gram of all
    tokens, via F.get OOB→NULL + xxhash64 null-skip) and NULL/empty
    semantics as positional_word_grams. Engine-internal keys only."""

    def inner(th: Column) -> Column:
        idx = F.sequence(
            F.lit(1), F.greatest(F.size(th) - F.lit(n - 1), F.lit(1))
        )
        return F.when(
            F.size(th) > 0,
            F.transform(
                idx,
                lambda i: F.xxhash64(
                    *[F.get(th, i + F.lit(j - 1)) for j in range(n)]
                ),
            ),
        )

    def build(t: Column) -> Column:
        return F.transform(
            F.array(F.transform(t, lambda w: F.xxhash64(w))), inner
        )[0]

    return F.transform(F.array(toks), build)[0]


def word_shingles_sql(expr: str, n: int = 3) -> str:
    """DuckDB equivalent of :func:`word_shingles`."""
    toks = f"list_filter(regexp_split_to_array({expr}, '\\s+'), x -> x <> '')"
    return (
        f"list_distinct(list_transform("
        f"generate_series(1, greatest(len({toks}) - {n - 1}, 1)), "
        f"i -> array_to_string(list_slice({toks}, i, i + {n - 1}), ' ')))"
    )


_UNIFORM_BUCKETS = 1 << 20


def hash_uniform(col: Column | str, seed: int | str = 0,
                 fast: bool = False) -> Column:
    """Deterministic uniform in (0, 1) from the portable hash:
    (hash % 2^20 + 0.5) / 2^20 — the single definition of the
    hash-to-uniform construction (sampling splits, conformal splits,
    bootstrap bases all share it; keep in lockstep with
    :func:`hash_uniform_sql`)."""
    m = _UNIFORM_BUCKETS
    return (
        portable_hash64(col, seed=seed, fast=fast) % m + F.lit(0.5)
    ) / F.lit(float(m))


def hash_uniform_sql(expr: str, seed: int | str = 0) -> str:
    """DuckDB twin of :func:`hash_uniform` (identical op sequence)."""
    m = _UNIFORM_BUCKETS
    return (
        f"((({portable_hash64_sql(expr, seed=seed)}) % {m} + 0.5)"
        f" / {float(m)!r})"
    )
