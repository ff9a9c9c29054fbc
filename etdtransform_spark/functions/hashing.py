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
        return F.abs(F.xxhash64(salted))
    return F.conv(F.substring(F.md5(salted), 1, 15), 16, 10).cast("bigint")


def portable_hash64_sql(expr: str, seed: int | str = 0) -> str:
    """DuckDB SQL fragment computing the same value as :func:`portable_hash64`."""
    return f"('0x' || substr(md5(concat('{seed}|', {expr})), 1, 15))::BIGINT"


def tokens(col: Column | str, pattern: str = r"\s+") -> Column:
    """Whitespace tokenization; empty strings removed (portable to DuckDB via
    ``list_filter(regexp_split_to_array(s, '\\s+'), x -> x <> '')``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(c, pattern), lambda x: x != F.lit(""))


def word_shingles(col: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles as an array<string>.

    Built from :func:`tokens` with a sequence/transform composition (pure
    Catalyst expressions; no UDF). A document shorter than ``n`` tokens yields
    a single shingle of all its tokens, so no document silently drops out of
    dedup.
    """
    toks = word_shingle_source(col)
    n_tok = F.size(toks)
    idx = F.sequence(F.lit(1), F.greatest(n_tok - F.lit(n - 1), F.lit(1)))
    grams = F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(toks, i, n))
    )
    return F.array_distinct(grams)


def word_shingle_source(col: Column | str) -> Column:
    return tokens(col)


def word_shingles_sql(expr: str, n: int = 3) -> str:
    """DuckDB equivalent of :func:`word_shingles`."""
    toks = f"list_filter(regexp_split_to_array({expr}, '\\s+'), x -> x <> '')"
    return (
        f"list_distinct(list_transform("
        f"generate_series(1, greatest(len({toks}) - {n - 1}, 1)), "
        f"i -> array_to_string(list_slice({toks}, i, i + {n - 1}), ' ')))"
    )
