"""Engine-portable case folding (functions/scalars.py:fold_case /
fold_case_sql): Java (Spark) applies the FULL Unicode case mapping,
DuckDB's utf8proc the SIMPLE one — they disagree on U+0130 'İ' (Java
expands to i + combining dot) and the contextual final-sigma rule (Java
lowers word-final Σ to ς). The fold convention (İ pre-maps to i, ς
post-folds to σ) must make both engines produce IDENTICAL bytes for all
input; found by the unicode fixture sweep (scripts/make_unicode_fixture)
as value divergence in fingerprint / tfidf_top_terms."""

from __future__ import annotations

import duckdb
import pytest

from etdtransform_spark.functions.scalars import fold_case, fold_case_sql

CASES = [
    "İstanbul için ISPARTA iı",
    "İ",
    "ΛΟΓΟΣ",                      # final-sigma context
    "ΣΟΦΙΑ ΛΟΓΟΣ σοφία λόγος ς",  # mixed + literal final sigma
    "café CAFÉ Straße GROß",
    "launch \U0001f680 ÇĞÖŞÜ çğöşü",
    "МОСКВА Москва ÆØÅ æøå",
    "plain ascii TEXT 123",
    "",
]


def test_fold_case_identical_across_engines(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(c,) for c in CASES], "s string")
    got_spark = [
        r.f for r in df.select(fold_case(F.col("s")).alias("f")).collect()
    ]
    con = duckdb.connect()
    got_duck = [
        con.execute(
            "SELECT " + fold_case_sql("$1::VARCHAR"), [c]
        ).fetchone()[0]
        for c in CASES
    ]
    assert got_spark == got_duck, list(zip(CASES, got_spark, got_duck))


def test_fold_case_diverges_without_convention(spark):
    """Regression sentinel: bare lower() genuinely differs between the
    engines on these inputs — if this ever starts passing, the engines
    converged and fold_case can be simplified."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame([("İ",), ("ΛΟΓΟΣ",)], "s string")
    got_spark = [
        r.f for r in df.select(F.lower(F.col("s")).alias("f")).collect()
    ]
    con = duckdb.connect()
    got_duck = [
        con.execute("SELECT lower($1::VARCHAR)", [c]).fetchone()[0]
        for c in ("İ", "ΛΟΓΟΣ")
    ]
    assert got_spark != got_duck
