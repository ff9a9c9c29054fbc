"""Unit tests for operators/urls.py and text.pmi_collocations."""
from __future__ import annotations

import math

import pyspark.sql.functions as F

from etdtransform_spark.operators.text import pmi_collocations
from etdtransform_spark.operators.urls import normalize_url, url_dedup


def _norm(spark, url):
    return (
        spark.createDataFrame([(url,)], "u string")
        .select(normalize_url(F.col("u")).alias("n"))
        .collect()[0]
        .n
    )


def test_normalize_scheme_host_case_and_www(spark):
    assert _norm(spark, "HTTP://WWW.Example.COM/Path") == "http://example.com/Path"


def test_normalize_default_ports(spark):
    assert _norm(spark, "http://a.com:80/x") == "http://a.com/x"
    assert _norm(spark, "https://a.com:443/x") == "https://a.com/x"
    # non-default ports are kept
    assert _norm(spark, "http://a.com:8080/x") == "http://a.com:8080/x"
    # default port for the OTHER scheme is kept
    assert _norm(spark, "http://a.com:443/x") == "http://a.com:443/x"


def test_normalize_fragment_and_trailing_slash(spark):
    assert _norm(spark, "http://a.com/x/#frag") == "http://a.com/x"
    assert _norm(spark, "http://a.com/") == "http://a.com/"
    assert _norm(spark, "http://a.com") == "http://a.com/"


def test_normalize_query_sort_and_tracking(spark):
    got = _norm(spark, "http://a.com/p?z=1&utm_source=feed&a=2&fbclid=xyz&gclid=1&")
    assert got == "http://a.com/p?a=2&z=1"
    # all-tracking query collapses to no query
    assert _norm(spark, "http://a.com/p?utm_medium=x") == "http://a.com/p"


def test_normalize_unparseable_is_null(spark):
    assert _norm(spark, "not a url") is None
    assert _norm(spark, "example.com/path") is None


def test_url_dedup_groups_variants(spark):
    df = spark.createDataFrame(
        [
            ("HTTP://www.A.com:80/x?utm_source=t",),
            ("http://a.com/x",),
            ("http://a.com/x/",),
            ("http://b.com/y",),
            ("garbage",),
            (None,),
            ("a\x01b\x01c\x01d\x01e",),   # sentinel-bearing non-URL: must
            ("http://ho\x01st/p",),        # quarantine, never fabricate
        ],
        "url string",
    )
    got = {r.norm_url: (r.n_rows, r.n_variants, r.first_url)
           for r in url_dedup(df).collect()}
    assert got["http://a.com/x"] == (3, 3, "HTTP://www.A.com:80/x?utm_source=t")
    assert got["http://b.com/y"] == (1, 1, "http://b.com/y")
    assert len(got) == 2  # garbage + NULL + sentinel inputs quarantined


def test_pmi_hand_computed(spark):
    # corpus: "a b" x3, "a c" x1  -> bigrams: (a,b)=3, (a,c)=1, total=4
    # unigrams: a=4, b=3, c=1, total=8
    df = spark.createDataFrame(
        [("a b",), ("a b",), ("a b",), ("a c",)], "text string"
    )
    got = {(r.w1, r.w2): (r.n_pair, r.n_w1, r.n_w2, r.pmi)
           for r in pmi_collocations(df, min_count=1).collect()}
    pmi_ab = math.log((3 / 4) / ((4 / 8) * (3 / 8)))
    pmi_ac = math.log((1 / 4) / ((4 / 8) * (1 / 8)))
    assert got[("a", "b")] == (3, 4, 3, round(pmi_ab, 6))
    assert got[("a", "c")] == (1, 4, 1, round(pmi_ac, 6))


def test_pmi_min_count_and_short_docs(spark):
    df = spark.createDataFrame(
        [("x y",), ("x y",), ("x z",), ("solo",), ("",)], "text string"
    )
    got = pmi_collocations(df, min_count=2).collect()
    assert [(r.w1, r.w2, r.n_pair) for r in got] == [("x", "y", 2)]
