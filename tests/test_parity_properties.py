"""Property-based cross-engine parity tests (hypothesis): every oracle match
in the driver gate rests on two primitives behaving bit-identically in Spark
and DuckDB — the qround rounding sequence and the portable md5-based hash
family. The reference has no property tests at all (SURVEY §5); these guard
the foundations."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from etdtransform_spark.functions.hashing import (
    derived_hashes,
    derived_hashes_sql,
    portable_hash64,
    portable_hash64_sql,
)
from etdtransform_spark.functions.scalars import qround, qround_sql

finite_doubles = st.floats(
    min_value=-1e9, max_value=1e9, allow_nan=False, allow_infinity=False
)


@pytest.fixture(scope="module")
def duck():
    return duckdb.connect()


@settings(max_examples=5, deadline=None)
@given(
    xs=st.lists(finite_doubles, min_size=1, max_size=200),
    digits=st.sampled_from([1, 2, 4, 6, 10]),
)
def test_qround_bit_identical(spark, duck, xs, digits):
    sdf = spark.createDataFrame([(i, x) for i, x in enumerate(xs)], "i long, x double")
    got = {
        r["i"]: r["y"]
        for r in sdf.select("i", qround(F.col("x"), digits).alias("y")).collect()
    }
    duck.execute("CREATE OR REPLACE TABLE t (i BIGINT, x DOUBLE)")
    duck.executemany("INSERT INTO t VALUES (?, ?)", list(enumerate(xs)))
    want = dict(
        duck.sql(f"SELECT i, {qround_sql('x', digits)} AS y FROM t").fetchall()
    )
    # exact equality: same IEEE op sequence must give the same double
    assert got == want


# printable strings incl. unicode, no surrogates
texts = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",), min_codepoint=32),
    min_size=0,
    max_size=80,
)


@settings(max_examples=5, deadline=None)
@given(xs=st.lists(texts, min_size=1, max_size=100, unique=True))
def test_portable_hash_parity(spark, duck, xs):
    sdf = spark.createDataFrame([(i, x) for i, x in enumerate(xs)], "i long, s string")
    got = {
        r["i"]: r["h"]
        for r in sdf.select(
            "i", portable_hash64(F.col("s"), seed="prop").alias("h")
        ).collect()
    }
    duck.execute("CREATE OR REPLACE TABLE ts (i BIGINT, s VARCHAR)")
    duck.executemany("INSERT INTO ts VALUES (?, ?)", list(enumerate(xs)))
    want = dict(
        duck.sql(
            f"SELECT i, {portable_hash64_sql('s', seed='prop')} AS h FROM ts"
        ).fetchall()
    )
    assert got == want


def test_derived_hash_family_parity(spark, duck):
    xs = [f"shingle {i} πλ" for i in range(50)]
    n = 8
    sdf = spark.createDataFrame([(i, x) for i, x in enumerate(xs)], "i long, s string")
    hs = derived_hashes(F.col("s"), n)
    got = {
        r["i"]: [r[f"h{j}"] for j in range(n)]
        for r in sdf.select(
            "i", *[h.alias(f"h{j}") for j, h in enumerate(hs)]
        ).collect()
    }
    duck.execute("CREATE OR REPLACE TABLE td (i BIGINT, s VARCHAR)")
    duck.executemany("INSERT INTO td VALUES (?, ?)", list(enumerate(xs)))
    exprs = ", ".join(
        f"{e} AS h{j}" for j, e in enumerate(derived_hashes_sql("s", n))
    )
    want = {
        row[0]: list(row[1:])
        for row in duck.sql(f"SELECT i, {exprs} FROM td").fetchall()
    }
    assert got == want


# --- as-of join vs pandas merge_asof -----------------------------------------

_asof_rows = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),     # key
        st.integers(min_value=0, max_value=1000),  # ts (seconds)
    ),
    min_size=1,
    max_size=40,
)


@settings(max_examples=6, deadline=None)
@given(left_rows=_asof_rows, right_rows=_asof_rows,
       direction=st.sampled_from(["backward", "forward"]),
       tolerance=st.sampled_from([None, 50.0, 200.0]))
def test_asof_join_matches_pandas_merge_asof(
    spark, left_rows, right_rows, direction, tolerance
):
    """asof_join must agree with pandas.merge_asof (the de-facto reference
    semantics) for every direction/tolerance combination, including ties on
    the join timestamp and keys absent from one side."""
    import pandas as pd

    from etdtransform_spark.operators.asof import asof_join

    left_pd = pd.DataFrame(
        {
            "lid": range(len(left_rows)),
            "key": [k for k, _ in left_rows],
            "ts": pd.to_datetime([t for _, t in left_rows], unit="s"),
        }
    )
    # unique (key, ts) on the right — both engines require/assume it
    seen, rr = set(), []
    for k, t in right_rows:
        if (k, t) not in seen:
            seen.add((k, t))
            rr.append((k, t))
    right_pd = pd.DataFrame(
        {
            "key": [k for k, _ in rr],
            "ts": pd.to_datetime([t for _, t in rr], unit="s"),
            "price": [float(k * 1000 + t) for k, t in rr],
        }
    )
    want_df = pd.merge_asof(
        left_pd.sort_values("ts", kind="stable"),
        right_pd.sort_values("ts", kind="stable"),
        on="ts",
        by="key",
        direction=direction,
        tolerance=None if tolerance is None else pd.Timedelta(seconds=tolerance),
    )
    want = {
        int(r.lid): (None if pd.isna(r.price) else float(r.price))
        for r in want_df.itertuples()
    }
    out = asof_join(
        spark.createDataFrame(left_pd),
        spark.createDataFrame(right_pd),
        on="ts",
        by=["key"],
        value_cols=["price"],
        direction=direction,
        tolerance_seconds=tolerance,
    )
    got = {int(r.lid): r.asof_price for r in out.collect()}
    assert got == want


@given(
    st.lists(
        st.tuples(
            st.floats(min_value=-100, max_value=100, allow_nan=False),
            st.floats(min_value=0.01, max_value=10, allow_nan=False),
        ),
        min_size=1,
        max_size=30,
    ),
    st.sampled_from([0.25, 0.5, 0.9]),
)
@settings(max_examples=20, deadline=None)
def test_weighted_quantile_matches_reference(spark, vw, q):
    """weighted_quantile ≡ the definitional scan: smallest v whose
    cumulative weight (ties accumulated together) reaches q·total."""
    from etdtransform_spark.operators.stats import weighted_quantile

    df = spark.createDataFrame([("k", v, w) for v, w in vw], ["k", "v", "w"])
    [r] = weighted_quantile(df, "v", "w", ["k"], q=q).collect()

    tot = sum(w for _v, w in vw)
    # cumulative weight at value x = sum of weights of all rows with v <= x
    expect = None
    for v in sorted({v for v, _w in vw}):
        cum = sum(w for vv, w in vw if vv <= v)
        if cum >= q * tot - 1e-9:
            expect = v
            break
    assert r.wq is not None and abs(r.wq - expect) < 1e-6
