"""TIMESTAMP(NANOS) parquet robustness (round-1 driver red rows).

The driver may regenerate the testdata with nanosecond parquet timestamps.
These tests write a NANOS-encoded events file (including sub-microsecond
jitter that a micros file cannot represent) and assert that

1. ``read_table``'s repair (`ts div 1000`, sources/parquet.py) is value-
   identical to DuckDB's ``::TIMESTAMP`` cast (which truncates, verified:
   '...000000999'::TIMESTAMP -> '...000000'), for min/max/lag/epoch shapes;
2. the three formerly-red contract queries (impute_linear_fill, sessionize,
   impute_summary) match their DuckDB oracles bit-exactly on the NANOS
   encoding under the driver's full-precision canonicalization.
"""

from __future__ import annotations

import os
import shutil

import sys

import duckdb
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from etdtransform_spark.sources.parquet import read_table

sys.path.insert(0, os.path.dirname(__file__))
import oracle_harness as oh  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def nanos_sf_dir(tmp_path_factory):
    """A copy of sf0.001 whose events.ts is TIMESTAMP(NANOS) with +ns jitter
    (deterministic: event_id % 1000 nanoseconds, sub-microsecond so the
    micros truncation is exercised, and never reordering rows)."""
    out = tmp_path_factory.mktemp("nanos_sf")
    for name in os.listdir(SF_DIR):
        if name != "events.parquet":
            shutil.copy(f"{SF_DIR}/{name}", out / name)
    t = pq.read_table(f"{SF_DIR}/events.parquet")
    idx = t.schema.get_field_index("ts")
    ts_ns = t.column("ts").cast(pa.timestamp("ns"))
    ns_int = ts_ns.cast(pa.int64())
    jitter = pc.subtract(
        t.column("event_id"),
        pc.multiply(pc.divide(t.column("event_id"), 1000), 1000),
    )
    ts_jittered = pc.add(ns_int, jitter.cast(pa.int64())).cast(
        pa.timestamp("ns")
    )
    t = t.set_column(idx, pa.field("ts", pa.timestamp("ns")), ts_jittered)
    pq.write_table(t, out / "events.parquet", store_schema=False)
    # confirm the file really is NANOS on disk
    assert pq.ParquetFile(out / "events.parquet").schema_arrow.field(
        "ts"
    ).type == pa.timestamp("ns")
    return str(out)


def test_repair_matches_duckdb_cast(spark, nanos_sf_dir):
    ev = read_table(spark, f"{nanos_sf_dir}/events.parquet")
    assert dict(ev.dtypes)["ts"] == "timestamp"
    got = {
        r["event_id"]: r["us"]
        for r in ev.selectExpr(
            "event_id", "unix_micros(cast(ts as timestamp)) AS us"
        ).collect()
    }
    con = duckdb.connect()
    want = dict(
        con.sql(
            f"SELECT event_id, epoch_us(ts::TIMESTAMP) FROM "
            f"'{nanos_sf_dir}/events.parquet'"
        ).fetchall()
    )
    assert got == want


def test_repair_min_max_lag_epoch(spark, nanos_sf_dir):
    """Aggregate/window derivations over the repaired column equal DuckDB's
    over its cast column — the sessionize failure surface."""
    ev = read_table(spark, f"{nanos_sf_dir}/events.parquet")
    ev.createOrReplaceTempView("ev_nanos")
    got = spark.sql(
        """
        SELECT user_id,
               unix_micros(cast(min(ts) as timestamp)) AS mn,
               unix_micros(cast(max(ts) as timestamp)) AS mx,
               count(*) AS n
        FROM ev_nanos GROUP BY user_id
        """
    ).collect()
    got = {r["user_id"]: (r["mn"], r["mx"], r["n"]) for r in got}
    con = duckdb.connect()
    want = {
        u: (mn, mx, n)
        for u, mn, mx, n in con.sql(
            f"""
            SELECT user_id, epoch_us(min(ts)), epoch_us(max(ts)), count(*)
            FROM (SELECT user_id, ts::TIMESTAMP AS ts
                  FROM '{nanos_sf_dir}/events.parquet')
            GROUP BY user_id
            """
        ).fetchall()
    }
    assert got == want


@pytest.mark.parametrize(
    "qname",
    [
        "impute_linear_fill",
        "sessionize",
        "impute_summary",
        # round-3 additions that read/write event timestamps
        "range_join",
        "zorder_roundtrip",
        "salted_agg",
        "hll_intersection",
    ],
)
def test_contract_queries_on_nanos(spark, nanos_sf_dir, qname):
    import __spark_entry__ as entrymod
    con = duckdb.connect()
    for t in oh.TABLES:
        con.sql(f"CREATE VIEW {t} AS FROM '{nanos_sf_dir}/{t}.parquet'")
    old_strict = oh.STRICT
    oh.STRICT = True
    try:
        problems = oh.compare_query(
            spark,
            con,
            qname,
            entrymod.queries()[qname],
            entrymod.oracle_sql()[qname],
            nanos_sf_dir,
        )
    finally:
        oh.STRICT = old_strict
    assert problems == [], problems


def test_strict_harness_rejects_array_outputs(spark):
    """Driver-parity guard: an ArrayType output column must FAIL the strict
    harness (the driver's pandas canonicalizer crashes on lists)."""
    from pyspark.sql import functions as F
    con = duckdb.connect()
    old_strict = oh.STRICT
    oh.STRICT = True
    try:
        problems = oh.compare_query(
            spark,
            con,
            "arr",
            lambda s, d: s.range(1).select(F.array(F.lit(1)).alias("a")),
            "SELECT [1] AS a",
            "unused",
        )
    finally:
        oh.STRICT = old_strict
    assert problems and "unhashable" in problems[0]
