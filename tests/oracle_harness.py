"""Local replica of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() in DuckDB over the same parquet tables, then
compare row count, column names, and an order-insensitive canonicalized
value multiset."""

from __future__ import annotations

import datetime as dt
import math
import sys

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


# strict=True replicates the driver's canonicalizer: full-float-precision
# values (any cross-engine ULP difference fails) and a hard TypeError on
# list/dict-typed cells (the driver pandas-sorts result columns and crashes
# on unhashable values — round-1 impute_summary red row).
STRICT = False


def _canon_value(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if STRICT:
            return repr(v)
        return f"{v:.9g}"
    if isinstance(v, bool):
        return str(bool(v))
    if isinstance(v, dt.datetime):
        return v.isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (list, dict, set)):
        raise TypeError(
            f"unhashable type in result: {type(v).__name__} — the driver's "
            "pandas canonicalizer cannot sort/hash this; serialize the column"
        )
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return repr(float(v)) if STRICT else f"{float(v):.9g}"
    except ImportError:
        pass
    return str(v)


def _canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        "|".join(_canon_value(r[i]) for i in order) for r in rows
    )


def compare_query(spark, con, name, fn, sql, sf_dir):
    sdf = fn(spark, sf_dir)
    s_cols = [c.lower() for c in sdf.columns]
    s_rows = [tuple(r) for r in sdf.collect()]
    rel = con.sql(sql)
    d_cols = [c.lower() for c in rel.columns]
    d_rows = rel.fetchall()

    problems = []
    if sorted(s_cols) != sorted(d_cols):
        problems.append(f"columns differ: spark={sorted(s_cols)} duck={sorted(d_cols)}")
    if len(s_rows) != len(d_rows):
        problems.append(f"row count differs: spark={len(s_rows)} duck={len(d_rows)}")
    if not problems:
        try:
            cs = _canon_rows(s_cols, s_rows)
            cd = _canon_rows(d_cols, d_rows)
        except TypeError as e:
            return [f"unhashable output: {e}"]
        if cs != cd:
            diffs = [
                (a, b) for a, b in zip(cs, cd) if a != b
            ][:3]
            only_s = [r for r in cs if r not in set(cd)][:3]
            only_d = [r for r in cd if r not in set(cs)][:3]
            problems.append(
                f"values differ; first pair diffs={diffs} only_spark={only_s} only_duck={only_d}"
            )
    return problems


def run_all(sf_dir: str, only: list[str] | None = None, plain: bool = False):
    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entrymod

    if plain:
        # driver parity: a bare SparkSession with NO get_spark() confs —
        # catches contract code that silently relies on session-factory
        # settings (the driver builds its own session)
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[8]")
            .config("spark.sql.session.timeZone", "UTC")
            .getOrCreate()
        )
    else:
        from etdtransform_spark.session import get_spark

        spark = get_spark(
            "oracle-harness", master="local[8]", shuffle_partitions=8
        )
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    sqls = entrymod.oracle_sql()
    failures = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sql = sqls.get(name)
        if sql is None:
            print(f"SKIP (no oracle): {name}")
            continue
        try:
            problems = compare_query(spark, con, name, fn, sql, sf_dir)
        except Exception as e:  # noqa: BLE001
            problems = [f"EXCEPTION: {type(e).__name__}: {str(e)[:500]}"]
        status = "OK" if not problems else "FAIL"
        print(f"{status}: {name}")
        for p in problems:
            print(f"    {p}")
        if problems:
            failures[name] = problems
    print(f"\n{len(qs) - len(failures)}/{len(qs)} queries match")
    return failures


if __name__ == "__main__":
    flags = {a for a in sys.argv[1:] if a.startswith("--")}
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    STRICT = "--strict" in flags
    sf = args[0] if len(args) > 0 else "/root/testdata/sf0.001"
    only = args[1].split(",") if len(args) > 1 else None
    failures = run_all(sf, only, plain="--plain" in flags)
    sys.exit(1 if failures else 0)
