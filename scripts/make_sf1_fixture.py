"""Synthesize an sf1.0 fixture (10x sf0.1) for scale-stress measurement.

The driver testdata stops at sf0.1; the 100 TB design claims are argued
from plan shapes (PLANS.md). This script manufactures a 10x corpus so
the scaling EXPONENT of the heaviest contracts can be measured
empirically (VERDICT r7 next-round #1).

Method: 10 deterministic replicas of every sf0.1 table with
referential-integrity-preserving key offsets (replica k shifts each
primary/foreign key by k * (max_key + 1) of its parent domain), so each
replica is an internally-consistent copy and joins scale linearly.
Content columns are per-replica DISJOINT where operators are
content-sensitive, preserving the sf0.1 data character instead of
fabricating cross-replica structure:

- documents.text: every word gets a per-replica suffix (replica 3's
  vocabulary is disjoint from replica 7's), so dup/shingle/cluster
  structure is sf0.1's replicated 10x — linear, like a corpus that
  actually grew; n_chars recomputed.
- embeddings.embedding: components rolled by k positions (norm- and
  geometry-preserving within a replica; rolls of near-uniform vectors
  are mutually far, so ANN list structure replicates rather than
  collapsing onto the originals).
- events: ids offset; timestamps kept (a 10x-denser stream over the
  same span, which is how real traffic scales).
- dimension tables region/nation are NOT scaled (TPC-H semantics).

Output: /tmp/sf1/<table>.parquet (~6M lineitem rows, 1M events, 50k
documents, 20k embeddings). Deterministic — no RNG anywhere.

Usage: python scripts/make_sf1_fixture.py [src_dir] [out_dir] [replicas]
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
R = int(sys.argv[3]) if len(sys.argv) > 3 else 10

# per-replica word/name suffixes: '' for replica 0 (originals preserved)
SUF = [""] + [f"q{chr(97 + i)}" for i in range(1, R)]


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count() or 8}")
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SRC}/{t}.parquet')"
        )
    # key-domain sizes (offset base = max+1 so replicas never collide)
    off = {
        k: con.execute(f"SELECT max({c}) + 1 FROM {t}").fetchone()[0]
        for k, (t, c) in {
            "cust": ("customer", "c_custkey"),
            "supp": ("supplier", "s_suppkey"),
            "part": ("part", "p_partkey"),
            "ord": ("orders", "o_orderkey"),
            "ev": ("events", "event_id"),
            "user": ("events", "user_id"),
            "doc": ("documents", "doc_id"),
            "vec": ("embeddings", "vec_id"),
        }.items()
    }
    con.execute("CREATE TABLE reps (k BIGINT, suf VARCHAR)")
    con.executemany(
        "INSERT INTO reps VALUES (?, ?)", [(i, SUF[i]) for i in range(R)]
    )

    def write(name: str, sql: str) -> None:
        con.execute(
            f"COPY ({sql}) TO '{OUT}/{name}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{OUT}/{name}.parquet')"
        ).fetchone()[0]
        print(f"{name}: {n} rows")

    write("region", "SELECT * FROM region")
    write("nation", "SELECT * FROM nation")
    write("customer", f"""
        SELECT c_custkey + k * {off['cust']} AS c_custkey,
               c_name || suf AS c_name, c_nationkey, c_acctbal, c_mktsegment
        FROM customer CROSS JOIN reps""")
    write("supplier", f"""
        SELECT s_suppkey + k * {off['supp']} AS s_suppkey,
               s_name || suf AS s_name, s_nationkey, s_acctbal
        FROM supplier CROSS JOIN reps""")
    write("part", f"""
        SELECT p_partkey + k * {off['part']} AS p_partkey,
               p_name || suf AS p_name, p_brand, p_type, p_size,
               p_retailprice
        FROM part CROSS JOIN reps""")
    write("orders", f"""
        SELECT o_orderkey + k * {off['ord']} AS o_orderkey,
               o_custkey + k * {off['cust']} AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM orders CROSS JOIN reps""")
    write("lineitem", f"""
        SELECT l_orderkey + k * {off['ord']} AS l_orderkey,
               l_partkey + k * {off['part']} AS l_partkey,
               l_suppkey + k * {off['supp']} AS l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount,
               l_tax, l_returnflag, l_linestatus, l_shipdate
        FROM lineitem CROSS JOIN reps""")
    write("events", f"""
        SELECT event_id + k * {off['ev']} AS event_id, ts,
               user_id + k * {off['user']} AS user_id,
               event_type, value, props
        FROM events CROSS JOIN reps""")
    write("documents", f"""
        SELECT doc_id + k * {off['doc']} AS doc_id,
               CASE WHEN suf = '' THEN text
                    ELSE array_to_string(
                        list_transform(string_split(text, ' '),
                                       w -> w || suf), ' ')
               END AS text,
               lang, source,
               length(CASE WHEN suf = '' THEN text
                    ELSE array_to_string(
                        list_transform(string_split(text, ' '),
                                       w -> w || suf), ' ')
               END)::BIGINT AS n_chars
        FROM documents CROSS JOIN reps""")
    write("embeddings", f"""
        SELECT vec_id + k * {off['vec']} AS vec_id,
               CASE WHEN k = 0 THEN embedding
                    ELSE list_concat(
                        embedding[(k % len(embedding)) + 1:],
                        embedding[1:(k % len(embedding))])
               END::FLOAT[] AS embedding,
               label
        FROM embeddings CROSS JOIN reps""")


if __name__ == "__main__":
    main()
