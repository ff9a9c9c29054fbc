"""Build a 1-row-per-table copy of a testdata scale-factor directory.

The degenerate single-row corpus exercises the edges the empty fixture
can't: 1-member groups (stddev/variance NULL, rank spans of zero,
MAD = 0), self-join/window frames of one, and every divide-by-spread
expression — round 4's sweep caught mad_outliers throwing ANSI
DIVIDE_BY_ZERO where DuckDB's float x/0.0 yields NULL.

    python scripts/make_one_row_fixture.py [src_sf_dir] [dst_dir]
    python tests/oracle_harness.py /tmp/sf_one --strict

Expect the same N/N match as the clean fixture.
"""

from __future__ import annotations

import os
import sys

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main(src: str, dst: str) -> None:
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"COPY (SELECT * FROM '{src}/{t}.parquet' LIMIT 1) "
            f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
        )
    print(f"{dst}: 1 row per table ({len(TABLES)} tables)")


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf_one"
    main(src, dst)
