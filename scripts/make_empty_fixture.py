"""Build a 0-row copy of a testdata scale-factor directory.

The all-empty corpus sweeps every operator's documented fail-closed
empty-input convention in ONE strict harness run (VERDICT r10 missing
#3): aggregates over nothing must agree between Spark and DuckDB on
n=0-vs-NULL, empty-grid maxima, COUNT(*)=0 rows, and zero-row model
fits — previously these were pinned per-operator in unit tests but
never harness-swept.

    python scripts/make_empty_fixture.py [src_sf_dir] [dst_dir]
    python tests/oracle_harness.py /tmp/sf_empty --strict

Expect the same N/N match as the clean fixture: an operator whose
Spark side returns a 0-row frame while its oracle returns a 1-row
all-NULL frame (or vice versa) is a real convention divergence.

Schema is preserved exactly (LIMIT 0 keeps the parquet schema,
including the events timestamp encoding the footer-sniffing reader
dispatches on).
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
            f"COPY (SELECT * FROM '{src}/{t}.parquet' LIMIT 0) "
            f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
        )
    print(f"{dst}: 0 rows per table ({len(TABLES)} tables)")


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf_empty"
    main(src, dst)
