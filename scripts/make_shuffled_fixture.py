"""Row-shuffled copy of a testdata scale factor → /tmp/sf_shuffled.

The driver regenerates its parquet fixtures per round; nothing guarantees
row order. A query that matches its oracle only because BOTH engines read
the same physical layout (hidden tie-break order, accumulation order that
happens to agree) is a latent driver red. This fixture deterministically
reorders every table (md5 of a row counter), and the full strict harness
must still match:

    python scripts/make_shuffled_fixture.py [sf_dir]
    python tests/oracle_harness.py /tmp/sf_shuffled --strict

Round-3 result: 194/194 on the shuffled copy of sf0.01.
"""

from __future__ import annotations

import os
import sys

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main(sf_dir: str = "/root/testdata/sf0.01",
         out_dir: str = "/tmp/sf_shuffled") -> None:
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"""
            COPY (SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')
                  ORDER BY md5(CAST(ROW_NUMBER() OVER () AS VARCHAR) || '{t}'))
            TO '{out_dir}/{t}.parquet' (FORMAT PARQUET)
            """
        )
    print(f"shuffled fixture written to {out_dir}")


if __name__ == "__main__":
    main(*sys.argv[1:])
