"""Build a null-injected copy of a testdata scale-factor directory.

The driver's documents fixture is null-free, so the oracle gate can never
catch NULL/empty-text divergences between Spark and DuckDB (round-2 found
six: '' shingle fabrication, concat-vs-|| hash fabrication, phantom video
frames, chunk/repetition '' vs NULL, zero-payload features). This script
copies every table and appends NULL/empty/whitespace documents, so the full
harness can be pointed at it:

    python scripts/make_null_fixture.py [src_sf_dir] [dst_dir]
    python tests/oracle_harness.py /tmp/sf_nulls --strict

Expect the same N/N match as the clean fixture. tests/test_null_text_
semantics.py pins the individual semantics; this is the corpus-wide sweep.
"""

from __future__ import annotations

import os
import shutil
import sys

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem",
]


def main(src: str, dst: str) -> None:
    os.makedirs(dst, exist_ok=True)
    for t in TABLES:
        shutil.copy(f"{src}/{t}.parquet", f"{dst}/{t}.parquet")
    con = duckdb.connect()
    con.sql(
        f"""
COPY (
  SELECT * FROM '{src}/documents.parquet'
  UNION ALL
  SELECT * FROM (VALUES
    (90001, NULL, 'en', 'web', NULL),
    (90002, '', 'en', 'web', 0),
    (90003, '   ', NULL, 'books', 3),
    (90004, NULL, NULL, NULL, NULL),
    (90005, 'the quick brown fox', 'en', NULL, 19)
  ) t(doc_id, text, lang, source, n_chars)
) TO '{dst}/documents.parquet' (FORMAT PARQUET)
"""
    )
    # events: NULL ts (quarantined by the _t/_EV ingestion gate), NULL
    # user/type/value groups, and malformed JSON props
    con.sql(
        f"""
COPY (
  SELECT * FROM '{src}/events.parquet'
  UNION ALL
  SELECT * FROM (VALUES
    (990001, NULL::TIMESTAMP, 3::BIGINT, 'click', 1.5::DOUBLE,
     NULL::VARCHAR),
    (990002, TIMESTAMP '2024-01-15 12:00:00', NULL::BIGINT, 'view',
     NULL::DOUBLE, '{{"plan": "pro"}}'),
    (990003, TIMESTAMP '2024-01-16 08:30:00', 5::BIGINT, NULL, 2.0::DOUBLE,
     NULL),
    (990004, NULL::TIMESTAMP, NULL::BIGINT, NULL::VARCHAR, NULL::DOUBLE,
     NULL::VARCHAR),
    (990005, TIMESTAMP '2024-01-17 20:45:00', 7::BIGINT, 'purchase',
     NULL::DOUBLE, 'not-json')
  ) t(event_id, ts, user_id, event_type, value, props)
) TO '{dst}/events.parquet' (FORMAT PARQUET)
"""
    )
    # embeddings: NULL vector, empty vector, NULL element, NULL label —
    # the first three are quarantined by the _t/_EMB ingestion gate
    # (DuckDB's list_inner_product ERRORS on NULL elements)
    dim = con.sql(
        f"SELECT len(embedding) FROM '{src}/embeddings.parquet' LIMIT 1"
    ).fetchone()[0]
    vec = "[" + ",".join("0.5" for _ in range(dim)) + "]::FLOAT[]"
    nullelem = (
        "[" + ",".join("NULL" if i == 0 else "0.25" for i in range(dim))
        + "]::FLOAT[]"
    )
    con.sql(
        f"""
COPY (
  SELECT * FROM '{src}/embeddings.parquet'
  UNION ALL
  SELECT * FROM (VALUES
    (880001, NULL::FLOAT[], 1),
    (880002, []::FLOAT[], NULL),
    (880003, {nullelem}, 2),
    (880004, {vec}, NULL)
  ) t(vec_id, embedding, label)
) TO '{dst}/embeddings.parquet' (FORMAT PARQUET)
"""
    )
    n, nt = con.sql(
        f"SELECT count(*), count(text) FROM '{dst}/documents.parquet'"
    ).fetchone()
    ne, nets = con.sql(
        f"SELECT count(*), count(ts) FROM '{dst}/events.parquet'"
    ).fetchone()
    nv, nvv = con.sql(
        f"SELECT count(*), count(embedding) FROM '{dst}/embeddings.parquet'"
    ).fetchone()
    print(
        f"{dst}: {n} documents ({n - nt} NULL text), "
        f"{ne} events ({ne - nets} NULL ts), "
        f"{nv} embeddings ({nv - nvv} NULL vector)"
    )


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf_nulls"
    main(src, dst)
