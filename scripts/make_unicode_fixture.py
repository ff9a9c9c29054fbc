"""Build a Unicode-adversarial copy of a testdata scale-factor directory.

The driver's documents are ASCII-ish, so the oracle gate never exercises
the places where Spark's Java regex/string semantics could diverge from
DuckDB's RE2/UTF-8 semantics: astral-plane emoji (surrogate pairs in
Java), combining marks, RTL text with directional marks, CJK (no spaces
→ zero word tokens), NBSP/ideographic/zero-width spaces, Turkish dotted
I casing, and multi-byte lengths (Spark length() and DuckDB length() both
count CODEPOINTS — but any byte-length shortcut would break here). This
script appends such documents (plus event props with unicode JSON values)
so the full harness can be pointed at it:

    python scripts/make_unicode_fixture.py [src_sf_dir] [dst_dir]
    python tests/oracle_harness.py /tmp/sf_unicode --strict

Expect the same N/N match as the clean fixture.
"""

from __future__ import annotations

import os
import shutil
import sys

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "embeddings",
]

# (doc_id, text, lang, source)
DOCS = [
    (91001, "café résumé naïve élève", "fr", "web"),
    # combining marks: e + U+0301 (vs precomposed above)
    (91002, "café résumé", "fr", "web"),
    # astral-plane emoji (surrogate pairs in Java, 4-byte UTF-8)
    (91003, "launch day \U0001f680\U0001f389 metrics \U0001f4c8 up", "en", "social"),
    # CJK, no spaces — whitespace tokenizers must yield ONE token
    (91004, "機械学習モデルの評価", "ja", "web"),
    (91005, "大规模语言模型训练数据", "zh", "web"),
    # RTL Arabic + Hebrew with LRM/RLM directional marks
    (91006, "مرحبا ‏بالعالم‎ test", "ar", "web"),
    (91007, "שלום עולם hello", "he", "web"),
    # exotic whitespace: NBSP, ideographic space, zero-width space
    (91008, "alpha beta　gamma​delta", "en", "books"),
    # Turkish dotted/dotless i (classic casing trap)
    (91009, "İstanbul için ISPARTA iı", "tr", "web"),
    # Cyrillic + Greek mix
    (91010, "модель μοντέλο data", "ru", "web"),
    # mathematical alphanumerics + currency + box drawing
    (91011, "\U0001d49c\U0001d49e\U0001d4b6 €£¥ ╔═╗ 5²=25", "en", "math"),
    # duplicated emoji doc (exact-dedup pair with 91003)
    (91012, "launch day \U0001f680\U0001f389 metrics \U0001f4c8 up", "en", "mirror"),
]


def main(src: str, dst: str) -> None:
    os.makedirs(dst, exist_ok=True)
    for t in TABLES:
        shutil.copy(f"{src}/{t}.parquet", f"{dst}/{t}.parquet")
    con = duckdb.connect()
    doc_values = ",\n    ".join(
        "({}, {}, '{}', '{}', length({}))".format(
            d, "'" + t.replace("'", "''") + "'", lang, srcname,
            "'" + t.replace("'", "''") + "'",
        )
        for d, t, lang, srcname in DOCS
    )
    con.sql(
        f"""
COPY (
  SELECT * FROM '{src}/documents.parquet'
  UNION ALL
  SELECT * FROM (VALUES
    {doc_values}
  ) t(doc_id, text, lang, source, n_chars)
) TO '{dst}/documents.parquet' (FORMAT PARQUET)
"""
    )
    # events: unicode JSON props values + unicode-ish event types stay
    # ASCII (the type column drives groupings; keep those stable) but
    # props carry multi-byte strings through the JSON operators
    con.sql(
        f"""
COPY (
  SELECT * FROM '{src}/events.parquet'
  UNION ALL
  SELECT * FROM (VALUES
    (991001, TIMESTAMP '2024-02-01 09:00:00', 11::BIGINT, 'click',
     1.0::DOUBLE, '{{"plan": "proé", "city": "München"}}'),
    (991002, TIMESTAMP '2024-02-01 09:05:00', 11::BIGINT, 'view',
     2.0::DOUBLE, '{{"note": "東京 \U0001f5fc"}}')
  ) t(event_id, ts, user_id, event_type, value, props)
) TO '{dst}/events.parquet' (FORMAT PARQUET)
"""
    )
    n, mx = con.sql(
        f"SELECT count(*), max(doc_id) FROM '{dst}/documents.parquet'"
    ).fetchone()
    print(f"{dst}: {n} documents (12 unicode-adversarial, max id {mx})")


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf_unicode"
    main(src, dst)
