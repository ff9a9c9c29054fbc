"""JSONL (newline-delimited JSON) source/sink — the lingua franca of LLM
corpus interchange (one document object per line).

Scale rules encoded here:
- ALWAYS pass an explicit schema on read: schema inference is a full extra
  pass over the data (at 100 TB that is a second 100 TB scan before the
  first real one). ``infer_documents_schema`` exists for exploration only.
- compression on write: prefer zstd on a real cluster (~3x smaller than
  gzip at equal speed); this container's Hadoop build lacks the zstd codec
  so the default here is gzip. JSONL inside a file is not block-splittable —
  keep files at partition size via the upstream partition count, not giant
  single files.
- corrupt-line tolerance: production corpora always contain a few broken
  lines; ``PERMISSIVE`` + ``_corrupt_record`` quarantines them instead of
  failing the job (columnNameOfCorruptRecord requires the column in the
  schema).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    quarantine_corrupt: bool = True,
) -> DataFrame:
    """Schema-first JSONL read. With ``quarantine_corrupt`` a
    ``_corrupt_record`` column holds unparseable lines (null for good rows)
    so callers can filter/route them; the scan stays one pass either way.
    Spark caveat: a query referencing ONLY ``_corrupt_record`` must cache the
    DataFrame first (QUERY_ONLY_CORRUPT_RECORD_COLUMN guard)."""
    reader = spark.read
    if quarantine_corrupt:
        schema = T.StructType(
            [*schema.fields, T.StructField("_corrupt_record", T.StringType())]
        )
        reader = reader.option("mode", "PERMISSIVE").option(
            "columnNameOfCorruptRecord", "_corrupt_record"
        )
    return reader.schema(schema).json(path)


def write_jsonl(
    df: DataFrame, path: str, compression: str = "gzip", mode: str = "overwrite"
) -> None:
    df.write.mode(mode).option("compression", compression).json(path)


def infer_documents_schema(spark: SparkSession, path: str, sample_lines: int = 1000):
    """Exploration helper: infer a schema from the FIRST file only (never a
    full-corpus inference pass)."""
    sample = spark.read.text(path).limit(sample_lines)
    return spark.read.json(sample.rdd.map(lambda r: r.value)).schema
