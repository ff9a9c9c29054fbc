"""Idempotent (effectively exactly-once) parquet sink for foreachBatch.

Structured Streaming's contract with ``foreachBatch`` is at-least-once: after
a crash between the batch function and the checkpoint commit, the SAME
(batchId, data) is replayed. Exactly-once therefore has to come from the
sink: this one records committed batch ids in a transaction log next to the
data and makes replays no-ops, so the parquet family never holds a batch's
rows twice. This is the same idea the file-sink's ``_spark_metadata`` and
table formats (Delta/Iceberg txn logs) implement; spelled out here because
the engine targets plain partitioned parquet.

Mechanics per batch:
1. already committed? -> return (replay after a crash-after-commit)
2. write the batch under ``_batch_staging/<id>`` (overwrite — a crash
   mid-write leaves garbage only in staging, never in the family)
3. atomically rename the staged directory into the family as
   ``batch=<id>`` (directory rename is the atomic primitive)
4. append ``<id>`` to the commit log (one tiny file per batch — object-store
   friendly, no read-modify-write races with a single writer per query)

Readers use :func:`read_committed` which prunes to logged batches, so a
crash between (3) and (4) — data present, commit absent — is invisible and
the replay overwrites the orphan directory idempotently.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def _commit_dir(path: str) -> str:
    return os.path.join(path, "_batch_commits")


def committed_batches(path: str) -> set[int]:
    d = _commit_dir(path)
    if not os.path.isdir(d):
        return set()
    return {int(f) for f in os.listdir(d) if f.isdigit()}


def exactly_once_batch_writer(path: str):
    """Returns the function to pass to ``writeStream.foreachBatch``."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_id in committed_batches(path):
            return
        staging = os.path.join(path, "_batch_staging", str(batch_id))
        final = os.path.join(path, f"batch={batch_id}")
        batch_df.write.mode("overwrite").parquet(staging)
        if os.path.isdir(final):
            # crash between rename and commit on a previous attempt:
            # replace the orphan with this (identical) replay
            import shutil

            shutil.rmtree(final)
        os.replace(staging, final)
        os.makedirs(_commit_dir(path), exist_ok=True)
        with open(os.path.join(_commit_dir(path), str(batch_id)), "w") as fh:
            fh.write("committed")

    return write_batch


def read_committed(spark, path: str) -> DataFrame:
    """Read only batches present in the commit log (orphan data directories
    from a crash between data-rename and commit are excluded)."""
    batches = sorted(committed_batches(path))
    if not batches:
        raise FileNotFoundError(f"no committed batches under {path}")
    paths = [os.path.join(path, f"batch={b}") for b in batches]
    return spark.read.parquet(*paths)
