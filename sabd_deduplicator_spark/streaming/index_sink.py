"""The reference's full write path as a stream (SURVEY.md §3.1):

    chunk stream → hash → classify vs index → flush index every batch

re-expressed as Structured Streaming + foreachBatch over the incremental
index fold (operators/dedup.py::merge_hash_links). Each micro-batch plays the
role of the reference's `chunk_amount` flush (/root/reference/lib/
deduplicator.ex:66-82,121-144); the Postgres index table becomes a versioned
parquet snapshot store.

Durability protocol (a poor man's table format — at production scale a real
table format with MERGE, e.g. Delta/Iceberg, replaces all of this with one
transactional operation):

    index_path/
        snapshot-<batch_id>/     complete hash_links parquet per applied batch
        _CURRENT                 tiny pointer file: "<batch_id>\n<snapshot dir>"

- Readers resolve _CURRENT and read only a COMPLETE, immutable snapshot;
  there is never a moment where the live index is missing or half-written.
- _CURRENT is published with an atomic rename (os.replace), so a crash
  between "snapshot written" and "pointer flipped" leaves the previous
  snapshot live and the next attempt simply overwrites the orphan dir.
- foreachBatch is at-least-once: a replayed batch re-arrives with the SAME
  batch_id, and flush() skips any batch_id <= the one recorded in _CURRENT —
  refs_num is never double-counted (idempotent replay).
- Only "no _CURRENT yet" selects the first-batch path; every other failure
  (read error, schema mismatch, merge bug) propagates and fails the query
  instead of silently rebuilding the index from one batch.

Paths are local-filesystem (tests, single-node); the pointer-file rename is
the piece that needs a FileSystem-specific atomic primitive on HDFS/S3.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession

from sabd_deduplicator_spark.operators.dedup import build_hash_links, merge_hash_links

_CURRENT = "_CURRENT"


def _read_pointer(index_path: str) -> tuple[int, str] | None:
    """(applied batch_id, snapshot dir) from _CURRENT, or None if the index
    has never been published."""
    try:
        with open(os.path.join(index_path, _CURRENT), encoding="utf-8") as f:
            batch_line, snap_line = f.read().splitlines()[:2]
    except FileNotFoundError:
        return None
    return int(batch_line), snap_line


def _publish_pointer(index_path: str, batch_id: int, snapshot: str) -> None:
    tmp = os.path.join(index_path, f"{_CURRENT}.tmp")
    with open(tmp, "w", encoding="utf-8") as f:
        f.write(f"{batch_id}\n{snapshot}\n")
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, os.path.join(index_path, _CURRENT))


def read_hash_links_index(spark: SparkSession, index_path: str) -> DataFrame:
    """Read the live snapshot of a streamed hash_links index."""
    pointer = _read_pointer(index_path)
    if pointer is None:
        raise FileNotFoundError(f"no published index at {index_path}")
    return spark.read.parquet(os.path.join(index_path, pointer[1]))


def _prune_snapshots(index_path: str, keep: set[str]) -> None:
    """Drop snapshot dirs other than `keep` (current + previous are retained
    so in-flight readers of the just-replaced snapshot finish cleanly)."""
    for name in os.listdir(index_path):
        if name.startswith("snapshot-") and name not in keep:
            shutil.rmtree(os.path.join(index_path, name), ignore_errors=True)


def run_streaming_index_build(
    spark: SparkSession,
    chunks_dir: str,
    index_path: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 2,
) -> None:
    """Drain a chunk stream (file_id, line, chunk) into a hash_links index at
    `index_path`, micro-batch by micro-batch, with availableNow semantics."""
    os.makedirs(index_path, exist_ok=True)
    src = (
        spark.readStream.schema("file_id bigint, line bigint, chunk string")
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(chunks_dir)
    )

    def flush(batch_df: DataFrame, batch_id: int) -> None:
        s = batch_df.sparkSession
        pointer = _read_pointer(index_path)
        if pointer is not None and batch_id <= pointer[0]:
            return  # at-least-once replay of an already-applied batch
        if pointer is None:
            merged = build_hash_links(batch_df)
            previous = None
        else:
            existing = s.read.parquet(os.path.join(index_path, pointer[1]))
            merged = merge_hash_links(existing, batch_df)
            previous = pointer[1]
        snapshot = f"snapshot-{batch_id:09d}"
        # Reads the old snapshot dir, writes a NEW one: no overwrite-own-input
        # staging copy needed, and a crash here leaves _CURRENT untouched.
        merged.write.mode("overwrite").parquet(os.path.join(index_path, snapshot))
        _publish_pointer(index_path, batch_id, snapshot)
        keep = {snapshot} if previous is None else {snapshot, previous}
        _prune_snapshots(index_path, keep)

    q = (
        src.writeStream.foreachBatch(flush)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
