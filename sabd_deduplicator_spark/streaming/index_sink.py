"""The reference's full write path as a stream (SURVEY.md §3.1):

    chunk stream → hash → classify vs index → flush index every batch

re-expressed as Structured Streaming + foreachBatch over the incremental
index fold (operators/dedup.py::merge_hash_links). Each micro-batch plays the
role of the reference's `chunk_amount` flush (/root/reference/lib/
deduplicator.ex:66-82,121-144); the Postgres index table becomes a parquet
hash_links snapshot (read-modify-overwrite — at production scale, a table
format with MERGE, e.g. Delta/Iceberg, replaces the overwrite).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from sabd_deduplicator_spark.operators.dedup import build_hash_links, merge_hash_links


def run_streaming_index_build(
    spark: SparkSession,
    chunks_dir: str,
    index_path: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 2,
) -> None:
    """Drain a chunk stream (file_id, line, chunk) into a hash_links index at
    `index_path`, micro-batch by micro-batch, with availableNow semantics."""
    src = (
        spark.readStream.schema("file_id bigint, line bigint, chunk string")
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(chunks_dir)
    )

    def flush(batch_df: DataFrame, batch_id: int) -> None:
        s = batch_df.sparkSession
        try:
            existing = s.read.parquet(index_path)
            merged = merge_hash_links(existing, batch_df)
        except Exception:  # first batch: no index yet
            merged = build_hash_links(batch_df)
        # Parquet can't overwrite its own input mid-read: stage the merge to a
        # scratch path, then rewrite the index from the staged copy. Both
        # writes are distributed; a table format with MERGE (Delta/Iceberg)
        # collapses this to one transactional operation at production scale.
        staging = f"{index_path}__staging"
        merged.write.mode("overwrite").parquet(staging)
        s.read.parquet(staging).write.mode("overwrite").parquet(index_path)

    q = (
        src.writeStream.foreachBatch(flush)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
