"""The streamed index build (foreachBatch + merge_hash_links) must produce
refcounts identical to the batch build over the same chunks, survive
at-least-once batch replay without double counting, and keep a readable
index live across crashes mid-publish."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from sabd_deduplicator_spark.operators.chunker import chunk_fixed
from sabd_deduplicator_spark.operators.dedup import build_hash_links
from sabd_deduplicator_spark.streaming.index_sink import (
    _publish_pointer,
    _read_pointer,
    read_hash_links_index,
    run_streaming_index_build,
)


def _stage_chunks(spark, sf_dir, tmp_path, n_files=6):
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(F.col("doc_id").alias("file_id"), "text")
        .limit(120)
    )
    chunks = chunk_fixed(docs, id_cols=("file_id",), size=16)
    chunks_dir = str(tmp_path / "chunks")
    chunks.repartition(n_files).write.mode("overwrite").parquet(chunks_dir)
    return chunks_dir


def test_streaming_index_matches_batch(spark, sf_dir, tmp_path):
    chunks_dir = _stage_chunks(spark, sf_dir, tmp_path)
    index_path = str(tmp_path / "index")
    run_streaming_index_build(
        spark, chunks_dir, index_path, str(tmp_path / "ckpt"), max_files_per_trigger=2
    )

    got = read_hash_links_index(spark, index_path)
    want = build_hash_links(spark.read.parquet(chunks_dir))
    # refcounts identical
    g = {r.hash: r.refs_num for r in got.collect()}
    w = {r.hash: r.refs_num for r in want.collect()}
    assert g == w
    # links: one row per hash, each pointing at a REAL occurrence of the hash
    assert got.groupBy("hash").count().filter("count > 1").count() == 0
    hashed = spark.read.parquet(chunks_dir).withColumn("hash", F.md5("chunk"))
    occ = hashed.select(
        "hash", F.col("file_id").alias("of"), F.col("line").alias("ol")
    )
    placed = got.join(
        occ,
        (got.hash == occ.hash) & (got.file_id == occ.of) & (got.line == occ.ol),
        "left_semi",
    )
    assert placed.count() == got.count()


def test_crash_replay_is_idempotent(spark, sf_dir, tmp_path):
    """Simulate the at-least-once failure mode: run the drain, then wipe the
    streaming checkpoint (so every batch replays with its original batch_id
    against the ALREADY-APPLIED index) and drain again. A non-idempotent sink
    would double every refs_num; the batch_id guard must make the second
    drain a no-op."""
    chunks_dir = _stage_chunks(spark, sf_dir, tmp_path)
    index_path = str(tmp_path / "index")
    run_streaming_index_build(
        spark, chunks_dir, index_path, str(tmp_path / "ckpt1"), max_files_per_trigger=2
    )
    first = {r.hash: r.refs_num for r in read_hash_links_index(spark, index_path).collect()}
    applied_batch, _ = _read_pointer(index_path)

    # fresh checkpoint == full replay of the same files, batch ids from 0
    run_streaming_index_build(
        spark, chunks_dir, index_path, str(tmp_path / "ckpt2"), max_files_per_trigger=2
    )
    second = {r.hash: r.refs_num for r in read_hash_links_index(spark, index_path).collect()}
    assert second == first  # no double counting
    assert _read_pointer(index_path)[0] == applied_batch


def test_crash_before_pointer_flip_keeps_previous_snapshot_live(spark, sf_dir, tmp_path):
    """An orphan snapshot dir written without a _CURRENT flip (crash window)
    must be invisible to readers and harmlessly overwritten on retry."""
    chunks_dir = _stage_chunks(spark, sf_dir, tmp_path)
    index_path = str(tmp_path / "index")
    run_streaming_index_build(
        spark, chunks_dir, index_path, str(tmp_path / "ckpt"), max_files_per_trigger=2
    )
    live = {r.hash: r.refs_num for r in read_hash_links_index(spark, index_path).collect()}
    batch_id, snap = _read_pointer(index_path)

    # fabricate a crashed half-applied next batch: orphan snapshot, no flip
    orphan = os.path.join(index_path, f"snapshot-{batch_id + 1:09d}")
    spark.range(1).selectExpr(
        "'dead' AS hash", "id AS file_id", "id AS line", "id AS refs_num"
    ).write.parquet(orphan)
    after = {r.hash: r.refs_num for r in read_hash_links_index(spark, index_path).collect()}
    assert after == live  # readers still see the committed snapshot

    # pointer publication itself is atomic-rename; flipping forward works
    _publish_pointer(index_path, batch_id + 1, os.path.basename(orphan))
    assert _read_pointer(index_path) == (batch_id + 1, os.path.basename(orphan))
