"""The streamed index build (foreachBatch + merge_hash_links) must produce
refcounts identical to the batch build over the same chunks, and
first-occurrence links consistent with earlier-batch-wins semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from sabd_deduplicator_spark.operators.chunker import chunk_fixed
from sabd_deduplicator_spark.operators.dedup import build_hash_links
from sabd_deduplicator_spark.streaming.index_sink import run_streaming_index_build


def test_streaming_index_matches_batch(spark, sf_dir, tmp_path):
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(F.col("doc_id").alias("file_id"), "text")
        .limit(120)
    )
    chunks = chunk_fixed(docs, id_cols=("file_id",), size=16)
    chunks_dir = str(tmp_path / "chunks")
    chunks.repartition(6).write.mode("overwrite").parquet(chunks_dir)

    index_path = str(tmp_path / "index")
    run_streaming_index_build(
        spark, chunks_dir, index_path, str(tmp_path / "ckpt"), max_files_per_trigger=2
    )

    got = spark.read.parquet(index_path)
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
