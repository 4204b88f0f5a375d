"""Coverage invariants for doc_context_chunks — the properties a chunker
must satisfy for downstream embedding/training use, checked on the real
corpus (sf0.001): every token of every document lands in at least one
window, windows are exactly stride-spaced with the documented overlap,
and reassembling the stride-aligned prefix of each window reproduces the
document exactly (no token lost or duplicated at boundaries).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sabd_deduplicator_spark.operators.llm_pipeline import (
    CHUNK_STRIDE,
    CHUNK_TOKENS,
    doc_context_chunks,
)


def test_every_token_covered_and_stride_spaced(spark, sf_dir):
    chunks = doc_context_chunks(spark, sf_dir).cache()
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("text").isNotNull())
        .select("doc_id", F.size(F.split("text", " ")).alias("n"))
    )
    per_doc = chunks.groupBy("doc_id").agg(
        F.count("*").alias("n_chunks"),
        F.max(F.col("start_token") + F.col("n_chunk_tokens")).alias("covered_to"),
        F.min("start_token").alias("first_start"),
        F.max(
            F.when(
                F.col("chunk_ord") > 0,
                F.col("start_token") - (F.col("chunk_ord") - 1) * CHUNK_STRIDE,
            )
        ).alias("max_step_residual"),
    )
    j = docs.join(per_doc, "doc_id")
    # full coverage: the furthest window edge reaches the last token
    assert j.filter(F.col("covered_to") != F.col("n")).count() == 0
    # first window starts at 0; starts are exactly i*stride
    assert j.filter(F.col("first_start") != 0).count() == 0
    assert (
        j.filter(
            F.col("max_step_residual").isNotNull()
            & (F.col("max_step_residual") != CHUNK_STRIDE)
        ).count()
        == 0
    )
    # chunk sizes: every window is full-width except possibly the last
    bad_width = chunks.join(
        per_doc.select("doc_id", "n_chunks"), "doc_id"
    ).filter(
        (F.col("chunk_ord") < F.col("n_chunks") - 1)
        & (F.col("n_chunk_tokens") != CHUNK_TOKENS)
    )
    assert bad_width.count() == 0


def test_stride_prefixes_reassemble_documents(spark, sf_dir):
    """Concatenating the first STRIDE tokens of each window (all tokens for
    the last window) must rebuild every document byte-for-byte — proves no
    boundary token is lost or doubled despite the overlap."""
    chunks = doc_context_chunks(spark, sf_dir)
    per_doc = chunks.groupBy("doc_id").agg(F.max("chunk_ord").alias("last_ord"))
    prefix = (
        chunks.join(per_doc, "doc_id")
        .withColumn(
            "piece",
            F.when(F.col("chunk_ord") == F.col("last_ord"), F.col("chunk_text"))
            .otherwise(
                F.array_join(
                    F.slice(F.split("chunk_text", " "), 1, CHUNK_STRIDE), " "
                )
            ),
        )
        .groupBy("doc_id")
        .agg(
            F.array_join(
                F.array_sort(
                    F.collect_list(F.struct("chunk_ord", "piece"))
                ).getField("piece"),
                " ",
            ).alias("rebuilt")
        )
    )
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("text").isNotNull())
        .select("doc_id", "text")
    )
    mismatches = docs.join(prefix, "doc_id").filter(
        F.col("rebuilt") != F.col("text")
    )
    assert mismatches.count() == 0
