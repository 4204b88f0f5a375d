"""Skew stress: the reference's 64-byte-period duplicated fixture
(test/resources/text_64_byte_duplicated.txt — one chunk hash with thousands
of occurrences) scaled up: 2M chunks, 95% of which share ONE hash. The
hash_links aggregation must stay correct and fast because map-side partial
aggregation collapses the hot key before the shuffle."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from sabd_deduplicator_spark.operators.dedup import build_hash_links


def test_hash_links_under_pathological_skew(spark):
    n = 2_000_000
    hot_share = 0.95
    # 95% identical chunk, 5% unique chunks, explicit (file, line) order
    chunks = spark.range(n).select(
        (F.col("id") % 50).alias("file_id"),
        (F.col("id") / 50).cast("long").alias("line"),
        F.when(F.col("id") % 20 != 0, F.lit("DUPLICATE_64B_BLOCK"))
        .otherwise(F.concat(F.lit("unique_"), F.col("id").cast("string")))
        .alias("chunk"),
    )
    t0 = time.time()
    links = build_hash_links(chunks)
    agg = links.agg(
        F.sum("refs_num").alias("total"),
        F.count("*").alias("n_hashes"),
        F.max("refs_num").alias("hot"),
    ).first()
    dt = time.time() - t0
    assert agg.total == n
    assert agg.hot == int(n * hot_share)
    assert agg.n_hashes == 1 + n // 20
    # the hot hash's first occurrence is the true (file, line) lexicographic
    # minimum: id=0 (file 0, line 0) is unique, so the smallest duplicate
    # position is file 0 line 1 (id=50, 50 % 20 != 0)
    hot_row = links.orderBy(F.desc("refs_num")).first()
    assert (hot_row.file_id, hot_row.line) == (0, 1)
    # partial agg keeps this fast even with one key holding 95% of rows
    assert dt < 60, f"skewed aggregation took {dt:.1f}s"


def test_global_encode_under_skew(spark):
    """encode_chunks_global joins every chunk to its hash's first occurrence
    — under a 95%-hot hash that join is maximally skewed on one key. AQE
    skew-join splitting must keep it correct and bounded: exactly one
    literal per distinct hash, every other chunk a pointer at the hot
    first-occurrence."""
    import time

    from sabd_deduplicator_spark.operators.encode import encode_chunks_global

    n = 500_000
    chunks = spark.range(n).select(
        (F.col("id") % 50).alias("doc_id"),
        (F.col("id") / 50).cast("long").alias("line"),
        F.when(F.col("id") % 20 != 0, F.lit("DUPLICATE_64B_BLOCK"))
        .otherwise(F.concat(F.lit("unique_"), F.col("id").cast("string")))
        .alias("chunk"),
    )
    t0 = time.time()
    tokens = encode_chunks_global(chunks, pointer_width=6)
    counts = tokens.agg(
        F.count("*").alias("total"),
        F.sum(F.when(F.col("token").startswith("0"), 1).otherwise(0)).alias("lits"),
    ).first()
    dt = time.time() - t0
    n_hashes = 1 + n // 20
    assert counts.total == n
    assert counts.lits == n_hashes  # one literal per distinct hash, global
    # the hot hash's pointer targets its true first occurrence (doc 0 line 1)
    hot_ptr = tokens.filter(F.col("token") == "1" + "000000" + "000001")
    assert hot_ptr.count() == int(n * 0.95) - 1
    assert dt < 90, f"skewed global encode took {dt:.1f}s"


def test_span_dedup_under_hot_span_skew(spark):
    """Corpus with ONE boilerplate span dominating (95% of all spans): the
    agg+join span dedup must stay correct — exactly one global keeper for the
    hot span (the smallest (doc_id, span_idx) ordinal) — and fast, because
    min(packed) collapses the hot span map-side; a row_number window here
    would drag every copy through one task."""
    import time

    from sabd_deduplicator_spark.operators.llm_pipeline import span_survivorship

    n_docs = 20_000
    hot = "a b c d e f g h"  # one 8-token boilerplate span
    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.when(
            F.col("id") % 20 != 0,  # 95% of docs are pure boilerplate ×2
            F.lit(hot + " " + hot),
        )
        .otherwise(
            F.concat(
                F.lit("unique" + "_tok " * 7 + "end"),
                F.lit(" "),
                F.concat(F.lit("tail_"), F.col("id").cast("string")),
            )
        )
        .alias("text"),
    ).withColumn("tokens", F.split("text", " "))
    t0 = time.time()
    surv = span_survivorship(docs, with_text=False)
    total_kept = surv.agg(F.sum("n_kept").alias("k")).first()["k"]
    elapsed = time.time() - t0
    # hot docs contribute 2 spans each, all copies of ONE span; doc 0 is the
    # smallest doc_id and is a unique doc, so the hot span's keeper lives in
    # doc 1 — every other hot doc keeps zero spans
    hot_keepers = surv.filter((F.col("doc_id") == 1)).first()
    assert hot_keepers["n_kept"] == 1  # first copy only (span_idx 0 wins)
    zero_docs = surv.filter(
        (F.col("doc_id") % 20 != 0) & (F.col("doc_id") > 1) & (F.col("n_kept") > 0)
    ).count()
    assert zero_docs == 0
    # distinct spans: the hot span + the (shared) unique-doc head span + one
    # tail span per unique doc
    n_unique_docs = n_docs // 20
    assert total_kept == 2 + n_unique_docs
    assert elapsed < 60, f"hot-span dedup took {elapsed:.1f}s"
