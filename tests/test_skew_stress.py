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
