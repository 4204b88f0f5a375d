"""Malformed-stream validation (the reference's :not_chunk error path,
set-oriented), unicode chunking semantics, and sketch accuracy bounds."""

from __future__ import annotations

from pyspark.sql import functions as F

from sabd_deduplicator_spark.operators.chunker import chunk_fixed
from sabd_deduplicator_spark.operators.encode import encode_chunks, validate_tokens


def test_valid_stream_has_no_violations(spark):
    docs = spark.createDataFrame(
        [(0, "abcdabcdXYZ"), (1, "hello hello ")], "doc_id long, text string"
    )
    tokens = encode_chunks(chunk_fixed(docs, size=4))
    assert validate_tokens(tokens).count() == 0


def test_corrupted_streams_are_flagged(spark):
    rows = [
        (0, 0, "0GOOD"),        # fine
        (0, 1, "10000"),        # fine: points to line 0
        (0, 2, "2WAT!"),        # bad marker
        (0, 3, "1 X00"),        # bad pointer payload
        (0, 4, "19999"),        # dangling pointer (no literal at 9999)
        (1, 0, "10000"),        # pointer→pointer... no literal in file 1 at 0
    ]
    tokens = spark.createDataFrame(rows, "doc_id long, line long, token string")
    got = {
        (r.doc_id, r.line): r.violation for r in validate_tokens(tokens).collect()
    }
    assert got == {
        (0, 2): "bad_marker",
        (0, 3): "bad_pointer",
        (0, 4): "dangling_pointer",
        (1, 0): "dangling_pointer",
    }


def test_unicode_chunking_counts_chars_not_bytes(spark):
    """The text chunker is CHARACTER-based (documents are strings); the
    byte-exact path for binary data is sources/readers.chunk_binary_content.
    Pin the semantics so nobody 'fixes' one into the other."""
    text = "héllo→wörld☃ok"  # 14 characters, >14 bytes in UTF-8
    docs = spark.createDataFrame([(0, text)], "doc_id long, text string")
    chunks = chunk_fixed(docs, size=4).orderBy("line").collect()
    assert [r.chunk for r in chunks] == ["héll", "o→wö", "rld☃", "ok"]
    # byte-based twin on the same payload
    from sabd_deduplicator_spark.sources.readers import chunk_binary_content

    blobs = spark.createDataFrame(
        [("m", bytearray(text.encode("utf-8")))], "path string, content binary"
    )
    bchunks = chunk_binary_content(blobs, size=4)
    total = bchunks.agg(F.sum(F.length("chunk"))).first()[0]
    assert total == len(text.encode("utf-8"))  # sizes sum to BYTE length


def test_approx_count_distinct_error_bound(spark, sf_dir):
    from sabd_deduplicator_spark.catalog import table

    e = table(spark, sf_dir, "events")
    exact = e.select("user_id").distinct().count()
    approx = e.agg(F.approx_count_distinct("user_id").alias("a")).first().a
    assert abs(approx - exact) / exact <= 0.05  # HLL++ default rsd
