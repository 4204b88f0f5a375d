"""StructTypes for the dedup data model (SURVEY.md §1.1, FIXTURES.md §A).

Reference DDL: /root/reference/priv/repo/migrations/20221009155643_add_hash_table.exs:5-16
(`files` and `hash_links` tables). Hashes here are lowercase hex strings, not
raw digest bytes (SURVEY.md §1.2): Spark's md5()/sha1()/sha2() and DuckDB's
md5() all produce hex natively.
"""

from __future__ import annotations

from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Reference `files` catalog row (migration:5-9): filename varchar(64),
# bytes = chunk size used for that file, algorithm varchar(8).
# CONVENTION: bytes=0 for variable-size chunkers (chunker='cdc'), where no
# single chunk size exists. In the reference, files.bytes is load-bearing
# (offset arithmetic in find_chunk/read_chunks); here recovery is token-based
# (operators/encode.py), so bytes is metadata only — consumers must not use
# a bytes=0 entry as a chunk size.
FILES = StructType(
    [
        StructField("file_id", LongType(), False),
        StructField("filename", StringType(), False),
        StructField("bytes", IntegerType(), False),
        StructField("algorithm", StringType(), False),
    ]
)

# One row per fixed-size chunk; `line` is the explicit 0-based position —
# Spark has no implicit row order, so the reference's stream position
# (lib/deduplicator.ex:96-98) must be a materialized column.
CHUNKS = StructType(
    [
        StructField("file_id", LongType(), False),
        StructField("line", LongType(), False),
        StructField("chunk", BinaryType(), False),
    ]
)

# Reference `hash_links` index (migration:11-16): hash PK, file/line of first
# occurrence, refs_num = total occurrences. PK-uniqueness becomes a dedup
# invariant (one row per hash out of groupBy) instead of a constraint.
HASH_LINKS = StructType(
    [
        StructField("hash", StringType(), False),
        StructField("file_id", LongType(), False),
        StructField("line", LongType(), False),
        StructField("refs_num", LongType(), False),
    ]
)

# Encoded token stream (grammar /root/reference/lib/deduplicator/binary_utils.ex:4-7):
# '0'||chunk literal for first occurrence, '1'||lpad(first_line, width, '0') pointer.
ENCODED_TOKENS = StructType(
    [
        StructField("file_id", LongType(), False),
        StructField("line", LongType(), False),
        StructField("token", StringType(), False),
    ]
)

# Multimodal blob row (task extension): opaque binary payload + typed metadata.
MEDIA_BLOBS = StructType(
    [
        StructField("blob_id", LongType(), False),
        StructField("media_type", StringType(), False),  # image|audio|video
        StructField("payload", BinaryType(), True),
        StructField("meta_width", IntegerType(), True),
        StructField("meta_height", IntegerType(), True),
        StructField("meta_duration_ms", LongType(), True),
    ]
)
