"""Byte-exact encode→decode roundtrips over the REFERENCE'S OWN fixture
files (/root/reference/test/resources) — the reference's end-to-end backbone
suite (test/deduplicator_test.exs:115-157), including the JPEG case the
reference itself skips.

Binary content rides through the string token grammar as base64 per chunk
(lossless transport; tokens stay strings as in the reference's encoded-file
format). The assertion is the strongest one available: reassembled bytes ==
the file on disk, for text, pdf, and jpeg payloads. The two larger fixtures
also exercise required_pointer_width: their chunk counts exceed the
reference's hardcoded 4-digit pointer, which is exactly the silent-corruption
hazard encode now refuses."""

from __future__ import annotations

import base64
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from sabd_deduplicator_spark.operators.encode import (
    decode_tokens,
    encode_chunks,
    required_pointer_width,
    validate_tokens,
)
from sabd_deduplicator_spark.sources.readers import (
    chunk_binary_content,
    read_binary_files,
)

FIXTURES = Path("/root/reference/test/resources")


@pytest.mark.parametrize(
    "name,chunk_size",
    [
        ("text.txt", 64),
        ("text_64_byte_duplicated.txt", 64),
        ("pdf_example.pdf", 64),
        ("IMG_0036.JPG", 256),  # the e2e case the reference skips
    ],
)
def test_reference_fixture_roundtrip_byte_exact(spark, name, chunk_size):
    files = read_binary_files(spark, str(FIXTURES / name))
    chunks = chunk_binary_content(files, size=chunk_size).select(
        F.col("path").alias("file_id"),
        "line",
        F.base64("chunk").alias("chunk"),
    )
    width = required_pointer_width(chunks)
    tokens = encode_chunks(chunks, file_col="file_id", pointer_width=width)
    assert validate_tokens(tokens, file_col="file_id", pointer_width=width).count() == 0
    decoded = decode_tokens(tokens, file_col="file_id", pointer_width=width)
    rows = decoded.orderBy("line").collect()
    got = b"".join(base64.b64decode(r.chunk) for r in rows)
    assert got == (FIXTURES / name).read_bytes()


def test_duplicated_fixture_actually_deduplicates(spark):
    """text_64_byte_duplicated.txt is the reference's crafted corpus of
    repeated 64-byte blocks: its token stream must contain pointers, and its
    chunk count must exceed the reference's 4-digit pointer range (the case
    the reference corrupts silently and this engine refuses at width 4)."""
    files = read_binary_files(spark, str(FIXTURES / "text_64_byte_duplicated.txt"))
    chunks = chunk_binary_content(files, size=64).select(
        F.col("path").alias("file_id"), "line", F.base64("chunk").alias("chunk")
    )
    assert required_pointer_width(chunks) == 4  # 282738/64 = 4418 chunks
    tokens = encode_chunks(chunks, file_col="file_id", pointer_width=4)
    n_pointers = tokens.filter(F.col("token").startswith("1")).count()
    n_literals = tokens.filter(F.col("token").startswith("0")).count()
    assert n_pointers > 0  # duplicates really collapse into pointers
    assert n_literals < tokens.count()
    # encoded stream is smaller than raw+markers would be (compression bites)
    enc_chars = tokens.agg(F.sum(F.length("token"))).first()[0]
    raw_chars = chunks.agg(F.sum(F.length("chunk"))).first()[0]
    assert enc_chars < raw_chars
