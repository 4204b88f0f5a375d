"""Roundtrip + invariant properties of the dedup family over adversarial
synthetic fixtures (FIXTURES.md §A) — the reference's end-to-end backbone
(test/deduplicator_test.exs:115-157) plus the cases it crashes on:

- a payload whose FIRST chunk repeats later → pointer "0000"
  (reference crashes: String.trim_leading → String.to_integer(""),
  /root/reference/lib/deduplicator.ex:197-200 — we must NOT);
- a file with >9999 chunks → needs pointer width > 4
  (reference silently corrupts, binary_utils.ex:42-45 — our width is a
  parameter);
- high-duplication periodic payloads (the text_64_byte_duplicated.txt
  analog) and a short tail chunk (binary_utils.ex:18-20).
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from sabd_deduplicator_spark.operators.chunker import chunk_fixed
from sabd_deduplicator_spark.operators.dedup import build_hash_links
from sabd_deduplicator_spark.operators.encode import decode_tokens, encode_chunks


def make_docs(spark, payloads: list[str]):
    return spark.createDataFrame(
        [(i, p) for i, p in enumerate(payloads)], "doc_id long, text string"
    )


FIXTURES = [
    "abcdefgh" * 40,                  # 64-byte-period duplication analog
    "aaaaaaaa" + "bbbbbbbb" + "aaaaaaaa",  # first chunk repeats → pointer 0000
    "xyz",                             # shorter than one chunk
    "",                                # empty file → zero chunks
    "unique" + "".join(chr(97 + (i * 7) % 26) for i in range(333)),  # short tail
]


def test_roundtrip_fixtures(spark):
    docs = make_docs(spark, FIXTURES)
    chunks = chunk_fixed(docs, size=8)
    tokens = encode_chunks(chunks, file_col="doc_id")
    recovered = decode_tokens(tokens, file_col="doc_id")
    orig = chunks.orderBy("doc_id", "line").collect()
    got = recovered.orderBy("doc_id", "line").collect()
    assert [(r.doc_id, r.line, r.chunk) for r in orig] == [
        (r.doc_id, r.line, r.chunk) for r in got
    ]


def test_pointer_zero_decodes(spark):
    """Pointer '0000' (repeat of the very first chunk) must decode — the
    reference's crash case."""
    docs = make_docs(spark, ["AAAABBBBAAAA"])  # size 4 → chunks AAAA BBBB AAAA
    tokens = encode_chunks(chunk_fixed(docs, size=4), file_col="doc_id")
    toks = {r.line: r.token for r in tokens.collect()}
    assert toks[2] == "10000"  # pointer to line 0, lpad width 4
    rec = decode_tokens(tokens, file_col="doc_id").orderBy("line").collect()
    assert [r.chunk for r in rec] == ["AAAA", "BBBB", "AAAA"]


def test_wide_pointers_past_9999_chunks(spark):
    """>9999 chunks with pointer_width=6: the reference's fixed width-4
    grammar corrupts here; parameterized width must round-trip."""
    parts = [f"{i:05d}" for i in range(10_030)]
    parts += [f"{10_010:05d}", f"{5:05d}"]  # repeats: one pointing past 9999
    n_chunks = len(parts)
    docs = make_docs(spark, ["".join(parts)])
    chunks = chunk_fixed(docs, size=5)
    assert chunks.count() == n_chunks
    tokens = encode_chunks(chunks, file_col="doc_id", pointer_width=6)
    rec = decode_tokens(tokens, file_col="doc_id", pointer_width=6)
    assert rec.count() == n_chunks
    diff = (
        rec.withColumnRenamed("chunk", "rchunk")
        .join(chunks, ["doc_id", "line"])
        .filter(F.col("rchunk") != F.col("chunk"))
    )
    assert diff.count() == 0
    # the late repeat really does point above 9999 ("1" + "010010")
    assert (
        tokens.filter(F.col("token") == "1" + f"{10_010:06d}").count() == 1
    )


def test_hash_links_invariants(spark):
    docs = make_docs(spark, FIXTURES)
    chunks = chunk_fixed(docs, size=8).withColumnRenamed("doc_id", "file_id")
    links = build_hash_links(chunks)
    total_chunks = chunks.count()
    agg = links.agg(
        F.sum("refs_num").alias("refs"),
        F.count("*").alias("n"),
        F.countDistinct("hash").alias("d"),
    ).first()
    assert agg.refs == total_chunks          # refs_num sums to chunk count
    assert agg.n == agg.d                    # hash is unique (PK semantics)
    # first-occurrence is the true minimum (file_id, line) per hash
    hashed = chunks.withColumn("hash", F.md5("chunk"))
    firsts = hashed.groupBy("hash").agg(
        F.min(F.struct("file_id", "line")).alias("s")
    ).select("hash", F.col("s.file_id").alias("ef"), F.col("s.line").alias("el"))
    bad = links.join(firsts, "hash").filter(
        (F.col("file_id") != F.col("ef")) | (F.col("line") != F.col("el"))
    )
    assert bad.count() == 0


@settings(max_examples=10, deadline=None)
@given(
    payloads=st.lists(
        st.text(alphabet="abcXYZ019 ", min_size=0, max_size=200), min_size=1, max_size=8
    ),
    size=st.sampled_from([3, 8, 16]),
)
def test_roundtrip_property(spark_global, payloads, size):
    """Property: encode→decode is the identity on arbitrary text tables."""
    docs = make_docs(spark_global, payloads)
    chunks = chunk_fixed(docs, size=size)
    rec = decode_tokens(encode_chunks(chunks, file_col="doc_id"), file_col="doc_id")
    a = sorted((r.doc_id, r.line, r.chunk) for r in chunks.collect())
    b = sorted((r.doc_id, r.line, r.chunk) for r in rec.collect())
    assert a == b
    # chunker invariants (reference unit tests :25-47)
    stats = (
        chunks.groupBy("doc_id")
        .agg(F.sum(F.length("chunk")).alias("total"), F.count("*").alias("n"))
        .collect()
    )
    for r in stats:
        assert r.total == len(payloads[r.doc_id])
        assert r.n == -(-len(payloads[r.doc_id]) // size)


@pytest.fixture(scope="session")
def spark_global(spark):
    return spark


@settings(max_examples=10, deadline=None)
@given(
    payloads=st.lists(
        st.text(alphabet="abcXYZ019 ", min_size=0, max_size=200), min_size=1, max_size=8
    ),
    size=st.sampled_from([3, 8, 16]),
)
def test_global_roundtrip_property(spark_global, payloads, size):
    """Property: the CROSS-FILE encode→decode is also the identity, and its
    literal count never exceeds the per-file encoder's (global dedup can only
    collapse more)."""
    from sabd_deduplicator_spark.operators.encode import (
        decode_tokens_global,
        encode_chunks_global,
    )

    docs = make_docs(spark_global, payloads)
    chunks = chunk_fixed(docs, size=size)
    tokens_g = encode_chunks_global(chunks)
    rec = decode_tokens_global(tokens_g)
    a = sorted((r.doc_id, r.line, r.chunk) for r in chunks.collect())
    b = sorted((r.doc_id, r.line, r.chunk) for r in rec.collect())
    assert a == b
    lit_g = tokens_g.filter(F.col("token").startswith("0")).count()
    lit_l = (
        encode_chunks(chunks, file_col="doc_id")
        .filter(F.col("token").startswith("0"))
        .count()
    )
    assert lit_g <= lit_l
