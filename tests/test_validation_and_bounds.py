"""Malformed-stream validation (the reference's :not_chunk error path,
set-oriented), unicode chunking semantics, and sketch accuracy bounds."""

from __future__ import annotations

from pyspark.sql import functions as F

import pytest

from sabd_deduplicator_spark.operators.chunker import chunk_fixed
from sabd_deduplicator_spark.operators.encode import (
    decode_tokens,
    encode_chunks,
    required_pointer_width,
    validate_tokens,
)


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


def _chunks_with_late_duplicate(spark, first_line: int):
    """first_line+1 distinct chunks, then one duplicate of the last — the
    pointer must encode `first_line`."""
    base = spark.range(first_line + 1).select(
        F.lit(0).alias("doc_id"),
        F.col("id").alias("line"),
        F.concat(F.lit("c"), F.col("id")).alias("chunk"),
    )
    dup = spark.createDataFrame(
        [(0, first_line + 1, f"c{first_line}")],
        "doc_id long, line long, chunk string",
    )
    return base.unionByName(dup)


def test_pointer_overflow_raises_instead_of_truncating(spark):
    """The advisor-demonstrated corruption: at pointer_width=4 a pointer to
    line 10500 used to lpad-TRUNCATE to '1050' and recover() returned wrong
    bytes silently. Encode must now fail loudly at the default width and
    roundtrip byte-exactly at a sufficient width."""
    chunks = _chunks_with_late_duplicate(spark, first_line=10500)
    with pytest.raises(Exception, match="pointer overflow"):
        encode_chunks(chunks).collect()
    assert required_pointer_width(chunks) == 5
    tokens = encode_chunks(chunks, pointer_width=5)
    got = {
        (r.doc_id, r.line): r.chunk
        for r in decode_tokens(tokens, pointer_width=5).collect()
    }
    want = {(r.doc_id, r.line): r.chunk for r in chunks.collect()}
    assert got == want


def test_deduplicate_auto_sizes_pointer_width(spark):
    from sabd_deduplicator_spark import api

    docs = spark.createDataFrame(
        [(0, "ab" * 12 + "zz")], "doc_id long, text string"
    )
    res = api.deduplicate(spark, docs, chunk_size=2, pointer_width=None)
    assert res.pointer_width == 2  # 13 chunks → max line 12 → width 2
    text = api.reassemble(api.recover(res.tokens, pointer_width=res.pointer_width))
    assert text.first().text == "ab" * 12 + "zz"


def test_global_encode_auto_sizes_file_width(spark):
    """A corpus whose file ids exceed 10^6 must round-trip with
    file_width=None (auto-sized) where the default width raises — the file
    dimension now has the same auto-sizing contract as the line dimension."""
    from sabd_deduplicator_spark.operators.encode import (
        decode_tokens_global,
        encode_chunks_global,
        required_file_width,
        validate_tokens_global,
    )

    rows = [
        (999_999, 0, "uniq-a"),
        (1_000_000, 0, "dup"),      # first occurrence at a 7-digit file id:
        (10_000_001, 0, "uniq-b"),  # pointers to it overflow file_width=6
        (10_000_001, 1, "dup"),
    ]
    chunks = spark.createDataFrame(rows, "doc_id long, line long, chunk string")
    with pytest.raises(Exception, match="global pointer overflow"):
        encode_chunks_global(chunks).collect()  # default file_width=6
    assert required_file_width(chunks) == 8
    tokens = encode_chunks_global(chunks, file_width=None, pointer_width=None)
    # Decode/validate with the SAME None contract: widths are re-inferred
    # from the token stream, symmetric with encode (ADVICE r4).
    got = {
        (r.doc_id, r.line): r.chunk
        for r in decode_tokens_global(
            tokens, file_width=None, pointer_width=None
        ).collect()
    }
    assert got == {(f, l): c for f, l, c in rows}
    assert (
        validate_tokens_global(tokens, file_width=None, pointer_width=None).count()
        == 0
    )
    # ...and a fixed-width decode at the inferred widths agrees.
    fixed = {
        (r.doc_id, r.line): r.chunk
        for r in decode_tokens_global(
            tokens, file_width=8, pointer_width=1
        ).collect()
    }
    assert fixed == got


def test_validate_tokens_global_classifies_cross_file_faults(spark):
    from sabd_deduplicator_spark.operators.encode import validate_tokens_global

    rows = [
        (0, 0, "0GOOD"),                 # literal
        (5, 1, "1" + "000000" + "0000"),  # fine: → file 0 line 0
        (0, 2, "2WAT"),                   # bad marker
        (0, 3, "1" + "00000a" + "0000"),  # unparseable file slice
        (0, 4, "1" + "000000" + "000"),   # wrong total width
        (0, 5, "1" + "000007" + "0000"),  # cross-file dangling: no file 7
        (1, 0, "1" + "000001" + "0001"),  # → (1,1) which is a pointer: dangling
        (1, 1, "1" + "000001" + "0000"),  # → (1,0) which is a pointer: dangling
    ]
    tokens = spark.createDataFrame(rows, "doc_id long, line long, token string")
    got = {
        (r.doc_id, r.line): r.violation
        for r in validate_tokens_global(tokens).collect()
    }
    assert got == {
        (0, 2): "bad_marker",
        (0, 3): "bad_pointer",
        (0, 4): "bad_pointer",
        (0, 5): "dangling_pointer",
        (1, 0): "dangling_pointer",
        (1, 1): "dangling_pointer",
    }


def test_valid_global_stream_has_no_violations(spark):
    from sabd_deduplicator_spark.operators.encode import (
        encode_chunks_global,
        validate_tokens_global,
    )

    docs = spark.createDataFrame(
        [(0, "abcdabcdXYZ"), (1, "abcdhello hello ")], "doc_id long, text string"
    )
    tokens = encode_chunks_global(chunk_fixed(docs, size=4))
    assert validate_tokens_global(tokens).count() == 0


def test_packed_ordinal_out_of_range_raises(spark):
    """build_hash_links packs (file_id, line) into one long; ids past the
    documented bits must raise, not silently link the wrong first
    occurrence."""
    from sabd_deduplicator_spark.operators.dedup import build_hash_links

    ok = spark.createDataFrame(
        [(1, 5, "x"), (2, 5, "x")], "file_id long, line long, chunk string"
    )
    assert build_hash_links(ok).first().file_id == 1
    bad_line = spark.createDataFrame(
        [(1, 1 << 24, "x")], "file_id long, line long, chunk string"
    )
    with pytest.raises(Exception, match="packed ordinal out of range"):
        build_hash_links(bad_line).collect()
    bad_file = spark.createDataFrame(
        [(1 << 38, 0, "x")], "file_id long, line long, chunk string"
    )
    with pytest.raises(Exception, match="packed ordinal out of range"):
        build_hash_links(bad_file).collect()


def test_knn_packed_ordinal_out_of_range_raises(spark):
    """The ANN kernels pack the neighbor id into the low 40 bits of the
    (cos, ¬vec_b) ranking ordinal; a vec_id ≥ 2^40 must raise, not silently
    return a wrong neighbor (ADVICE r4 — the dedup packed ordinal already
    had this contract, the ANN side didn't)."""
    from sabd_deduplicator_spark.operators.similarity import (
        exact_top1_for_sample,
        lsh_top1,
    )

    def v(*lead):  # pad to the corpus DIM (the LSH planes are dim-bound)
        return list(lead) + [0.0] * (64 - len(lead))

    vecs = [(0, v(1.0)), (1, v(0.9, 0.1)), (1 << 40, v(0.0, 1.0))]
    e = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    with pytest.raises(Exception, match="packed-ordinal range"):
        exact_top1_for_sample(spark, e, n_sample=3).collect()
    with pytest.raises(Exception, match="packed-ordinal range"):
        lsh_top1(e, n_planes=1, probes=0).collect()

    ok = spark.createDataFrame(vecs[:2], "vec_id long, embedding array<float>")
    got = {r.vec_a: r.vec_b for r in exact_top1_for_sample(spark, ok, n_sample=2).collect()}
    assert got == {0: 1, 1: 0}


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


def test_winnow_kernel_matches_pure_python_reference():
    """The vectorized numpy Rabin-Karp winnow kernel must agree with a
    straightforward pure-Python evaluation of the same polynomial for
    arbitrary unicode inputs (the parity corpus is ASCII-only, so this is
    the unicode/codepoint coverage: multi-byte chars, astral plane)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from sabd_deduplicator_spark.operators.text import (
        _WINNOW_MASK63,
        _WINNOW_POWS,
        WINNOW_W,
        _winnow_min_hash_kernel,
    )

    def reference(t: str) -> int:
        best = None
        for i in range(len(t) - WINNOW_W + 1):
            h = 0
            for j in range(WINNOW_W):
                h = (h + ord(t[i + j]) * _WINNOW_POWS[j]) % (1 << 64)
            h &= _WINNOW_MASK63
            best = h if best is None or h < best else best
        return best

    # surrogate range is unencodable in UTF-32; hypothesis text() excludes it
    texts = st.text(min_size=WINNOW_W, max_size=80)

    @settings(max_examples=200, deadline=None)
    @given(texts)
    def check(t):
        got = _winnow_min_hash_kernel([t])
        assert int(got.iloc[0]) == reference(t)

    check()


def test_approx_count_distinct_error_bound(spark, sf_dir):
    from sabd_deduplicator_spark.catalog import table

    e = table(spark, sf_dir, "events")
    exact = e.select("user_id").distinct().count()
    approx = e.agg(F.approx_count_distinct("user_id").alias("a")).first().a
    assert abs(approx - exact) / exact <= 0.05  # HLL++ default rsd


def test_ann_recall_vs_exact(spark, sf_dir):
    """Approximate-ANN quality gate over the registered recall REPORT (one
    run measures everything). These synthetic embeddings are near-uniform
    (no cluster structure to exploit), so the floors are regression guards,
    not quality claims — the quality claim lives in test_ann_clustered.py:

    - multi-probe LSH@1 ≥ 0.5 (measures ~0.68; the pre-multi-probe number
      was 0.216, so a broken probe routing trips this immediately);
    - IVF@10 at the default 4 probes ≥ 0.35 (random probing of 4/16 cells
      expects ~0.25; measures ~0.5-0.6);
    - the probe sweep is monotone non-decreasing in probes — candidate
      sets are nested prefixes, so any inversion means the prefix filter
      or the shared scoring pass broke."""
    from sabd_deduplicator_spark import registry
    from sabd_deduplicator_spark.operators.similarity import IVF_PROBES, LSH_PROBES

    registry.load_all_queries()
    rows = registry.QUERIES["ann_recall_vs_exact"](spark, sf_dir).collect()
    by_key = {(r["method"], r["k"], r["probes"]): r["recall"] for r in rows}
    lsh = by_key[("ann_lsh_topk", 1, LSH_PROBES)]
    assert lsh >= 0.5, f"multi-probe LSH recall@1 dropped to {lsh}"
    ivf4 = by_key[("ann_ivf_topk", 10, IVF_PROBES)]
    assert ivf4 >= 0.35, f"IVF recall@10 dropped to {ivf4}"
    sweep = [by_key[("ann_ivf_topk", 10, p)] for p in (1, 2, 4, 8)]
    assert sweep == sorted(sweep), f"probe sweep not monotone: {sweep}"
    from sabd_deduplicator_spark.operators.similarity import JL_CANDIDATES

    jl = by_key[("ann_jl_rerank_topk", 10, JL_CANDIDATES)]
    assert jl >= 0.2, f"JL rerank recall@10 dropped to {jl}"


def test_approx_percentile_accuracy(spark, sf_dir):
    """percentile_approx (the 100 TB path — mergeable sketch, map-side
    combine) must land within the exact quantile's neighborhood: with
    accuracy=10000 the rank error bound is n/10000, far under 1% of n here,
    so the approx median/p90 must fall between the exact p45-p55 / p85-p95."""
    from pyspark.sql import functions as F

    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    row = l.agg(
        F.expr("percentile_approx(l_extendedprice, 0.5, 10000)").alias("ap50"),
        F.expr("percentile_approx(l_extendedprice, 0.9, 10000)").alias("ap90"),
        F.expr("percentile(l_extendedprice, array(0.45, 0.55, 0.85, 0.95))").alias("ex"),
    ).first()
    p45, p55, p85, p95 = row["ex"]
    assert p45 <= row["ap50"] <= p55
    assert p85 <= row["ap90"] <= p95
