"""Incremental hash_links maintenance: folding batches into the index must
equal rebuilding from all data (the reference's flush loop, set-oriented),
and the salted skew join must equal the plain join."""

from __future__ import annotations

from pyspark.sql import functions as F

from sabd_deduplicator_spark.operators.chunker import chunk_fixed
from sabd_deduplicator_spark.operators.dedup import build_hash_links, merge_hash_links


def _chunks(spark, payloads, id_offset=0):
    docs = spark.createDataFrame(
        [(i + id_offset, p) for i, p in enumerate(payloads)],
        "file_id long, text string",
    )
    return chunk_fixed(docs, id_cols=("file_id",), size=8)


def test_merge_equals_rebuild(spark):
    batch1 = ["abcdefgh" * 10, "hello world chunks here"]
    batch2 = ["abcdefgh" * 5 + "NEWDATA!", "hello world chunks here"]  # overlaps
    c1 = _chunks(spark, batch1, 0)
    c2 = _chunks(spark, batch2, 100)
    links1 = build_hash_links(c1)
    merged = merge_hash_links(links1, c2)
    rebuilt = build_hash_links(c1.unionByName(c2))
    # refs_num identical everywhere
    a = {r.hash: (r.refs_num,) for r in merged.collect()}
    b = {r.hash: (r.refs_num,) for r in rebuilt.collect()}
    assert a == b
    # first-occurrence: old links win for known hashes (reference never
    # relocates), new hashes take the batch-2 minimum == rebuild minimum
    m = {r.hash: (r.file_id, r.line) for r in merged.collect()}
    old = {r.hash: (r.file_id, r.line) for r in links1.collect()}
    rb = {r.hash: (r.file_id, r.line) for r in rebuilt.collect()}
    for h, loc in m.items():
        assert loc == old.get(h, rb[h])


def test_merge_idempotent_on_empty_batch(spark):
    c1 = _chunks(spark, ["some text payload chunks"], 0)
    links = build_hash_links(c1)
    empty = _chunks(spark, [], 1)
    merged = merge_hash_links(links, empty)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, links.collect()))


def test_salted_join_matches_plain(spark):
    from sabd_deduplicator_spark.functions.skew import salted_join_hot_keys

    big = spark.range(0, 20000).select(
        F.when(F.col("id") % 2 == 0, "hot").otherwise(
            F.concat(F.lit("k"), (F.col("id") % 50).cast("string"))
        ).alias("k"),
        F.col("id").alias("v"),
    )
    small = spark.createDataFrame(
        [("hot", 1), ("k1", 2), ("k2", 3)], "k string, w int"
    )
    hot = spark.createDataFrame([("hot",)], "k string")
    plain = big.join(small, "k")
    salted = salted_join_hot_keys(big, small, "k", hot)
    assert salted.count() == plain.count()
    pa = plain.groupBy("k").agg(F.sum("v").alias("sv"), F.sum("w").alias("sw"))
    sa = salted.groupBy("k").agg(F.sum("v").alias("sv"), F.sum("w").alias("sw"))
    assert sorted(map(tuple, pa.collect())) == sorted(map(tuple, sa.collect()))


def test_unmerge_equals_rebuild_with_reassignment(spark):
    """Delete-side twin of test_merge_equals_rebuild: unmerging a tombstone
    batch from the index equals rebuilding over the survivors — on a corpus
    constructed so every branch fires: a hash fully erased (refs → 0), a
    hash whose refcount merely drops, a stored pointer REASSIGNED because
    its owner was erased, and untouched rows."""
    from sabd_deduplicator_spark.operators.dedup import unmerge_hash_links

    payloads = [
        "AAAAAAAABBBBBBBB",  # file 0 (DELETED): owns first occ of A and B
        "BBBBBBBBCCCCCCCC",  # file 1: B must be REASSIGNED here; C untouched
        "DDDDDDDDAAAAAAAA",  # file 2 (DELETED): A fully erased with 0 and 2
        "EEEEEEEE",          # file 3: untouched singleton
    ]
    chunks = _chunks(spark, payloads)
    tomb = F.col("file_id").isin(0, 2)
    existing = build_hash_links(chunks)
    got = unmerge_hash_links(
        existing, chunks.filter(tomb), chunks.filter(~tomb)
    )
    want = build_hash_links(chunks.filter(~tomb))
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )
    rows = {r["hash"]: r for r in got.collect()}
    import hashlib

    h = lambda t: hashlib.md5(t.encode()).hexdigest()  # noqa: E731
    assert h("AAAAAAAA") not in rows          # fully erased
    assert h("DDDDDDDD") not in rows          # erased with file 2
    assert rows[h("BBBBBBBB")]["file_id"] == 1  # reassigned to survivor
    assert rows[h("BBBBBBBB")]["refs_num"] == 1  # decremented
    assert rows[h("EEEEEEEE")]["refs_num"] == 1  # untouched


def test_unmerge_noop_on_empty_tombstone(spark):
    """Deleting nothing returns the index unchanged."""
    from sabd_deduplicator_spark.operators.dedup import unmerge_hash_links

    chunks = _chunks(spark, ["AAAAAAAABBBBBBBB", "BBBBBBBB"])
    existing = build_hash_links(chunks)
    got = unmerge_hash_links(
        existing, chunks.filter("file_id < 0"), chunks
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, existing.collect())
    )
