"""The near-dup pair memo (operators/dedup_clusters._PAIRS_MEMO) caches the
EDGE LIST three clustering queries walk (neardup_components,
corpus_canonical_docs, semantic_dedup_corpus). Being a cache of executed
state, it needs regression cover the lazy-plan queries don't: a hit must
return the SAME checkpointed frame (or the memo saves nothing), keys must
not collide across sf_dirs or kinds, and — the correctness half — the
cached rows must equal a fresh derivation.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sabd_deduplicator_spark.operators import dedup_clusters as dc
from sabd_deduplicator_spark.operators.similarity import ngram_jaccard_pairs


def test_memo_hit_returns_same_frame(spark, sf_dir):
    a = dc._memo_pairs(
        spark, "jaccard", sf_dir,
        lambda: ngram_jaccard_pairs(spark, sf_dir).select("doc_a", "doc_b"),
    )
    b = dc._memo_pairs(
        spark, "jaccard", sf_dir,
        lambda: (_ for _ in ()).throw(AssertionError("builder re-ran on a hit")),
    )
    assert a is b


def test_memo_keys_do_not_collide(spark, sf_dir):
    a = dc._memo_pairs(spark, "kind_a", sf_dir, lambda: spark.range(1))
    b = dc._memo_pairs(spark, "kind_b", sf_dir, lambda: spark.range(2))
    c = dc._memo_pairs(spark, "kind_a", sf_dir + "/other", lambda: spark.range(3))
    assert a.count() == 1 and b.count() == 2 and c.count() == 3


def test_memoized_pairs_match_fresh_derivation(spark, sf_dir):
    memo = dc._memo_pairs(
        spark, "jaccard", sf_dir,
        lambda: ngram_jaccard_pairs(spark, sf_dir).select("doc_a", "doc_b"),
    )
    fresh = ngram_jaccard_pairs(spark, sf_dir).select("doc_a", "doc_b")
    assert memo.exceptAll(fresh).count() == 0
    assert fresh.exceptAll(memo).count() == 0
    # the memoized frame is checkpointed: its plan must not re-derive edges
    assert "Scan ExistingRDD" in memo._jdf.queryExecution().executedPlan().toString()


def test_memo_key_includes_application_id(spark, sf_dir):
    app = spark.sparkContext.applicationId
    assert any(k[0] == app for k in dc._PAIRS_MEMO), (
        "memo keys must carry the applicationId so a dead session's frames "
        "cannot leak into a new one"
    )


def test_clustering_queries_share_one_edge_derivation(spark, sf_dir):
    before = dict(dc._PAIRS_MEMO)
    labels = dc.neardup_components(spark, sf_dir)
    again = dc.neardup_components(spark, sf_dir)
    # same memo entries, no new derivations
    assert set(dc._PAIRS_MEMO) >= set(before)
    # key = (app, kind, source staleness token) — the token embeds the
    # documents parquet's path + (mtime, size), so regeneration invalidates
    from sabd_deduplicator_spark.catalog import source_token

    key = (
        spark.sparkContext.applicationId,
        "jaccard",
        source_token(sf_dir, "documents"),
    )
    assert key in dc._PAIRS_MEMO
    # and the two builds agree (memo did not change results between calls)
    assert labels.orderBy("doc_id").collect() == again.orderBy("doc_id").collect()
    assert labels.filter(F.col("component_id").isNull()).count() == 0


def test_source_token_invalidates_on_regeneration(tmp_path, spark):
    """Regenerating the parquet at the SAME path must yield a different
    memo key — the r5 advisory hazard (an in-process empty→non-empty
    rewrite permanently serving the stale empty derivation)."""
    import os
    import time

    from sabd_deduplicator_spark.catalog import source_token

    p = tmp_path / "documents.parquet"
    p.write_bytes(b"v1")
    t1 = source_token(str(tmp_path), "documents")
    # force a different (mtime, size) even on coarse-mtime filesystems
    p.write_bytes(b"v2-longer")
    os.utime(p, (time.time() + 2, time.time() + 2))
    t2 = source_token(str(tmp_path), "documents")
    assert t1 != t2
    assert source_token(str(tmp_path), "embeddings").endswith(":missing")


def test_evict_dead_app_entries_drops_other_apps_only():
    from sabd_deduplicator_spark.catalog import evict_dead_app_entries

    memo = {
        ("app-live", "a", "t1"): 1,
        ("app-dead", "a", "t1"): 2,
        ("app-dead2", "b", "t2"): 3,
        "non-tuple-key": 4,  # untouched: helper only manages app-keyed tuples
    }
    evict_dead_app_entries(memo, "app-live")
    assert set(memo) == {("app-live", "a", "t1"), "non-tuple-key"}
