"""Planted-fixture semantics for the late-r5 MinHash operators. Oracle
parity proves Spark and DuckDB agree; these tests prove the AGREED answer
is the right one on a corpus where the truth is known by construction —
an exact clone must lose to its lower-id original, uniques must survive,
and an identical pair must show estimate = exact = 1.0 with zero error.
"""

from __future__ import annotations

import pytest

from sabd_deduplicator_spark.operators.similarity import minhash_estimate_accuracy
from sabd_deduplicator_spark.streaming.registered import streaming_neardup_dedup


@pytest.fixture(scope="module")
def planted_dir(spark, tmp_path_factory):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog", "en", "web", 43),
        (1, "the quick brown fox jumps over the lazy dog", "en", "web", 43),  # clone of 0
        (2, "pack my box with five dozen liquor jugs", "en", "web", 39),
        (3, "sphinx of black quartz judge my vow", "en", "web", 35),
        (4, "pack my box with five dozen liquor jugs", "en", "book", 39),  # clone of 2
    ]
    out = str(tmp_path_factory.mktemp("planted"))
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).coalesce(1).write.parquet(f"{out}/documents.parquet")
    return out


def test_streaming_neardup_drops_clones_keeps_uniques(spark, planted_dir):
    kept = {r.doc_id for r in streaming_neardup_dedup(spark, planted_dir).collect()}
    # identical text -> identical signature -> same buckets -> min id wins
    assert 0 in kept and 1 not in kept
    assert 2 in kept and 4 not in kept
    assert 3 in kept  # unique survives


def test_accuracy_report_on_identical_pair(spark, planted_dir):
    rows = {
        (r.doc_a, r.doc_b): r for r in minhash_estimate_accuracy(spark, planted_dir).collect()
    }
    for pair in [(0, 1), (2, 4)]:
        assert pair in rows, f"clone pair {pair} must be a band candidate"
        r = rows[pair]
        assert r.est_jaccard == 1.0 and r.jaccard == 1.0 and r.abs_err == 0.0
    # distinct pangrams share no bigrams: any cross pair that surfaced must
    # carry low exact jaccard, and the report must say so
    for (a, b), r in rows.items():
        if (a, b) not in [(0, 1), (2, 4)]:
            assert r.jaccard < 0.5
