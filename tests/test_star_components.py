"""Large-star/small-star connected components (Kiveris et al. SoCC'14):
equivalence with min-label propagation on real and random graphs, and the
O(log n)-round convergence that is the entire reason the variant exists —
a 10k-node path graph converges in ~log2(n) rounds where propagation
moves the min label ONE hop per round and would need 10k.
"""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from sabd_deduplicator_spark.operators import dedup_clusters as dc


def _sym(spark, pairs):
    df = spark.createDataFrame(pairs, "u long, v long")
    return df.union(df.select(F.col("v").alias("u"), F.col("u").alias("v")))


def _labels(df):
    return {r["u"]: r["component_id"] for r in df.collect()}


def test_star_matches_propagation_on_random_graphs(spark):
    rng = random.Random(42)
    for trial in range(3):
        n = 60 + trial * 30
        pairs = [
            (rng.randrange(n), rng.randrange(n))
            for _ in range(n)
        ]
        pairs = [(a, b) for a, b in pairs if a != b]
        edges = _sym(spark, pairs)
        a = _labels(dc.connected_components(edges))
        b = _labels(dc.connected_components_star(edges))
        assert a == b, f"trial {trial}: star != propagation"


def test_star_matches_propagation_on_neardup_graph(spark, sf_dir):
    """On the real near-dup pair graph the two algorithms must agree —
    which also keeps the registered neardup_components oracle meaningful
    for either strategy."""
    from sabd_deduplicator_spark.operators.similarity import (
        ngram_jaccard_pairs,
    )

    pairs = ngram_jaccard_pairs(spark, sf_dir).select("doc_a", "doc_b")
    edges = pairs.select(
        F.col("doc_a").alias("u"), F.col("doc_b").alias("v")
    ).union(
        pairs.select(F.col("doc_b").alias("u"), F.col("doc_a").alias("v"))
    )
    assert _labels(dc.connected_components(edges)) == _labels(
        dc.connected_components_star(edges)
    )


@pytest.mark.slow
def test_star_converges_logarithmically_on_path_graph(spark):
    """The adversarial case from the module's scale notes: a 10k-node path.
    Propagation needs diameter rounds (10k); the alternating star rewrite
    must label every node 0 within a small multiple of log2(n) rounds."""
    n = 10_000
    pairs = [(i, i + 1) for i in range(n - 1)]
    edges = _sym(spark, pairs)
    labels = _labels(dc.connected_components_star(edges, max_rounds=50))
    assert len(labels) == n
    assert set(labels.values()) == {0}, "path graph must collapse to root 0"
    bound = 3 * int(math.log2(n)) + 2
    assert dc.last_star_rounds <= bound, (
        f"{dc.last_star_rounds} rounds on a {n}-node path; "
        f"O(log n) bound is ~{bound}"
    )


def test_star_empty_and_singleton_edges(spark):
    empty = spark.createDataFrame([], "u long, v long")
    assert dc.connected_components_star(empty).count() == 0
    one = _sym(spark, [(7, 3)])
    assert _labels(dc.connected_components_star(one)) == {7: 3, 3: 3}
