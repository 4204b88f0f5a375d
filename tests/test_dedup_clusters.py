"""connected_components vs a brute-force union-find on random graphs, plus
cluster-pipeline invariants."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from sabd_deduplicator_spark.catalog import table

from sabd_deduplicator_spark.operators.dedup_clusters import (
    connected_components,
    corpus_canonical_docs,
    neardup_components,
)


def _union_find_components(n: int, edges: list[tuple[int, int]]) -> dict[int, int]:
    parent = list(range(n))

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min node id per component, for every node touching an edge
    touched = {x for e in edges for x in e}
    comp_min: dict[int, int] = {}
    for x in touched:
        comp_min.setdefault(find(x), min(y for y in touched if find(y) == find(x)))
    return {x: comp_min[find(x)] for x in touched}


def test_components_match_union_find_random_graphs(spark):
    rng = random.Random(7)
    for trial in range(3):
        n = 60
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(n // 2)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        expected = _union_find_components(n, edges)
        df = spark.createDataFrame(
            [(a, b) for a, b in edges] + [(b, a) for a, b in edges],
            "u long, v long",
        )
        got = {
            r["u"]: r["component_id"]
            for r in connected_components(df).collect()
        }
        assert got == expected, f"trial {trial}"


def test_components_handle_chain(spark):
    """Worst-case diameter: a path graph — propagation must still reach the
    fixpoint (rounds = diameter), labeling every node with node 0."""
    n = 20
    chain = [(i, i + 1) for i in range(n - 1)]
    df = spark.createDataFrame(
        chain + [(b, a) for a, b in chain], "u long, v long"
    )
    got = connected_components(df).collect()
    assert {r["component_id"] for r in got} == {0}
    assert len(got) == n


def test_canonical_pipeline_invariants(spark, sf_dir):
    comp = neardup_components(spark, sf_dir)
    rows = comp.collect()
    # component id is always ≤ the member id (min-label semantics)
    assert all(r["component_id"] <= r["doc_id"] for r in rows)
    canon = corpus_canonical_docs(spark, sf_dir)
    crows = canon.collect()
    # the kept doc belongs to its own cluster and clusters are disjoint
    assert len({r["component_id"] for r in crows}) == len(crows)
    assert all(r["n_members"] >= 1 for r in crows)
    assert all(r["keep_doc_id"] >= r["component_id"] for r in crows)


def test_jl_projection_matches_numpy_reference(spark, sf_dir):
    """Pin the JL sketch against an independent numpy recomputation of the
    implicit md5-sign matrix for a handful of vectors — proves the Spark
    expression computes the projection it claims (the oracle only proves
    Spark and DuckDB agree with each other)."""
    import hashlib

    import numpy as np

    from sabd_deduplicator_spark.operators.similarity import (
        JL_DIMS,
        embedding_jl_projection,
    )

    res = {
        r["vec_id"]: r
        for r in embedding_jl_projection(spark, sf_dir)
        .filter(F.col("vec_id") < 5)
        .toLocalIterator()
    }
    src = {
        r["vec_id"]: r["embedding"]
        for r in table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < 5)
        .toLocalIterator()
    }
    assert set(res) == set(src) and res
    for vec_id, emb in src.items():
        for j in range(JL_DIMS):
            signs = np.array(
                [
                    1.0
                    if hashlib.md5(f"{j}|{i}".encode()).hexdigest()[0] < "8"
                    else -1.0
                    for i in range(len(emb))
                ]
            )
            want = 0.0
            for x, s in zip(emb, signs):  # sequential fold, like the engines
                want += float(x) * s
            assert abs(res[vec_id][f"proj_{j}"] - round(want, 6)) < 1e-6


def test_method_agreement_reconciles_with_method_pair_lists(spark, sf_dir):
    """The matrix must cover the three method pairs in order, each row's
    totals must equal the method queries' own pair counts, shared can never
    exceed either side, and the pair-set Jaccard must re-derive from the
    three counts."""
    from sabd_deduplicator_spark.operators.dedup_clusters import (
        neardup_method_agreement,
    )
    from sabd_deduplicator_spark.operators.similarity import (
        minhash_lsh_neardup,
        ngram_jaccard_pairs,
    )
    from sabd_deduplicator_spark.operators.text import simhash_neardup_pairs

    rows = sorted(
        (r.asDict() for r in neardup_method_agreement(spark, sf_dir).toLocalIterator()),
        key=lambda r: (r["method_a"], r["method_b"]),
    )
    assert [(r["method_a"], r["method_b"]) for r in rows] == [
        ("minhash", "ngram"),
        ("minhash", "simhash"),
        ("ngram", "simhash"),
    ]
    counts = {
        "minhash": minhash_lsh_neardup(spark, sf_dir).count(),
        "ngram": ngram_jaccard_pairs(spark, sf_dir).count(),
        "simhash": simhash_neardup_pairs(spark, sf_dir).count(),
    }
    for r in rows:
        assert r["pairs_a"] == counts[r["method_a"]]
        assert r["pairs_b"] == counts[r["method_b"]]
        assert 0 <= r["shared_pairs"] <= min(r["pairs_a"], r["pairs_b"])
        denom = r["pairs_a"] + r["pairs_b"] - r["shared_pairs"]
        assert abs(r["pair_jaccard"] - round(r["shared_pairs"] / denom, 6)) < 1e-12
    # the two exact-verify >= 0.5 methods must agree on something: the
    # planted clones are near-identical, so both report them
    mh_ng = rows[0]
    assert mh_ng["shared_pairs"] > 0


def test_candidate_cost_reconciles_with_method_outputs(spark, sf_dir):
    """Census sanity: three method rows; dup_pairs equals each method's own
    output count; gen_pairs is an upper bound on DISTINCT candidate pairs
    and therefore on verified pairs; max_bucket and bucket counts are
    internally consistent with gen_pairs."""
    from sabd_deduplicator_spark.operators.dedup_clusters import (
        neardup_candidate_cost,
    )
    from sabd_deduplicator_spark.operators.similarity import (
        minhash_lsh_neardup,
        ngram_jaccard_pairs,
    )
    from sabd_deduplicator_spark.operators.text import simhash_neardup_pairs

    rows = {
        r["method"]: r.asDict()
        for r in neardup_candidate_cost(spark, sf_dir).toLocalIterator()
    }
    assert set(rows) == {"minhash", "ngram", "simhash"}
    counts = {
        "minhash": minhash_lsh_neardup(spark, sf_dir).count(),
        "ngram": ngram_jaccard_pairs(spark, sf_dir).count(),
        "simhash": simhash_neardup_pairs(spark, sf_dir).count(),
    }
    for m, r in rows.items():
        assert r["dup_pairs"] == counts[m]
        assert r["gen_pairs"] >= r["dup_pairs"]
        assert r["n_buckets"] >= 1
        assert r["max_bucket"] >= 2
        # one bucket of size max_bucket alone generates C(max, 2) pairs
        mx = r["max_bucket"]
        assert r["gen_pairs"] >= mx * (mx - 1) // 2
        if r["dup_pairs"] > 0:
            assert abs(
                r["cost_per_dup"] - round(r["gen_pairs"] / r["dup_pairs"], 6)
            ) < 1e-12


def test_cluster_cohesion_reconciles_with_components_and_pairs(spark, sf_dir):
    """Per-cluster node masses must cover every non-singleton component,
    edge masses must sum to the pair-list size, triangles must respect the
    density bound (a clique of n has C(n,3)), and density must re-derive."""
    from sabd_deduplicator_spark.operators.dedup_clusters import (
        neardup_cluster_cohesion,
        neardup_components,
    )
    from sabd_deduplicator_spark.operators.similarity import ngram_jaccard_pairs

    rows = [
        r.asDict() for r in neardup_cluster_cohesion(spark, sf_dir).toLocalIterator()
    ]
    assert rows
    comp_sizes = {
        r["component_id"]: r["n"]
        for r in neardup_components(spark, sf_dir)
        .groupBy("component_id")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= 2)
        .toLocalIterator()
    }
    assert {r["component_id"] for r in rows} == set(comp_sizes)
    n_pairs = ngram_jaccard_pairs(spark, sf_dir).count()
    assert sum(r["n_edges"] for r in rows) == n_pairs
    for r in rows:
        n = r["n_nodes"]
        assert n == comp_sizes[r["component_id"]]
        assert n - 1 <= r["n_edges"] <= n * (n - 1) // 2  # connected .. clique
        assert 0 <= r["n_triangles"] <= n * (n - 1) * (n - 2) // 6
        assert abs(
            r["density"] - round(2 * r["n_edges"] / (n * (n - 1)), 6)
        ) < 1e-12
