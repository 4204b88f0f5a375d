"""ANN quality on data WITH structure (round-3 verdict, next-round item 1).

The driver's synthetic embeddings are near-uniform, so the registered
ann_recall_vs_exact numbers are structurally low there and prove nothing
about the operators. This fixture plants 16 well-separated Gaussian clusters
over the same 64-dim float32 schema and demands the approximate paths reach
high recall when structure exists — the regime real embedding corpora live
in (σ=0.05 around unit centroids ⇒ intra-cluster cos ≈ 0.86, inter-cluster
cos ≈ N(0, 1/64)).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

N, K, DIM, SIGMA = 1200, 16, 64, 0.05


@pytest.fixture(scope="module")
def clustered(tmp_path_factory):
    """Deterministic planted-cluster corpus written as {dir}/embeddings.parquet
    (the catalog's table layout), plus numpy ground truth."""
    rng = np.random.default_rng(7)
    cents = rng.normal(size=(K, DIM))
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    labels = np.arange(N) % K
    pts = (cents[labels] + SIGMA * rng.normal(size=(N, DIM))).astype(np.float32)

    d = tmp_path_factory.mktemp("ann_clustered")
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(np.arange(N), type=pa.int64()),
                "embedding": pa.array(
                    pts.tolist(), type=pa.list_(pa.float32())
                ),
                "label": pa.array(labels.astype(np.int32), type=pa.int32()),
            }
        ),
        f"{d}/embeddings.parquet",
    )
    # exact ground truth in numpy, rounded like the operators (1e-6)
    x = pts.astype(np.float64)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    g = np.round(x @ x.T, 6)
    np.fill_diagonal(g, -np.inf)
    return str(d), g


def test_ivf_recall_clustered(spark, clustered):
    """IVF top-10 for the registered probe query (vec_id 0) must recover
    ≥ 0.8 of the exact top-10 when clusters exist (expected ~1.0: the
    trained cells align with the planted clusters and the query's own cell
    is always probed first)."""
    from sabd_deduplicator_spark.operators.similarity import ann_ivf_topk

    d, g = clustered
    exact10 = set(np.argsort(-g[0])[:10].tolist())
    ivf10 = {r["vec_id"] for r in ann_ivf_topk(spark, d).collect()}
    recall = len(exact10 & ivf10) / 10
    assert recall >= 0.8, f"clustered IVF recall@10 = {recall}"


def test_ivf_probe_sweep_monotone_clustered(spark, clustered):
    """More probes ⇒ recall must not drop (nested candidate sets), and one
    probe already suffices on clustered data (the query's home cell holds
    its cluster)."""
    from sabd_deduplicator_spark.catalog import table
    from sabd_deduplicator_spark.operators.similarity import ivf_topk

    d, g = clustered
    exact10 = set(np.argsort(-g[0])[:10].tolist())
    e = table(spark, d, "embeddings").select("vec_id", "embedding")
    recalls = []
    for p in (1, 4):
        got = {r["vec_id"] for r in ivf_topk(spark, e, probes=p, memo_key=d).collect()}
        recalls.append(len(exact10 & got) / 10)
    assert recalls[0] >= 0.8, f"1-probe clustered recall@10 = {recalls[0]}"
    assert recalls[1] >= recalls[0]


def test_ivf_partitioning_invariant(spark, clustered):
    """ivf_topk must return the identical top-10 regardless of input
    partitioning: quantizer training canonicalizes its bounded sample,
    assignment is per-row, and the rank order (cos desc, vec_id) is total."""
    from sabd_deduplicator_spark.catalog import table
    from sabd_deduplicator_spark.operators.similarity import ivf_topk

    d, _ = clustered
    e = table(spark, d, "embeddings").select("vec_id", "embedding")
    a = {tuple(r) for r in ivf_topk(spark, e, probes=4).collect()}
    b = {tuple(r) for r in ivf_topk(spark, e.repartition(7, "vec_id"), probes=4).collect()}
    assert a == b
    assert len(a) == 10


def test_sampled_exact_baseline_matches_full_grid(spark, clustered):
    """exact_top1_for_sample (the O(n·s) recall-grading baseline) must agree
    EXACTLY — neighbor id and rounded cosine, ties included — with the
    all-pairs knn_exact_top1 grid on every sampled vector, and always
    include vec_id 0 (the registered probe convention)."""
    from sabd_deduplicator_spark.catalog import table
    from sabd_deduplicator_spark.operators.similarity import (
        exact_top1_for_sample,
        knn_exact_top1,
    )

    d, _ = clustered
    e = table(spark, d, "embeddings").select("vec_id", "embedding")
    full = {r["vec_a"]: (r["vec_b"], r["cos"]) for r in knn_exact_top1(spark, d).collect()}
    sampled = {
        r["vec_a"]: (r["vec_b"], r["cos"])
        for r in exact_top1_for_sample(spark, e, n_sample=64).collect()
    }
    assert 0 in sampled
    assert len(sampled) == 64
    assert sampled == {k: full[k] for k in sampled}


def test_lsh_multiprobe_recall_clustered(spark, clustered):
    """Multi-probe LSH top-1 over every vector: a hit is an LSH neighbor at
    least as close as the exact nearest neighbor (tie-robust). Clustered
    recall must clear 0.8 — the single-bucket scan loses neighbors exactly
    when one low-margin hyperplane splits a cluster, which the Hamming-1
    probes recover."""
    from sabd_deduplicator_spark.operators.similarity import ann_lsh_topk

    d, g = clustered
    best_cos = g.max(axis=1)  # exact top-1 cosine per vector
    got = {r["vec_a"]: r["cos"] for r in ann_lsh_topk(spark, d).collect()}
    hits = sum(
        1 for v in range(N) if got.get(v, -2.0) >= best_cos[v] - 1e-9
    )
    recall = hits / N
    assert recall >= 0.8, f"clustered multi-probe LSH recall@1 = {recall}"


def test_lsh_probe_sweep_monotone_clustered(spark, clustered):
    """The probe-indexed LSH sweep (r5): recall@1 from `probe <= p` must be
    non-decreasing in p (nested candidate sets) and the widest sweep point
    must match the fixed-probe lsh_top1 it replaced — one scoring pass, no
    behavior drift."""
    from pyspark.sql import functions as F

    from sabd_deduplicator_spark.catalog import table
    from sabd_deduplicator_spark.operators.similarity import (
        LSH_PROBE_SWEEP,
        lsh_planes_for,
        lsh_scored_sweep,
        lsh_top1,
        _unpack_top1,
    )

    d, g = clustered
    best_cos = g.max(axis=1)
    e = table(spark, d, "embeddings").select("vec_id", "embedding")
    n_planes = lsh_planes_for(N)
    sweep = lsh_scored_sweep(
        e, n_planes, max_probes=max(LSH_PROBE_SWEEP)
    ).localCheckpoint()

    def recall_at(p: int) -> float:
        top1 = _unpack_top1(
            sweep.filter(F.col("probe") <= p)
            .groupBy("vec_a")
            .agg(F.max("ord").alias("ord"))
        )
        got = {r["vec_a"]: r["cos"] for r in top1.collect()}
        hits = sum(1 for v in range(N) if got.get(v, -2.0) >= best_cos[v] - 1e-9)
        return hits / N

    recalls = [recall_at(p) for p in LSH_PROBE_SWEEP]
    assert all(b >= a for a, b in zip(recalls, recalls[1:])), recalls
    assert recalls[-1] >= 0.8, recalls

    # widest sweep point ≡ the dedicated fixed-probe search
    via_sweep = {
        (r["vec_a"], r["vec_b"], r["cos"])
        for r in _unpack_top1(
            sweep.filter(F.col("probe") <= 3)
            .groupBy("vec_a")
            .agg(F.max("ord").alias("ord"))
        ).collect()
    }
    direct = {
        (r["vec_a"], r["vec_b"], r["cos"])
        for r in lsh_top1(e, n_planes, probes=3).collect()
    }
    assert via_sweep == direct


def test_jl_rerank_recall_clustered(spark, clustered):
    """The oracle-checked JL prefilter+rerank path must recover ≥ 0.9 of the
    exact top-10 when cluster structure exists (the 16-dim sketch preserves
    the ~0.86-vs-~0 cosine gap easily; on the near-uniform driver corpus the
    same query measures 0.5-0.6 recall@10 at a 1.3% candidate rate — the
    honest structureless number, like the LSH/IVF paths)."""
    from sabd_deduplicator_spark.operators.similarity import ann_jl_rerank_topk

    d, g = clustered
    got = {r["vec_id"] for r in ann_jl_rerank_topk(spark, d).toLocalIterator()}
    want = set(np.argsort(-g[0])[:10].tolist())
    assert len(got & want) / 10 >= 0.9
