"""Structural invariants of the sketch audits (operators/sketches.py) that
the value oracles cannot state directly: CMS never under-estimates, Bloom
never false-negatives, and both censuses stay sane on hostile inputs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sabd_deduplicator_spark.operators.sketches import (
    BLOOM_K,
    _bit_keys,
    _cms_keyed,
    dedup_bloom_prefilter,
    token_freq_cms_audit,
)


def test_cms_never_underestimates(spark, sf_dir):
    """est >= n for EVERY token, not just in aggregate: each counter in the
    min includes the token's own mass."""
    from sabd_deduplicator_spark.catalog import table

    tok = table(spark, sf_dir, "documents").select(
        F.explode(F.split("text", " ")).alias("token")
    )
    exact = tok.groupBy("token").agg(F.count("*").alias("n"))
    keyed = _cms_keyed(exact)
    counters = keyed.groupBy("r", "bkt").agg(F.sum("n").alias("c"))
    bad = (
        keyed.join(counters, ["r", "bkt"])
        .groupBy("token", "n")
        .agg(F.min("c").alias("est"))
        .filter(F.col("est") < F.col("n"))
        .count()
    )
    assert bad == 0


def test_cms_census_consistent(spark, sf_dir):
    row = token_freq_cms_audit(spark, sf_dir).collect()[0]
    assert row.n_tokens > 0 and row.token_mass >= row.n_tokens
    assert 0 <= row.n_over <= row.n_tokens
    assert row.mean_over >= 0 and (row.max_over or 0) >= 0


def test_bloom_no_false_negatives(spark, sf_dir):
    """Every true duplicate must be bloom-positive: n_bloom_pos >= n_true_dup
    row-wise is implied by the bit construction; check the census agrees."""
    row = dedup_bloom_prefilter(spark, sf_dir).collect()[0]
    assert row.n_bloom_pos >= row.n_true_dup
    assert row.n_false_pos == row.n_bloom_pos - row.n_true_dup
    assert row.n_build > 0 and row.n_probe > 0


def test_bloom_membership_exact_on_inserted_keys(spark):
    """Direct membership check: probing the filter with its OWN build keys
    matches all K bits for every key."""
    df = spark.createDataFrame(
        [(f"key-{i}",) for i in range(200)], "key string"
    )
    bits = _bit_keys(df).select("bit").distinct()
    nb = (
        _bit_keys(df)
        .join(F.broadcast(bits), "bit", "left_semi")
        .groupBy("key")
        .agg(F.count("*").alias("nb"))
        .filter(F.col("nb") < BLOOM_K)
        .count()
    )
    assert nb == 0


def test_minhash_source_sigs_merge_exactly(spark, sf_dir):
    """The mergeability identity source_minhash_agreement's docstring
    claims: a stratum's MinHash signature == the elementwise min of its
    documents' signatures (min is associative/commutative), so per-doc
    sketches computed map-side merge upward to ANY grouping without
    rescanning text."""
    from sabd_deduplicator_spark.catalog import table
    from sabd_deduplicator_spark.operators.similarity import (
        MINHASH_PERMS,
        doc_shingles,
        minhash_signatures,
    )

    src_of = table(spark, sf_dir, "documents").select("doc_id", "source")
    per_doc = minhash_signatures(doc_shingles(spark, sf_dir))
    merged = (
        per_doc.join(src_of, "doc_id")
        .groupBy("source")
        .agg(*[F.min(f"h{k}").alias(f"h{k}") for k in range(MINHASH_PERMS)])
    )
    direct = minhash_signatures(
        doc_shingles(spark, sf_dir, key="source").distinct(), key="source"
    )
    # exact frame equality: anti-joins empty in both directions
    cols = ["source", *[f"h{k}" for k in range(MINHASH_PERMS)]]
    assert merged.select(cols).exceptAll(direct.select(cols)).count() == 0
    assert direct.select(cols).exceptAll(merged.select(cols)).count() == 0
