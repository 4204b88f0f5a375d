"""Bucketed tables co-locate join keys: joining two tables bucketed the same
way on the join key must produce ZERO shuffle exchanges — the scalable
replacement for the reference's Postgres B-tree index on hash
(SURVEY.md §4 table, PK B-tree row)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sabd_deduplicator_spark.plans.inspect import count_exchanges
from sabd_deduplicator_spark.sources.writers import save_bucketed_table


@pytest.fixture()
def no_broadcast(spark):
    """Force non-broadcast joins so the shuffle-free claim is about
    BUCKETING, not about one side being small."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield spark
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    for t in ("links_b", "probes_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_bucketed_join_has_no_shuffle(no_broadcast, sf_dir):
    spark = no_broadcast
    links = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(F.md5("text").alias("hash"), "doc_id")
    )
    probes = links.select("hash", (F.col("doc_id") * 2).alias("probe_val"))
    save_bucketed_table(links, "links_b", "hash", n_buckets=8)
    save_bucketed_table(probes, "probes_b", "hash", n_buckets=8)

    j = spark.table("links_b").join(spark.table("probes_b"), "hash")
    n_shuffles = count_exchanges(j)
    assert n_shuffles == 0, f"bucketed join still shuffles ({n_shuffles} exchanges)"
    assert j.count() == links.count()

    # control: the same join over plain (unbucketed) parquet DOES shuffle
    p1 = f"{sf_dir}/documents.parquet"
    plain = (
        spark.read.parquet(p1).select(F.md5("text").alias("hash"), "doc_id")
        .join(spark.read.parquet(p1).select(F.md5("text").alias("hash")), "hash")
    )
    assert count_exchanges(plain) > 0
