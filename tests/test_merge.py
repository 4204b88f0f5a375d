"""MERGE-semantics invariants for merge_apply_changes — the transactional
properties the row-hash oracle parity can't state directly (clause
accounting against the pre-merge snapshot, keep-rows immutability)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sabd_deduplicator_spark import registry
from sabd_deduplicator_spark.catalog import table

registry.load_all_queries()


def test_merge_clause_accounting(spark, sf_dir):
    """|result| == |target| - |matched deletes| + |inserts|; every clause
    fires; deleted keys are absent; inserted keys were never in the target;
    K rows are byte-identical to their target rows."""
    res = registry.QUERIES["merge_apply_changes"](spark, sf_dir)
    res.cache()
    tgt = table(spark, sf_dir, "customer")

    by_action = {
        r["action"]: r["count"] for r in res.groupBy("action").count().collect()
    }
    assert set(by_action) == {"U", "I", "K"}, by_action

    n_target = tgt.count()
    # matched deletes: latest event is an 'error' AND the key exists in target
    ev = table(spark, sf_dir, "events")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    latest = ev.withColumn("rn", F.row_number().over(w)).filter("rn = 1")
    src = latest.select(
        (F.col("user_id") * 11).alias("m_key"),
        F.when(F.col("event_type") == "error", "D").otherwise("U").alias("op"),
    )
    matched_deletes = (
        src.filter("op = 'D'")
        .join(tgt, src["m_key"] == tgt["c_custkey"], "left_semi")
        .count()
    )
    assert res.count() == n_target - matched_deletes + by_action["I"]

    # deleted keys are gone
    del_keys = src.filter("op = 'D'").select(F.col("m_key").alias("c_custkey"))
    assert res.join(del_keys, "c_custkey", "left_semi").count() == 0

    # inserts are new keys, flagged segment
    ins = res.filter("action = 'I'")
    assert ins.join(tgt, "c_custkey", "left_semi").count() == 0
    assert ins.filter("c_mktsegment <> 'MERGED'").count() == 0

    # K rows unchanged vs the target snapshot
    keep = res.filter("action = 'K'").drop("action")
    tgt_cmp = tgt.select(
        F.col("c_custkey").cast("long"),
        "c_name",
        F.col("c_nationkey").cast("long"),
        "c_acctbal",
        "c_mktsegment",
    )
    assert keep.exceptAll(tgt_cmp).count() == 0
    res.unpersist()
