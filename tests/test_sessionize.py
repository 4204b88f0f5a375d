"""Stateful sessionization: the applyInPandasWithState operator must close
the same sessions the batch window-based implementation computes."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sabd_deduplicator_spark.streaming.sessionize import (
    sessionize_batch,
    sessionize_stream,
)


def test_batch_sessionize_gap_logic(spark):
    rows = [
        (1, "2024-01-01 00:00:00", 1.0),
        (1, "2024-01-01 00:10:00", 2.0),   # same session (gap 600 < 1800)
        (1, "2024-01-01 01:10:00", 3.0),   # new session (3600 > 1800)
        (2, "2024-01-01 00:00:00", 5.0),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts string, value double").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    got = {
        (r.user_id, str(r.session_start), r.n_events, r.total_value)
        for r in sessionize_batch(df, gap_seconds=1800).collect()
    }
    assert got == {
        (1, "2024-01-01 00:00:00", 2, 3.0),
        (1, "2024-01-01 01:10:00", 1, 3.0),
        (2, "2024-01-01 00:00:00", 1, 5.0),
    }


@pytest.mark.slow
def test_stream_sessionize_matches_batch(spark, sf_dir, tmp_path):
    from sabd_deduplicator_spark.catalog import table

    ev = (
        table(spark, sf_dir, "events")
        .select("user_id", F.col("ts").cast("timestamp").alias("ts"), "value")
    )
    src = str(tmp_path / "ev")
    ev.repartition(4).write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema("user_id bigint, ts timestamp, value double").parquet(src)
    sessions = sessionize_stream(stream, gap_seconds=600)
    q = (
        sessions.writeStream.format("memory")
        .queryName("sess_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.table("sess_sink")
    batch = sessionize_batch(ev, gap_seconds=600)
    keys = ["user_id", "session_start", "session_end", "n_events"]
    # SOUNDNESS: every emitted session is a real session (exact fields)
    assert got.join(batch, keys, "left_anti").count() == 0
    assert got.count() > 0
    # COMPLETENESS: sessions that ended well before the final watermark
    # (watermark delay 2*gap, timeout at end+gap → margin 3*gap + slack)
    # must all have been closed and emitted.
    max_ts = ev.agg(F.max("ts")).first()[0]
    horizon = F.lit(max_ts) - F.expr("INTERVAL 2400 SECONDS")
    must_emit = batch.filter(F.col("session_end") < horizon)
    assert must_emit.join(got, keys, "left_anti").count() == 0
