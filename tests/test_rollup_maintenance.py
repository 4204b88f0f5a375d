"""Continuous-aggregate exactness: folding event batches into the rollup in
any order/split must equal the one-shot rollup (decimal partials are
associative)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sabd_deduplicator_spark.catalog import table
from sabd_deduplicator_spark.operators.rollup_maintenance import (
    hourly_rollup,
    merge_rollup,
    rollup_report,
)


def test_incremental_refresh_equals_full(spark, sf_dir):
    ev = table(spark, sf_dir, "events").select("ts", "event_type", "value")
    full = rollup_report(hourly_rollup(ev)).collect()

    # split into 3 uneven batches on an arbitrary predicate
    b1 = ev.filter(F.col("value") < 50)
    b2 = ev.filter((F.col("value") >= 50) & (F.col("value") < 150))
    b3 = ev.filter(F.col("value") >= 150)
    assert b1.count() + b2.count() + b3.count() == ev.count()

    acc = hourly_rollup(b1)
    acc = merge_rollup(acc, b2)
    acc = merge_rollup(acc, b3)
    merged = rollup_report(acc).collect()

    key = lambda r: (r.hour_start, r.event_type)  # noqa: E731
    assert sorted(map(tuple, merged), key=str) == sorted(map(tuple, full), key=str)


def test_merge_into_empty_hours_adds_rows(spark, sf_dir):
    ev = table(spark, sf_dir, "events").select("ts", "event_type", "value")
    first_day = ev.filter(F.dayofmonth("ts") == 1)
    rest = ev.filter(F.dayofmonth("ts") != 1)
    acc = merge_rollup(hourly_rollup(first_day), rest)
    assert acc.count() == hourly_rollup(ev).count()
