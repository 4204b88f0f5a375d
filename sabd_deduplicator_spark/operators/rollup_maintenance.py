"""Hypertable-style continuous aggregate: an hourly rollup that can be
refreshed INCREMENTALLY by folding new event batches into the existing
materialization — the timescale continuous-aggregate capability the task
names alongside as-of and range joins.

Keys to making the refresh exact with plain parquet (no table format):
- the rollup stores DECIMAL partials (exact, associative), so merging
  partial aggregates is loss-free regardless of batch boundaries;
- refresh = union(existing, rollup(new)) → re-aggregate — one shuffle over
  (hour, type) cardinality, not over raw events;
- at scale the rollup table is partitioned by hour → a refresh touching one
  day rewrites only that day's partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

KEYS = ("hour_start", "event_type")


def hourly_rollup(events: DataFrame) -> DataFrame:
    """events(ts, event_type, value) → rollup keyed by (hour, type) with
    exact decimal partials (n, total_value)."""
    return events.groupBy(
        F.date_trunc("hour", "ts").alias("hour_start"), F.col("event_type")
    ).agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("decimal(18,2)")).alias("total_value"),
    )


def merge_rollup(existing: DataFrame, new_events: DataFrame) -> DataFrame:
    """Fold a new batch into an existing rollup: aggregate the batch, union,
    re-aggregate the partials. count partials sum; decimal partials sum
    exactly — merge(rollup(A), B) == rollup(A ∪ B) for any split."""
    fresh = hourly_rollup(new_events)
    return (
        existing.unionByName(fresh)
        .groupBy(*KEYS)
        .agg(F.sum("n").alias("n"), F.sum("total_value").alias("total_value"))
    )


def rollup_report(rollup: DataFrame) -> DataFrame:
    """Presentation projection: stable strings/doubles for consumers."""
    return rollup.select(
        F.date_format("hour_start", "yyyy-MM-dd HH:mm:ss").alias("hour_start"),
        "event_type",
        "n",
        F.col("total_value").cast("double").alias("total_value"),
    )
