"""Events time-bucket + JSON queries (SURVEY.md §2.B streaming/JSON rows).

These are the BATCH twins of the reference's micro-batched stateful stream
(/root/reference/lib/deduplicator.ex:59-82): tumbling/sliding windows are
`date_trunc`/`F.window` bucketing; the Structured Streaming versions (with
watermarks and cross-batch dedup state) live in
sabd_deduplicator_spark/streaming/ and stay unregistered because the driver's
oracle is batch SQL (SURVEY.md §7 'what's hard' (d)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sabd_deduplicator_spark.catalog import table
from sabd_deduplicator_spark.functions.numeric import dsum, dsum_sql
from sabd_deduplicator_spark.registry import query


@query(
    "events_tumbling_1h",
    oracle=(
        "SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start, "
        "event_type, count(*) AS n, " + dsum_sql("value") + " AS total_value "
        "FROM events GROUP BY 1, 2"
    ),
)
def events_tumbling_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1h window — batch form is a date_trunc group-by (one shuffle,
    partial agg; at 100 TB this is the same plan per day/hour partition)."""
    e = table(spark, sf_dir, "events")
    return e.groupBy(
        F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias("hour_start"),
        "event_type",
    ).agg(F.count("*").alias("n"), dsum("value").alias("total_value"))


@query(
    "events_sliding_2h",
    oracle=(
        # A point at time t falls into the 2h/1h-slide windows starting at
        # trunc_hour(t) and trunc_hour(t) - 1h.
        "SELECT strftime(win_start, '%Y-%m-%d %H:%M:%S') AS win_start, "
        "count(*) AS n, " + dsum_sql("value") + " AS total_value FROM ("
        "  SELECT unnest([date_trunc('hour', ts), date_trunc('hour', ts) - INTERVAL 1 HOUR]) AS win_start, value"
        "  FROM events"
        ") GROUP BY 1"
    ),
)
def events_sliding_2h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (2h size, 1h slide) via F.window — Spark expands each
    row into its overlapping windows, exactly the unnest the oracle spells
    out."""
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"))
        .agg(F.count("*").alias("n"), dsum("value").alias("total_value"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("win_start"),
            "n",
            "total_value",
        )
    )


@query(
    "events_json_extract",
    oracle=(
        "SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k_val "
        "FROM events WHERE json_extract_string(props, '$.k') IS NOT NULL"
    ),
)
def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON scalar extraction over string-encoded props (SURVEY.md §2.B).
    `props` is parsed ONCE via withColumn before the filter; referencing the
    same get_json_object expression in both filter and projection made Spark
    evaluate the parse twice per row (round-2 verdict, What's wrong #2)."""
    e = table(spark, sf_dir, "events")
    return (
        e.withColumn("k_str", F.get_json_object("props", "$.k"))
        .filter(F.col("k_str").isNotNull())
        .select("event_id", F.col("k_str").cast("int").alias("k_val"))
    )


@query(
    "events_json_agg",
    oracle=(
        "SELECT event_type, "
        "CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k, "
        "count(*) AS n FROM events GROUP BY event_type"
    ),
)
def events_json_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return e.groupBy("event_type").agg(
        F.sum(k).alias("sum_k"), F.count("*").alias("n")
    )


@query(
    "events_gap_to_prev",
    oracle=(
        # first-event NULL gap coalesced to -1: a nullable BIGINT reaches
        # pandas as float64+NaN from DuckDB but may stay object/None from
        # Spark — coalescing keeps the column integral in both engines.
        # Truncate-then-diff on EPOCHS, not date_diff('second', ...):
        # DuckDB's date_diff truncates the epoch toward ZERO, so PRE-1970
        # timestamps round the opposite way from calendar (floor)
        # truncation and the gap comes out one second short (found by the
        # 'extremes' fuzz corpus); date_trunc floors in both engines.
        "SELECT event_id, user_id, "
        "CAST(coalesce("
        "  CAST(epoch(date_trunc('second', ts)) AS BIGINT) - "
        "  CAST(epoch(date_trunc('second', lag(ts) OVER ("
        "    PARTITION BY user_id ORDER BY ts, event_id))) AS BIGINT), "
        "-1) AS BIGINT) AS gap_sec "
        "FROM events"
    ),
)
def events_gap_to_prev(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-event gap per user — lag + timestamp arithmetic (sessionization
    building block; the streaming sessionizer uses the same gap logic)."""
    from pyspark.sql import Window

    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.date_trunc("second", F.lag("ts").over(w))
    # DuckDB's date_diff('second', ...) counts second-boundary crossings ==
    # truncate both then diff; timestampdiff on NTZ is timezone-free.
    gap = F.expr("timestampdiff(SECOND, __prev, date_trunc('second', ts))")
    return (
        e.withColumn("__prev", prev)
        .select(
            "event_id",
            "user_id",
            F.coalesce(gap.cast("long"), F.lit(-1)).alias("gap_sec"),
        )
    )


@query(
    "events_hourly_gapfill",
    oracle=(
        # spine = hours observed anywhere × distinct types; missing combos → 0
        "SELECT strftime(h.hr, '%Y-%m-%d %H:%M:%S') AS hour_start, t.event_type, "
        "COALESCE(n, 0) AS n FROM "
        "(SELECT DISTINCT date_trunc('hour', ts) AS hr FROM events) h "
        "CROSS JOIN (SELECT DISTINCT event_type FROM events) t "
        "LEFT JOIN (SELECT date_trunc('hour', ts) AS hr, event_type, "
        "           CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1, 2) c "
        "ON h.hr = c.hr AND t.event_type = c.event_type"
    ),
)
def events_hourly_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled hourly counts: dense (hour × event_type) spine LEFT-joined
    to the observed counts, absent buckets zero-filled — the batch form of a
    dashboard resample. The spine sides are tiny aggregates (distinct hours,
    distinct types), so both are broadcast; only the count aggregation
    shuffles event-scale data. At 100 TB the spine is still driver-sized
    (hours × types), so the plan shape survives unchanged."""
    e = table(spark, sf_dir, "events")
    hours = e.select(F.date_trunc("hour", "ts").alias("hr")).distinct()
    types = e.select("event_type").distinct()
    counts = (
        e.groupBy(
            F.date_trunc("hour", "ts").alias("hr"), "event_type"
        ).agg(F.count("*").alias("__n"))
    )
    return (
        hours.crossJoin(types)
        .join(F.broadcast(counts), ["hr", "event_type"], "left")
        .select(
            F.date_format("hr", "yyyy-MM-dd HH:mm:ss").alias("hour_start"),
            "event_type",
            F.coalesce("__n", F.lit(0)).alias("n"),
        )
    )


@query(
    "events_dow_hour_heatmap",
    oracle=(
        # DuckDB dayofweek: 0=Sunday; Spark dayofweek: 1=Sunday → normalize
        "SELECT CAST(dayofweek(ts) AS INT) AS dow, "
        "CAST(hour(ts) AS INT) AS hod, "
        "CAST(count(*) AS BIGINT) AS n, "
        "round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 6) AS total_value "
        "FROM events GROUP BY 1, 2"
    ),
)
def events_dow_hour_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar heatmap aggregation (day-of-week × hour-of-day): the
    load-profile query every ops dashboard runs. One hash aggregate over at
    most 168 groups — partial aggregation collapses everything map-side.
    Dialect trap pinned here: Spark's dayofweek is 1-based Sunday, DuckDB's
    0-based Sunday."""
    e = table(spark, sf_dir, "events")
    return e.groupBy(
        (F.dayofweek("ts") - 1).cast("int").alias("dow"),
        F.hour("ts").cast("int").alias("hod"),
    ).agg(
        F.count("*").alias("n"),
        F.round(F.sum(F.col("value").cast("decimal(18,2)")).cast("double"), 6)
        .alias("total_value"),
    )


SESSION_GAP_SEC = 600


@query(
    "events_sessionize_batch",
    oracle=(
        # gap-break numbering: cumulative sum of breaks = session ordinal.
        # Gaps compared in MICROSECONDS (exact at the data's resolution) —
        # date_diff('microsecond') boundary-counting equals the true diff.
        "WITH numbered AS ("
        "  SELECT user_id, ts, value, sum(CASE WHEN gap_break THEN 1 ELSE 0 END) "
        "    OVER (PARTITION BY user_id ORDER BY ts, event_id "
        "          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id "
        "  FROM (SELECT user_id, event_id, ts, value, "
        "        coalesce(date_diff('microsecond', lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id), ts) "
        f"          > {SESSION_GAP_SEC} * 1000000, FALSE) AS gap_break "
        "        FROM events)) "
        "SELECT user_id, CAST(session_id AS BIGINT) AS session_id, "
        "strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start, "
        "count(*) AS n_events, " + dsum_sql("value") + " AS total_value "
        "FROM numbered GROUP BY user_id, session_id"
    ),
)
def events_sessionize_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization — the window-native twin of the streaming
    applyInPandasWithState sessionizer (streaming/sessionize.py), covering
    ALL sessions including each user's final one (which the streaming drain
    holds in state). Two window passes over one (user_id)-partitioned sort:
    lag → gap flag → running sum numbers the sessions; then one hash
    aggregate per (user, session). This is the classic gaps-and-islands
    plan: no self-joins, no explode, scales as one shuffle on user_id."""
    from pyspark.sql import Window

    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.expr("timestampdiff(MICROSECOND, lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id), ts)")
    numbered = (
        e.withColumn(
            "gap_break",
            F.coalesce(gap_us > SESSION_GAP_SEC * 1_000_000, F.lit(False)),
        )
        .withColumn(
            "session_id",
            F.sum(F.when(F.col("gap_break"), 1).otherwise(0)).over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
    )
    return numbered.groupBy("user_id", "session_id").agg(
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("session_start"),
        F.count("*").alias("n_events"),
        dsum("value").alias("total_value"),
    )


_TS_FMT_SQL = "%Y-%m-%d %H:%M:%S.%f"
_TS_FMT_SPARK = "yyyy-MM-dd HH:mm:ss.SSSSSS"
_SCD2_OPEN = "9999-12-31 00:00:00.000000"


@query(
    "scd2_user_event_type",
    oracle=(
        # Slowly-changing-dimension type 2: collapse consecutive equal values
        # into validity intervals; the current interval stays open-ended.
        "WITH changes AS ("
        "  SELECT user_id, event_type, ts, event_id, "
        "    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type "
        "  FROM events), "
        "starts AS (SELECT user_id, event_type, ts, event_id FROM changes "
        "  WHERE prev_type IS NULL OR prev_type <> event_type) "
        "SELECT user_id, event_type, "
        f"strftime(ts, '{_TS_FMT_SQL}') AS valid_from, "
        "coalesce(strftime(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id), "
        f"'{_TS_FMT_SQL}'), '{_SCD2_OPEN}') AS valid_to "
        "FROM starts"
    ),
)
def scd2_user_event_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD-type-2 history build from an event stream: each user's event_type
    becomes validity intervals [valid_from, valid_to), consecutive repeats
    collapsed, the live row open-ended — the standard warehouse dimension-
    history op. Two window passes over ONE (user_id)-partitioned sort
    (change detection via lag, interval close via lead): Catalyst reuses the
    sort, so this is a single shuffle however long the history."""
    from pyspark.sql import Window

    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    starts = (
        e.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(
            F.col("prev_type").isNull()
            | (F.col("prev_type") != F.col("event_type"))
        )
    )
    w2 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return starts.select(
        "user_id",
        "event_type",
        F.date_format("ts", _TS_FMT_SPARK).alias("valid_from"),
        F.coalesce(
            F.date_format(F.lead("ts").over(w2), _TS_FMT_SPARK),
            F.lit(_SCD2_OPEN),
        ).alias("valid_to"),
    )
