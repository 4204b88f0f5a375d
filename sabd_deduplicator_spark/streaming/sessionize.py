"""Custom stateful streaming operator: gap-based sessionization via
applyInPandasWithState (SURVEY.md §2.B streaming row — the reference's
hand-rolled fold state, lib/deduplicator.ex:35-44, generalized to arbitrary
per-key state machines).

Per user: events closer than `gap` seconds belong to one session; a session
closes when the watermark passes its last event + gap (or the state times
out). Emits (user_id, session_start, session_end, n_events, total_value).

This is the operator shape you reach for when dropDuplicates/window aggs
can't express the semantics — per-key mutable state with timeout, still
sharded by key across executors.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

# closed_by: 'gap' = closed in-batch by the gap rule (purely data-driven,
# deterministic); 'timeout' = closed by the event-time timeout when the
# watermark passed end+gap. NB the timeout path is session-TZ-skewed: Arrow
# hands this function session-naive timestamps while the JVM watermark is an
# instant, so setTimeoutTimestamp drifts by the session's UTC offset —
# consumers needing determinism filter closed_by = 'gap'.
SESSION_SCHEMA = (
    "user_id bigint, session_start timestamp, session_end timestamp, "
    "n_events bigint, total_value double, closed_by string"
)
STATE_SCHEMA = "start long, last long, n long, total double"


def sessionize_stream(events: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """events(user_id, ts timestamp, value double) stream → closed sessions."""

    def fn(
        key: tuple,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        (user_id,) = key
        gap_us = gap_seconds * 1_000_000
        if state.hasTimedOut:
            start, last, n, total = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": [pd.Timestamp(start, unit="us")],
                    "session_end": [pd.Timestamp(last, unit="us")],
                    "n_events": [n],
                    "total_value": [total],
                    "closed_by": ["timeout"],
                }
            )
            return

        rows = pd.concat(list(pdfs)).sort_values("ts")
        ts_us = rows["ts"].astype("int64") // 1000  # ns → µs
        vals = rows["value"].fillna(0.0)

        if state.exists:
            start, last, n, total = state.get
        else:
            start = last = None, None  # placeholder replaced on first event
            start, last, n, total = int(ts_us.iloc[0]), int(ts_us.iloc[0]), 0, 0.0

        out = []
        for t, v in zip(ts_us, vals):
            t = int(t)
            if t - last > gap_us:
                out.append((start, last, n, total))
                start, last, n, total = t, t, 1, float(v)
            else:
                last, n, total = max(last, t), n + 1, total + float(v)
        state.update((start, last, n, total))
        # event-time timeout: close the session when the watermark passes
        # last_event + gap (ms epoch). Processing-time timeouts would keep an
        # availableNow drain alive indefinitely re-firing empty batches.
        state.setTimeoutTimestamp(last // 1000 + gap_seconds * 1000)
        if out:
            yield pd.DataFrame(
                {
                    "user_id": user_id,
                    "session_start": [pd.Timestamp(s, unit="us") for s, _, _, _ in out],
                    "session_end": [pd.Timestamp(e, unit="us") for _, e, _, _ in out],
                    "n_events": [n_ for _, _, n_, _ in out],
                    "total_value": [tv for _, _, _, tv in out],
                    "closed_by": "gap",
                }
            )

    return (
        events.withWatermark("ts", f"{gap_seconds * 2} seconds")
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def sessionize_batch(events: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """Batch reference implementation (window-based): session id = cumulative
    count of gap-breaks per user; used by tests as the oracle for the
    streaming operator."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.partitionBy("user_id").orderBy("ts")
    gap_break = (
        F.unix_micros(F.col("ts").cast("timestamp"))
        - F.unix_micros(F.lag(F.col("ts").cast("timestamp")).over(w))
        > gap_seconds * 1_000_000
    )
    sess = events.withColumn(
        "session_id",
        F.sum(F.when(gap_break, 1).otherwise(0)).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count("*").alias("n_events"),
        F.sum("value").alias("total_value"),
    ).drop("session_id")
