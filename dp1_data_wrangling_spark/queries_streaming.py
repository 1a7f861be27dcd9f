"""Streaming-analogue query catalog (SURVEY.md §2.10).

Batch-executable forms of the streaming windows over events.ts, oracle-
checked in DuckDB by replaying Spark's window alignment arithmetic
(epoch-µs integer bucketing — exact, no float time math)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .registry import register
from .streaming.events import (
    session_windows_batch,
    sliding_windows_batch,
    tumbling_windows_batch,
)
from .tables import load_table

_TEN_MIN_US = 600_000_000
_FIVE_MIN_US = 300_000_000
_THIRTY_MIN_US = 1_800_000_000


@register(
    "tumbling_window",
    f"""
    SELECT make_timestamp((epoch_us(ts) // {_TEN_MIN_US}) * {_TEN_MIN_US})
               AS window_start,
           make_timestamp((epoch_us(ts) // {_TEN_MIN_US}) * {_TEN_MIN_US}
               + {_TEN_MIN_US}) AS window_end,
           event_type,
           count(*) AS n_events,
           CAST(sum(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT)
               AS sum_value_micros
    FROM events
    GROUP BY 1, 2, 3
    """,
)
def q_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 10-minute event-time windows (streaming-equivalent plan;
    the oracle replays Spark's epoch-aligned bucketing in integer µs)."""
    return tumbling_windows_batch(load_table(spark, sf_dir, "events"))


@register(
    "sliding_window",
    f"""
    WITH starts AS (
        SELECT make_timestamp(
                   (epoch_us(ts) // {_FIVE_MIN_US}) * {_FIVE_MIN_US}
                   - offs.o) AS window_start,
               event_id
        FROM events
        CROSS JOIN (SELECT * FROM (VALUES (0), ({_FIVE_MIN_US})) t(o)) offs
    )
    SELECT window_start,
           window_start + INTERVAL 10 MINUTE AS window_end,
           count(*) AS n_events
    FROM starts
    GROUP BY 1, 2
    """,
)
def q_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (10 min width, 5 min slide): every event belongs to
    exactly two windows; the oracle enumerates both window starts."""
    return sliding_windows_batch(load_table(spark, sf_dir, "events"))


@register(
    "session_window",
    # headline since r6: heavier than the displaced tumbling_window
    # (per-user session window shuffle), so the bench watches real work
    """
    WITH flagged AS (
        SELECT user_id, ts, event_id,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    numbered AS (
        SELECT user_id, ts,
               sum(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING) AS session_no
        FROM flagged
    )
    SELECT min(ts) AS session_start,
           max(ts) + INTERVAL 30 MINUTE AS session_end,
           user_id,
           count(*) AS n_events
    FROM numbered
    GROUP BY user_id, session_no
    """,
    headline=True,
)
def q_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30-minute gap) via native session_window; the
    oracle replays them as gaps-and-islands."""
    return session_windows_batch(load_table(spark, sf_dir, "events"))


@register(
    "event_correlation",
    """
    SELECT a.user_id, a.event_id AS view_id, a.ts AS view_ts,
           b.event_id AS purchase_id, b.ts AS purchase_ts
    FROM events a
    JOIN events b
      ON a.user_id = b.user_id
     AND a.event_type = 'view' AND b.event_type = 'purchase'
     AND b.ts >= a.ts
     AND epoch_us(b.ts) < epoch_us(a.ts) + 1800000000
    """,
)
def q_event_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join, batch form (view→purchase attribution
    within 30 minutes per user).  The streaming twin
    (``streaming.stream_correlated_events``) runs the identical plan over
    two watermarked streams; equivalence is asserted in
    test_streaming_correlation_equals_batch."""
    from .streaming.events import correlated_events_batch

    return correlated_events_batch(load_table(spark, sf_dir, "events"))
